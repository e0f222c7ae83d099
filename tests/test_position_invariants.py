"""Position semantics invariants, mirroring the reference's
substring-position checks (angular-template.spec.ts:66-84, README.md:113):
`character` columns are UTF-16 code units, so slicing the document's
UTF-16 representation (Python str indexes code points — we re-encode to
UTF-16 words) at [char_start, char_end) must reproduce each entity's
value exactly."""

from sax_wasm_spark.kernel.collect import parse_events
from sax_wasm_spark.kernel.saxkernel import EVT_ATTRIBUTE, EVT_COMMENT, EVT_TEXT
from sax_wasm_spark.sources.pages import build_page


def _utf16_slice(doc: str, line_start, char_start, line_end, char_end) -> str:
    lines = doc.split("\n")
    if line_start == line_end:
        units = lines[line_start].encode("utf-16-le")
        return units[2 * char_start : 2 * char_end].decode("utf-16-le", "surrogatepass")
    first = lines[line_start].encode("utf-16-le")[2 * char_start :].decode(
        "utf-16-le", "surrogatepass"
    )
    mid = lines[line_start + 1 : line_end]
    last = lines[line_end].encode("utf-16-le")[: 2 * char_end].decode(
        "utf-16-le", "surrogatepass"
    )
    return "\n".join([first, *mid, last])


DOCS = [
    '<div class="myDiv">This is my div</div>',
    '📚<div href="./123/123">hey there</div>',
    '<div data-value="👅" class="grapheme cluster">text 🚀 here</div>',
    "<p>line one</p>\n<p>line two with more</p>",
    "<a x='1' y=2>mixed attrs</a>",
]


def test_text_event_substring_invariant():
    for doc in DOCS:
        data = doc.encode()
        for row in parse_events(data, (1 << EVT_TEXT) | (1 << EVT_ATTRIBUTE)):
            if row[0] == EVT_TEXT:
                value = row[3].decode()
                got = _utf16_slice(doc, row[10], row[11], row[12], row[13])
                assert got == value, f"doc={doc!r} value={value!r} got={got!r}"


def test_attribute_substring_invariant():
    for doc in DOCS:
        data = doc.encode()
        for row in parse_events(data, 1 << EVT_ATTRIBUTE):
            # name: start=(line_start,char_start), end=(open_end_*)
            name = row[4].decode()
            got = _utf16_slice(doc, row[10], row[11], row[14], row[15])
            assert got == name, f"doc={doc!r} name={name!r} got={got!r}"
            value = row[5].decode()
            if value:
                got = _utf16_slice(doc, row[16], row[17], row[12], row[13])
                assert got == value, f"doc={doc!r} value={value!r} got={got!r}"


def test_byte_range_substring_invariant():
    """byte_start/byte_end of Text and Comment events slice the raw bytes
    to exactly the payload (+ delimiters for comments)."""
    for i in range(200):
        html = build_page(i)[2]
        for row in parse_events(html, (1 << EVT_TEXT) | (1 << EVT_COMMENT)):
            b0, b1 = row[18], row[19]
            if row[0] == EVT_TEXT and b1 > b0:
                assert row[3] == html[b0:b1], f"page {i}"


def test_extractor_span_reconstruction():
    """For documents without orphan-close text events (whose byte spans
    are (0,0) by reference quirk), the extracted text must equal the
    newline-join of the html slices at the reported spans — spans are
    the provenance contract for downstream consumers."""
    from sax_wasm_spark.operators.extract import extract_bytes

    checked = 0
    for i in range(300):
        html = build_page(i)[2]
        rows = parse_events(html, 0x3FF)
        # skip docs with orphan-close texts (spans (0,0)) or CDATA
        # (reference byte ranges cover the whole <![CDATA[...]]>
        # construct, not the value)
        has_orphan = any(r[0] == 0 and r[3].startswith(b"</") for r in rows)
        has_cdata = any(r[0] == 9 for r in rows)
        if has_orphan or has_cdata:
            continue
        text, spans, _, status, _ = extract_bytes(html)
        assert status == "ok"
        rebuilt = b"\n".join(html[a:b] for a, b in spans)
        assert rebuilt == text, f"page {i}"
        checked += 1
    assert checked > 200
