"""Chunk-boundary sweeps: split every document at every byte index and
assert the invariants the reference guarantees across writes
(ref parser.rs:1663-1711, 1848-1875, 2077-2145; tag.spec.ts:145-233):

- identical event kinds, order, and payload *values*
  (name/value/attr name+value/target/content/self_closing/attr_type);
- identical text positions and close-tag positions;
- identical attribute byte ranges (asserted by the reference's own
  test_attribute_value_write_boundary).

Tag open positions and text byte offsets are *not* stable across writes
in the reference itself (chunk_offset/fragment interplay), so they are
deliberately not compared here; tools/diff_ref.py --sweep separately
proves we reproduce even those quirks bit-for-bit against the compiled
reference WASM.
"""

import pytest

from sax_wasm_spark.kernel.saxkernel import (
    EVT_ATTRIBUTE,
    EVT_CDATA,
    EVT_CLOSE_TAG,
    EVT_COMMENT,
    EVT_TEXT,
    Attribute,
    ProcInst,
    SaxParser,
    Tag,
    TextNode,
)

E_REF_SWEEP = (1 << EVT_CLOSE_TAG) | (1 << EVT_TEXT) | (1 << EVT_ATTRIBUTE)


def run(data: bytes, events: int, split=None):
    out = []
    p = SaxParser(events=events, handler=lambda c, e: out.append((c, e)))
    if split is None:
        p.write(data)
    else:
        p.write(data[:split])
        p.write(data[split:])
    p.end()
    return out


def stable_view(evs, positions: bool = True):
    view = []
    for code, e in evs:
        k = type(e)
        if k is Tag:
            view.append(
                (
                    code,
                    e.name,
                    e.self_closing,
                    e.close_start,
                    e.close_end,
                    tuple((a.name.value, a.value.value, a.attr_type) for a in e.attributes),
                    tuple(t.value for t in e.text_nodes),
                )
            )
        elif k is TextNode:
            view.append((code, e.value, e.start, e.end) if positions else (code, e.value))
        elif k is Attribute:
            view.append((code, e.name.value, e.value.value, e.attr_type, e.b0, e.b1))
        elif k is ProcInst:
            view.append((code, e.target.value, e.content.value))
    return view


SWEEP_CASES = [
    (b'<div empty=""><a href="http://github.com">GitHub</a></orphan></div>', E_REF_SWEEP),
    (b"<!--some comment here-->", 1 << EVT_COMMENT),
    (b'<text top="100.00" />', 1 << EVT_ATTRIBUTE),
    (b"<div><![CDATA[something]]>", 1 << EVT_CDATA),
    (
        b"<!--lit-part cI7PGs8mxHY=-->\n        <p><!--lit-part-->hello<!--/lit-part--></p>\n"
        b"        <!--lit-part BRUAAAUVAAA=--><?><!--/lit-part-->\n"
        b"        <!--lit-part--><!--/lit-part-->\n        <p>more</p>\n        <!--/lit-part-->",
        1 << EVT_COMMENT,
    ),
]


@pytest.mark.parametrize("doc,mask", SWEEP_CASES, ids=[f"case{i}" for i in range(len(SWEEP_CASES))])
def test_every_split_matches_unsplit(doc, mask):
    """Reference-guaranteed stability (its own *_write_boundary tests)."""
    base = stable_view(run(doc, mask))
    for i in range(1, len(doc)):
        got = stable_view(run(doc, mask, split=i))
        assert got == base, f"split at {i} diverged"


def test_sweep_golden_streams():
    """Per-split frozen goldens for a wider fixture set, including cases
    where the reference's own output is split-*dependent* (fragment
    carries over 4-byte graphemes, '<'-in-text at a boundary, doctype
    value capture). Goldens were generated from this kernel after full
    differential validation against the reference WASM
    (tools/diff_ref.py --sweep: PARITY OK over 16k jobs)."""
    import base64
    import json
    import os
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from diff_ref import py_parse  # noqa: PLC0415

    path = os.path.join(os.path.dirname(__file__), "goldens", "sweep_events.json")
    with open(path) as f:
        cases = json.load(f)
    assert len(cases) == 10
    for case in cases:
        doc = base64.b64decode(case["doc"])
        for key, expect in case["streams"].items():
            got = py_parse(doc, case["mask"], int(key))
            assert got == expect, f"doc={doc[:40]!r} split={key}"


def test_reference_tag_boundary_assertions():
    """Direct port of test_tag_write_boundary (ref parser.rs:1663-1711)."""
    doc = b'<div empty=""><a href="http://github.com">GitHub</a></orphan></div>'
    for i in range(1, len(doc)):
        evs = run(doc, E_REF_SWEEP, split=i)
        tags = [e for _, e in evs if isinstance(e, Tag)]
        texts = [e for _, e in evs if isinstance(e, TextNode)]
        attrs = [e for _, e in evs if isinstance(e, Attribute)]
        assert len(tags) == 2, f"i={i}"
        assert tags[0].name == b"a" and tags[1].name == b"div"
        assert tags[0].close_start[1] == 48 and tags[1].close_start[1] == 61
        assert len(tags[0].attributes) == 1
        assert tags[0].attributes[0].name.value == b"href"
        assert tags[0].attributes[0].value.value == b"http://github.com"
        assert tags[1].attributes[0].name.value == b"empty"
        assert tags[1].attributes[0].value.value == b""
        assert len(texts) == 2
        assert texts[0].value == b"GitHub"
        assert texts[0].start == (0, 42) and texts[0].end == (0, 48)
        assert texts[1].value == b"</orphan>"
        assert len(attrs) == 2
        assert attrs[0].name.value == b"empty" and attrs[1].name.value == b"href"


def test_reference_attribute_value_boundary_assertions():
    """Port of test_attribute_value_write_boundary (parser.rs:2107-2145)."""
    doc = b'<text top="100.00" />'
    for i in range(1, len(doc)):
        evs = run(doc, 1 << EVT_ATTRIBUTE, split=i)
        attrs = [e for _, e in evs if isinstance(e, Attribute)]
        assert len(attrs) == 1, f"i={i}"
        assert (attrs[0].b0, attrs[0].b1) == (6, 18), f"i={i}"
        assert attrs[0].name.value == b"top" and attrs[0].value.value == b"100.00"


def test_64k_chunked_stream_equivalence():
    """Large synthetic doc: 64 KB-chunked parse == single-write parse
    (values), mirroring stream_large_xml (ref parser.rs:1804-1822)."""
    body = []
    for i in range(3000):
        body.append(f'<item id="i{i}" class=c{i % 7}><name>item {i}</name>'.encode())
        if i % 5 == 0:
            body.append(f"<!-- note {i} --><![CDATA[raw {i}]]>".encode())
        body.append(b"</item>\n")
    doc = b"<root>" + b"".join(body) + b"</root>"
    assert len(doc) > 128 * 1024
    base = stable_view(run(doc, E_REF_SWEEP))
    chunked = []
    p = SaxParser(events=E_REF_SWEEP, handler=lambda c, e: chunked.append((c, e)))
    for i in range(0, len(doc), 64 * 1024):
        p.write(doc[i : i + 64 * 1024])
    p.end()
    assert stable_view(chunked) == base
    assert len(base) > 10000
