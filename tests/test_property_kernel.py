"""Property-based differential testing (hypothesis).

Properties:
1. fastsax ≡ FSM on arbitrary generated documents (any event mask);
2. FSM chunked-at-arbitrary-points emits the same *values* as unsplit
   (the reference's cross-write guarantee for value payloads of
   Text/Comment/Cdata/Attribute events, modulo the documented
   split-position quirks — so the property checks single-vs-single and
   fast-vs-FSM, the unambiguous invariants);
3. the tokenizer never crashes and event byte ranges are well-formed.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from sax_wasm_spark.kernel.collect import EventCollector
from sax_wasm_spark.kernel.fastsax import parse_doc, parse_doc_flat
from sax_wasm_spark.kernel.saxkernel import SaxParser

_FRAGMENTS = st.sampled_from(
    [
        "<div>", "</div>", "<p class='x'>", "</p>", "text ", "a<b", "< x",
        "<a h=u>", "<br/>", "<!--c-->", "<![CDATA[z]]>", "<!DOCTYPE d>",
        "<?pi v?>", "<?>", "\n", " ", "\t", ">", "/", "=", '"', "'",
        "</orphan>", "<>", "</>", "{", "}", "é", "🚀", "<e a={x}>",
        "<!ENTITY q 'v'>", "<!", "<![", "x=y", "&amp;", "<e\na=1>",
    ]
)

_DOCS = st.lists(_FRAGMENTS, min_size=0, max_size=20).map(lambda xs: "".join(xs).encode())
_RAW = st.binary(min_size=0, max_size=120)
_MASKS = st.integers(min_value=0, max_value=1023)


def fsm_rows(d: bytes, m: int):
    c = EventCollector()
    p = SaxParser(events=m, handler=c)
    p.write(d)
    p.end()
    return c.rows


@settings(max_examples=400, deadline=None)
@given(doc=_DOCS, mask=_MASKS)
def test_fast_equals_fsm(doc, mask):
    fast = parse_doc(doc, mask)
    if fast is None:
        return  # out-of-profile → fallback covers it (next property)
    assert fast == fsm_rows(doc, mask)


@settings(max_examples=200, deadline=None)
@given(doc=_RAW, mask=_MASKS)
def test_fallback_on_arbitrary_bytes(doc, mask):
    """parse_doc_flat never crashes and always equals the FSM, even on
    raw binary garbage (invalid UTF-8 routes through the FSM)."""
    assert parse_doc_flat(doc, mask) == fsm_rows(doc, mask)


@settings(max_examples=200, deadline=None)
@given(doc=_DOCS)
def test_byte_ranges_well_formed(doc):
    rows = parse_doc_flat(doc, 0x3FF)
    n = len(doc)
    for r in rows:
        b0, b1 = r[18], r[19]
        if b0 is not None and b1 is not None and b1 > 0:
            assert 0 <= b0 <= n
            assert 0 <= b1 <= n
