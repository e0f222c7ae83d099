"""Pathological-document robustness: the hot path must stay linear-ish
and never crash on adversarial structures (a poison document must cost
one task its time slice, not the job)."""

import time

from sax_wasm_spark.kernel.fastsax import parse_doc, parse_doc_flat
from sax_wasm_spark.operators.extract import extract_bytes


def _bounded(doc: bytes, mask: int = 0x3FF, budget_s: float = 10.0):
    t0 = time.perf_counter()
    rows = parse_doc_flat(doc, mask)
    dt = time.perf_counter() - t0
    assert dt < budget_s, f"{dt:.1f}s for {len(doc)} bytes"
    return rows


def test_deep_nesting():
    doc = b"<d>" * 20000 + b"x" + b"</d>" * 20000
    rows = _bounded(doc)
    opens = sum(1 for r in rows if r[0] == 7)
    closes = sum(1 for r in rows if r[0] == 8)
    assert opens == 20000 and closes == 20000


def test_huge_comment_with_many_gt():
    # '>'-dense comment: the fused path must find '-->' in one scan
    doc = b"<a><!--" + b"x> " * 200000 + b"--></a>"
    rows = _bounded(doc)
    comments = [r for r in rows if r[0] == 4]
    assert len(comments) == 1
    assert len(comments[0][3]) == 600000


def test_huge_cdata_with_many_gt():
    doc = b"<a><![CDATA[" + b"]> " * 200000 + b"]]></a>"
    rows = _bounded(doc)
    cd = [r for r in rows if r[0] == 9]
    assert len(cd) == 1


def test_enormous_attribute_value():
    doc = b'<a href="' + b"v" * 2_000_000 + b'">t</a>'
    rows = _bounded(doc)
    attrs = [r for r in rows if r[0] == 6]
    assert len(attrs) == 1 and len(attrs[0][5]) == 2_000_000


def test_many_tiny_attributes():
    doc = b"<e " + b" ".join(b'a%d="%d"' % (i, i) for i in range(30000)) + b">x</e>"
    rows = _bounded(doc)
    assert sum(1 for r in rows if r[0] == 6) == 30000


def test_unclosed_everything():
    for doc in (
        b"<a><b><c>text",
        b"<!-- never closed " + b"x" * 100000,
        b"<![CDATA[" + b"y" * 100000,
        b"<a href='unclosed " + b"z" * 100000,
        b"<?pi " + b"w" * 100000,
        b"<" * 50000,
        b">" * 50000,
        b"</orphan>" * 20000,
    ):
        _bounded(doc)


def test_extractor_on_pathological():
    doc = b"<div>" * 5000 + b"real content here that is long enough" + b"</div>" * 5000
    text, spans, n_events, status, title = extract_bytes(doc)
    assert status == "ok"
    assert b"real content" in text


def test_null_bytes_and_controls():
    doc = b"<a>\x00\x01\x02</a><b x=\x00>t</b>"
    rows = parse_doc(doc, 0x3FF)
    assert rows is not None  # ascii incl. control bytes stays on the fast path
