"""Pin mid-parse event subscription re-arm (ref saxWasm.ts:579-594:
`set events(...)` forwards the new mask to the parser BETWEEN writes;
the reference applies it to events generated from that point on).

Our analogue is the settable ``SaxParser.events`` attribute
(saxkernel.py ~:308) — the mask is consulted at emission time, so
changing it between ``write()`` calls changes which events the second
chunk emits without resetting parser state.
"""

from sax_wasm_spark.kernel.collect import EventCollector
from sax_wasm_spark.kernel.saxkernel import EVT_CLOSE_TAG, EVT_TEXT, SaxParser

DOC_A = b"<a>hello</a>"
DOC_B = b"<b>world</b>"


def _events(rows):
    return [r[0] for r in rows]


def test_rearm_between_writes_widens_subscription():
    """Chunk 1 parsed with Text-only; CloseTag armed before chunk 2 →
    chunk 1 contributes only its Text, chunk 2 both Text and CloseTag."""
    collector = EventCollector()
    parser = SaxParser(events=1 << EVT_TEXT, handler=collector)
    parser.write(DOC_A)
    first = list(collector.rows)
    parser.events = (1 << EVT_TEXT) | (1 << EVT_CLOSE_TAG)
    parser.write(DOC_B)
    parser.end()
    rows = collector.rows
    assert _events(first) == [EVT_TEXT]  # </a> close suppressed
    tail = rows[len(first):]
    assert EVT_CLOSE_TAG in _events(tail)  # </b> now reported
    texts = [r for r in rows if r[0] == EVT_TEXT]
    assert [t[3] for t in texts] == [b"hello", b"world"]
    closes = [r for r in rows if r[0] == EVT_CLOSE_TAG]
    assert [c[2] for c in closes] == ["b"]


def test_rearm_between_writes_narrows_subscription():
    """The inverse direction: disarming CloseTag mid-stream stops
    reporting from the next write (mirrors re-assigning a smaller mask
    through the reference's events setter)."""
    collector = EventCollector()
    parser = SaxParser(events=(1 << EVT_TEXT) | (1 << EVT_CLOSE_TAG), handler=collector)
    parser.write(DOC_A)
    n_first = len(collector.rows)
    assert EVT_CLOSE_TAG in _events(collector.rows[:n_first])
    parser.events = 1 << EVT_TEXT
    parser.write(DOC_B)
    parser.end()
    tail = collector.rows[n_first:]
    assert _events(tail) == [EVT_TEXT]
    assert tail[0][3] == b"world"


def test_rearm_matches_fresh_parser_on_second_chunk():
    """Events emitted after the re-arm are identical (names/values) to
    what a parser armed from the start would emit for that region."""
    collector = EventCollector()
    parser = SaxParser(events=1 << EVT_TEXT, handler=collector)
    parser.write(DOC_A)
    parser.events = (1 << EVT_TEXT) | (1 << EVT_CLOSE_TAG)
    parser.write(DOC_B)
    parser.end()
    ref_collector = EventCollector()
    ref = SaxParser(events=(1 << EVT_TEXT) | (1 << EVT_CLOSE_TAG), handler=ref_collector)
    ref.write(DOC_A + DOC_B)
    ref.end()

    def tail(rows):
        # events in DOC_B's byte range, minus event_idx (a per-parser
        # counter that legitimately differs between the two runs)
        return [r[:1] + r[2:] for r in rows if r[-2] >= len(DOC_A)]

    assert tail(collector.rows) == tail(ref_collector.rows)
