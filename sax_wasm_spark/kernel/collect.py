"""Event collection: run the SAX kernel over a document and materialize
the event stream as flat, columnar-friendly records.

The flat record layout is the contract between the kernel and the Spark
layer (see FIXTURES.md §2). One record per emitted event:

(event:int, event_idx:int, name:str|None, value:bytes|None,
 attr_name:bytes|None, attr_value:bytes|None, attr_type:int|None,
 self_closing:bool|None, target:bytes|None, content:bytes|None,
 line_start, char_start, line_end, char_end,
 open_end_line, open_end_char, close_start_line, close_start_char,
 byte_start, byte_end)

Position mapping per entity kind:
- Tag events (OpenTagStart/OpenTag/CloseTag): start=open_start,
  end=close_end, open_end_*/close_start_* as named.
- Text-like events (Text/Comment/Doctype/Cdata/Declaration):
  start/end; other position fields None.
- Attribute: start=name.start, open_end=name.end,
  close_start=value.start, end=value.end.
- ProcInst: start/end; target/content carried as bytes.
"""

from __future__ import annotations

from .saxkernel import (
    Attribute,
    ProcInst,
    SaxParser,
    Tag,
    TextNode,
)

ALL_EVENTS = 0x3FF

FIELD_NAMES = (
    "event",
    "event_idx",
    "name",
    "value",
    "attr_name",
    "attr_value",
    "attr_type",
    "self_closing",
    "target",
    "content",
    "line_start",
    "char_start",
    "line_end",
    "char_end",
    "open_end_line",
    "open_end_char",
    "close_start_line",
    "close_start_char",
    "byte_start",
    "byte_end",
)


class EventCollector:
    """Accumulates flat event tuples; reusable across documents."""

    __slots__ = ("rows", "_idx")

    def __init__(self):
        self.rows = []
        self._idx = 0

    def reset(self):
        self.rows = []
        self._idx = 0

    def __call__(self, code: int, entity):
        idx = self._idx
        self._idx = idx + 1
        kind = type(entity)
        if kind is Tag:
            self.rows.append(
                (
                    code,
                    idx,
                    entity.name.decode("utf-8", "replace"),
                    None,
                    None,
                    None,
                    None,
                    entity.self_closing,
                    None,
                    None,
                    entity.open_start[0],
                    entity.open_start[1],
                    entity.close_end[0],
                    entity.close_end[1],
                    entity.open_end[0],
                    entity.open_end[1],
                    entity.close_start[0],
                    entity.close_start[1],
                    entity.b0,
                    entity.b1,
                )
            )
        elif kind is TextNode:
            self.rows.append(
                (
                    code,
                    idx,
                    None,
                    bytes(entity.value),
                    None,
                    None,
                    None,
                    None,
                    None,
                    None,
                    entity.start[0],
                    entity.start[1],
                    entity.end[0],
                    entity.end[1],
                    None,
                    None,
                    None,
                    None,
                    entity.b0,
                    entity.b1,
                )
            )
        elif kind is Attribute:
            self.rows.append(
                (
                    code,
                    idx,
                    None,
                    None,
                    bytes(entity.name.value),
                    bytes(entity.value.value),
                    entity.attr_type,
                    None,
                    None,
                    None,
                    entity.name.start[0],
                    entity.name.start[1],
                    entity.value.end[0],
                    entity.value.end[1],
                    entity.name.end[0],
                    entity.name.end[1],
                    entity.value.start[0],
                    entity.value.start[1],
                    entity.b0,
                    entity.b1,
                )
            )
        elif kind is ProcInst:
            self.rows.append(
                (
                    code,
                    idx,
                    None,
                    None,
                    None,
                    None,
                    None,
                    None,
                    bytes(entity.target.value),
                    bytes(entity.content.value),
                    entity.start[0],
                    entity.start[1],
                    entity.end[0],
                    entity.end[1],
                    entity.target.end[0],
                    entity.target.end[1],
                    entity.content.start[0],
                    entity.content.start[1],
                    entity.b0,
                    entity.b1,
                )
            )


def parse_events(
    data: bytes,
    events: int = ALL_EVENTS,
    chunk_size: int = 0,
) -> list[tuple]:
    """Parse one document and return its flat event records.

    ``chunk_size`` > 0 feeds the parser in fixed-size writes
    (streaming-parity mode, mirroring the reference's 64 KB stream test at
    parser.rs:1804-1822); 0 parses in a single write.
    """
    collector = EventCollector()
    parser = SaxParser(events=events, handler=collector)
    if chunk_size and chunk_size < len(data):
        for i in range(0, len(data), chunk_size):
            parser.write(data[i : i + chunk_size])
    else:
        parser.write(data)
    parser.end()
    return collector.rows


def parse_events_split(data: bytes, split_at: int, events: int = ALL_EVENTS) -> list[tuple]:
    """Parse with exactly two writes split at byte index ``split_at`` —
    the chunk-boundary sweep primitive (ref parser.rs:1663-1711)."""
    collector = EventCollector()
    parser = SaxParser(events=events, handler=collector)
    parser.write(data[:split_at])
    parser.write(data[split_at:])
    parser.end()
    return collector.rows
