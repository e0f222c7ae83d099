"""Streaming SAX tokenizer — a from-scratch Python re-expression of the
reference state machine (/root/reference/src/sax/parser.rs), built for
use inside Arrow-batched Spark UDFs.

The FSM (24 states, ref parser.rs:1262-1312), terminator byte classes
(ref parser.rs:14-36), entity structures (ref src/sax/tag.rs) and every
positional/edge quirk are reproduced so that the emitted event stream is
identical to the reference for any byte input and any chunking:

- whitespace-only inter-element text is never emitted
  (ref parser.rs:411-425);
- a newline always flushes the pending text node (ref parser.rs:591-594);
- an orphan close tag becomes a Text event ``"</name>"``
  (ref parser.rs:1164-1179);
- ``<!ENTITY``-style declarations are gated on the Declaration
  subscription but dispatched with the Cdata event code
  (ref parser.rs:822-823) — a reference quirk we keep;
- positions: 0-based lines, UTF-16 code-unit columns, absolute byte
  offsets accumulated per write (ref parser.rs:97,263);
- incomplete trailing UTF-8 sequences carry over between writes
  (ref parser.rs:235-243).

Events (bit = 1 << code, ref parser.rs:1224-1246):
0 Text, 1 ProcessingInstruction, 2 Declaration, 3 Doctype, 4 Comment,
5 OpenTagStart, 6 Attribute, 7 OpenTag, 8 CloseTag, 9 Cdata.
"""

from __future__ import annotations

from .cursor import GraphemeCursor
from .names import is_name_start_char

# ---------------------------------------------------------------------------
# event codes / attribute types

EVT_TEXT = 0
EVT_PROC_INST = 1
EVT_DECLARATION = 2
EVT_DOCTYPE = 3
EVT_COMMENT = 4
EVT_OPEN_TAG_START = 5
EVT_ATTRIBUTE = 6
EVT_OPEN_TAG = 7
EVT_CLOSE_TAG = 8
EVT_CDATA = 9

EVENT_NAMES = [
    "text",
    "processing_instruction",
    "declaration",
    "doctype",
    "comment",
    "open_tag_start",
    "attribute",
    "open_tag",
    "close_tag",
    "cdata",
]

ATTR_NO_VALUE = 0
ATTR_JSX = 1
ATTR_NO_QUOTES = 2
ATTR_SINGLE_QUOTED = 4
ATTR_DOUBLE_QUOTED = 8

# terminator byte classes (ref parser.rs:14-36)
BOM = b"\xef\xbb\xbf"
TAG_NAME_END = b">/ \n\t\r"
TEXT_END = b"<\n"
ATTRIBUTE_NAME_END = b"=> \t\n"
ATTRIBUTE_VALUE_END = b" \t\n>"
PROC_INST_TARGET_END = b"> \n\t\r"
ENTITY_CAPTURE_END = b">- ["
DOCTYPE_VALUE_END = b" \n\t\r>"
DOCTYPE_END = b"!>"

# states (ref parser.rs:1262-1312)
S_BEGIN = 0
S_BEGIN_WHITESPACE = 1
S_TEXT = 2
S_LT = 3
S_MARKUP_DECL = 4
S_ENTITY = 5
S_DOCTYPE = 6
S_DOCTYPE_ENTITY = 7
S_COMMENT = 8
S_CDATA = 9
S_PROC_INST = 10
S_PROC_INST_VALUE = 11
S_OPEN_TAG = 12
S_OPEN_TAG_SLASH = 13
S_ATTRIB = 14
S_ATTRIB_NAME = 15
S_ATTRIB_NAME_SAW_WHITE = 16
S_ATTRIB_VALUE = 17
S_ATTRIB_VALUE_QUOTED = 18
S_ATTRIB_VALUE_CLOSED = 19
S_ATTRIB_VALUE_UNQUOTED = 20
S_CLOSE_TAG = 21
S_JSX_ATTRIBUTE_EXPRESSION = 22
S_SKIP_WHITESPACE = 23


# ---------------------------------------------------------------------------
# entities (ref src/sax/tag.rs) — lazy header slices into the write buffer,
# hydrated (copied into `value`) at the end of each write

class TextNode:
    __slots__ = ("h0", "h1", "value", "start", "end", "b0", "b1")

    def __init__(self, start=(0, 0)):
        self.h0 = 0
        self.h1 = 0
        self.value = b""
        self.start = start
        self.end = (0, 0)
        self.b0 = 0
        self.b1 = 0

    def clone(self):
        t = TextNode.__new__(TextNode)
        t.h0, t.h1, t.value = self.h0, self.h1, self.value
        t.start, t.end, t.b0, t.b1 = self.start, self.end, self.b0, self.b1
        return t

    def hydrate(self, buf: bytes) -> bool:
        """ref tag.rs:121-137"""
        start, end = self.h0, self.h1
        self.h0 = 0
        self.h1 = 0
        if start > end:
            return len(self.value) > 0
        if end > start:
            self.value = self.value + buf[start:end]
        elif start > 0 and start == end:
            self.value = self.value + buf[start : start + 1]
        return True

    def get_value_slice(self, buf: bytes, buf_len: int) -> bytes:
        """ref tag.rs:102-119 — appends the pending header slice to value."""
        start, end = self.h0, self.h1
        if start > end or end > buf_len:
            return self.value
        if end > start:
            self.value = self.value + buf[start:end]
        elif start > 0 and start == end:
            self.value = self.value + buf[start : start + 1]
        self.h0 = 0
        self.h1 = 0
        return self.value


class Tag:
    __slots__ = (
        "name",
        "attributes",
        "text_nodes",
        "self_closing",
        "open_start",
        "open_end",
        "close_start",
        "close_end",
        "h0",
        "h1",
        "b0",
        "b1",
    )

    def __init__(self, open_start=(0, 0)):
        self.name = b""
        self.attributes = []
        self.text_nodes = []
        self.self_closing = False
        self.open_start = open_start
        self.open_end = (0, 0)
        self.close_start = (0, 0)
        self.close_end = (0, 0)
        self.h0 = 0
        self.h1 = 0
        self.b0 = 0
        self.b1 = 0

    def clone(self):
        t = Tag.__new__(Tag)
        t.name = self.name
        t.attributes = [a.clone() for a in self.attributes]
        t.text_nodes = [x.clone() for x in self.text_nodes]
        t.self_closing = self.self_closing
        t.open_start, t.open_end = self.open_start, self.open_end
        t.close_start, t.close_end = self.close_start, self.close_end
        t.h0, t.h1, t.b0, t.b1 = self.h0, self.h1, self.b0, self.b1
        return t

    def _materialize_name(self, buf: bytes):
        """ref tag.rs:62-78"""
        start, end = self.h0, self.h1
        if start > end:
            return
        if end > start:
            self.name = self.name + buf[start:end]
        elif start > 0 and start == end:
            self.name = self.name + buf[start : start + 1]
        self.h0 = 0
        self.h1 = 0

    def get_name_slice(self, buf: bytes) -> bytes:
        """ref tag.rs:35-49"""
        if self.name:
            self._materialize_name(buf)
            return self.name
        start, end = self.h0, self.h1
        if start < end:
            return buf[start:end]
        return b""

    def hydrate(self, buf: bytes) -> bool:
        """ref tag.rs:51-60"""
        for a in self.attributes:
            a.hydrate(buf)
        for t in self.text_nodes:
            t.hydrate(buf)
        self._materialize_name(buf)
        return True


class Attribute:
    __slots__ = ("name", "value", "attr_type", "b0", "b1")

    def __init__(self):
        self.name = TextNode()
        self.value = TextNode()
        self.attr_type = ATTR_NO_VALUE
        self.b0 = 0
        self.b1 = 0

    def clone(self):
        a = Attribute.__new__(Attribute)
        a.name = self.name.clone()
        a.value = self.value.clone()
        a.attr_type = self.attr_type
        a.b0, a.b1 = self.b0, self.b1
        return a

    def hydrate(self, buf: bytes) -> bool:
        hn = self.name.hydrate(buf)
        hv = self.value.hydrate(buf)
        return hn or hv


class ProcInst:
    __slots__ = ("start", "end", "target", "content", "b0", "b1")

    def __init__(self):
        self.start = (0, 0)
        self.end = (0, 0)
        self.target = TextNode()
        self.content = TextNode()
        self.b0 = 0
        self.b1 = 0

    def clone(self):
        p = ProcInst.__new__(ProcInst)
        p.start, p.end = self.start, self.end
        p.target = self.target.clone()
        p.content = self.content.clone()
        p.b0, p.b1 = self.b0, self.b1
        return p

    def hydrate(self, buf: bytes) -> bool:
        ht = self.target.hydrate(buf)
        hc = self.content.hydrate(buf)
        return ht or hc


# ---------------------------------------------------------------------------

class SaxParser:
    """Push parser: ``write(chunk)`` any number of times, then ``end()``.

    ``events`` is the 10-bit subscription mask. ``handler(code, entity)``
    receives each emitted event; entities are owned by the callee.
    """

    __slots__ = (
        "events",
        "handler",
        "state",
        "brace_ct",
        "quote",
        "tags",
        "text",
        "markup_decl",
        "markup_entity",
        "proc_inst",
        "attribute",
        "tag",
        "close_tag",
        "fragment",
        "end_line",
        "end_character",
        "end_offset",
        "chunk_offset",
        "buf",
        "_gc",
    )

    def __init__(self, events: int = 0, handler=None):
        self.events = events
        self.handler = handler or (lambda code, entity: None)
        self._reset()

    def _reset(self):
        self.state = S_BEGIN
        self.brace_ct = 0
        self.quote = 0
        self.tags = []
        self.text = None
        self.markup_decl = None
        self.markup_entity = None
        self.proc_inst = None
        self.attribute = Attribute()
        self.tag = Tag((0, 0))
        self.close_tag = TextNode((0, 0))
        self.fragment = b""
        self.end_line = 0
        self.end_character = 0
        self.end_offset = 0
        self.chunk_offset = 0
        self.buf = b""
        self._gc = None

    # -- public API --------------------------------------------------------

    def write(self, chunk: bytes):
        """ref parser.rs:231-264"""
        buf = self.fragment + chunk if self.fragment else chunk
        self.fragment = b""
        self.buf = buf

        gc = GraphemeCursor(buf)
        gc.line = self.end_line
        gc.character = self.end_character
        self._gc = gc

        nxt = gc.next
        process = self._process
        while True:
            current = nxt()
            if current is None:
                break
            process(gc, current)

        self.end_line = gc.line
        self.end_character = gc.character
        self.end_offset = gc.cursor

        rem = gc.get_remaining_bytes()
        if rem is not None:
            self.fragment = self.fragment + rem

        self._hydrate_all()
        self.chunk_offset += len(chunk)

    def end(self):
        """Flush pending text and reset (ref parser.rs:332-360)."""
        self._flush_text(self.end_line, self.end_character, 0)
        self._reset()

    # -- plumbing ----------------------------------------------------------

    def _hydrate_all(self):
        """ref parser.rs:266-290"""
        buf = self.buf
        for tag in self.tags:
            tag.hydrate(buf)
        if self.text is not None:
            self.text.hydrate(buf)
        if self.markup_decl is not None:
            self.markup_decl.hydrate(buf)
        if self.markup_entity is not None:
            self.markup_entity.hydrate(buf)
        if self.state == S_CLOSE_TAG:
            self.close_tag.hydrate(buf)
        self.attribute.hydrate(buf)
        if self.proc_inst is not None:
            self.proc_inst.hydrate(buf)
        self.tag.hydrate(buf)

    def _process(self, gc, current):
        """State dispatch (ref parser.rs:372-399)."""
        _HANDLERS[self.state](self, gc, current)

    # -- state handlers ----------------------------------------------------

    def _begin(self, gc, current):
        """ref parser.rs:401-409 — BOM honored only as the first grapheme."""
        self.state = S_BEGIN_WHITESPACE
        if current == BOM:
            return
        self._begin_white_space(gc, current)

    def _skip_whitespace(self, gc, current):
        """ref parser.rs:411-425"""
        byte = current[0]
        if byte > 32 or gc.skip_whitespace():
            text = self.text
            if text is not None:
                text.value = b""
                text.start = (gc.line, gc.character)
                text.h0 = gc.cursor
            self.state = S_BEGIN_WHITESPACE
            if byte > 32:
                self._begin_white_space(gc, current)

    def _begin_white_space(self, gc, current):
        """ref parser.rs:427-442"""
        byte = current[0]
        if byte == 0x0A:
            self.state = S_SKIP_WHITESPACE
            return
        if byte == 0x3C:  # '<'
            self.tag = Tag((gc.line, gc.last_character))
            self.state = S_LT
            return
        self._new_text(gc.line, gc.last_character, gc.last_cursor_pos)

    def _less_than(self, gc, current):
        """ref parser.rs:444-516"""
        should_flush_text = True
        character = gc.character - 2 if gc.character >= 2 else 0
        offset = gc.last_cursor_pos - 1 if gc.last_cursor_pos >= 1 else 0
        b0 = current[0]

        if is_name_start_char(current):
            should_flush_text = False
            tag = self.tag
            tag.h0 = gc.last_cursor_pos
            tag.h1 = gc.cursor
            self.state = S_OPEN_TAG
            # flush first so pending text lands on the right tag
            self._flush_text(gc.line, character, offset)
            self._open_tag(gc, current)
        elif b0 == 0x21:  # '!'
            self.state = S_MARKUP_DECL
            md = TextNode((gc.line, gc.last_character))
            br0 = self.chunk_offset + gc.cursor - 2
            md.b0 = br0 if br0 >= 0 else 0
            md.h0 = gc.cursor - 1 if gc.cursor >= 1 else 0
            md.h1 = gc.cursor
            md.value = b"<"
            self.markup_decl = md
        elif b0 == 0x2F:  # '/'
            self.state = S_CLOSE_TAG
            lc = gc.last_character
            self.tag.close_start = (gc.line, lc - 1 if lc >= 1 else 0)
            self.close_tag.h0 = gc.last_cursor_pos
        elif b0 == 0x3F:  # '?'
            self.state = S_PROC_INST
            pi = ProcInst()
            ch = gc.character
            pi.start = (gc.line, ch - 2 if ch >= 2 else 0)
            pi.target.start = (gc.line, gc.character)
            lcp = gc.last_cursor_pos
            pi.target.h0 = lcp - 1 if lcp >= 1 else 0
            pi.target.h1 = gc.cursor
            br0 = self.chunk_offset + gc.cursor - 2
            pi.b0 = br0 if br0 >= 0 else 0
            self.proc_inst = pi
        elif b0 == 0x3E:  # '>' : JSX fragment <>
            should_flush_text = False
            self._flush_text(gc.line, character, offset)
            self._process_open_tag(False, gc)
        else:
            should_flush_text = False
            # '< foo' is text, not a tag (ref parser.rs:503-510)
            self._new_text(gc.line, gc.character, gc.last_cursor_pos)

        if should_flush_text and self.text is not None:
            self._flush_text(gc.line, character, offset)

    def _open_tag(self, gc, current):
        """ref parser.rs:518-549"""
        tag = self.tag
        ch = gc.character
        tag.open_start = (gc.line, ch - 2 if ch >= 2 else 0)
        br0 = self.chunk_offset + gc.cursor - 2
        tag.b0 = br0 if br0 >= 0 else 0
        byte = current[0]
        if byte not in TAG_NAME_END:
            r = gc.take_until_one_found(TAG_NAME_END, True)
            if r is not None:
                span, found = r
                byte = span[-1]
                tag.h1 = gc.last_cursor_pos if found else gc.cursor
            else:
                tag.h1 = gc.last_cursor_pos

        if self.events & (1 << EVT_OPEN_TAG_START):
            clone = tag.clone()
            clone.hydrate(self.buf)
            self.handler(EVT_OPEN_TAG_START, clone)

        if byte == 0x3E:
            self._process_open_tag(False, gc)
        elif byte == 0x2F:
            self.state = S_OPEN_TAG_SLASH
        elif byte in (0x20, 0x09, 0x0A, 0x0D):
            self.state = S_ATTRIB

    def _close_tag_handler(self, gc, current):
        """ref parser.rs:551-579"""
        byte = current[0]
        if byte != 0x3E:
            offset = 0
            start = gc.last_cursor_pos
            r = gc.take_until_one_found(b"> ", True)
            if r is not None:
                span, found = r
                byte = span[-1]
                offset = 1 if found else 0
            end = gc.cursor
            self.close_tag.h0 = start
            self.close_tag.h1 = end - offset

        if byte == 0x3E:
            self._process_close_tag(gc)
        elif byte == 0x20:
            gc.skip_whitespace()

    def _text(self, gc, current):
        """ref parser.rs:581-602"""
        byte = current[0]
        if byte == 0x3C:
            self.state = S_LT
            return
        if byte == 0x0A:
            # newlines always flush text (ref parser.rs:591-594)
            self._flush_text(gc.last_line, gc.last_character, gc.last_cursor_pos)
            self.state = S_SKIP_WHITESPACE
        else:
            gc.take_until_one_found(TEXT_END, False)
            text = self.text
            if text is not None:
                text.h1 = gc.cursor
                text.b1 = self.chunk_offset + gc.cursor

    def _flush_text(self, line, character, offset):
        """ref parser.rs:604-628"""
        text = self.text
        if text is None:
            return
        self.text = None
        text.end = (line, character)
        text.h1 = offset
        if text.h0 == text.h1 and not text.value:
            return
        text.b1 = self.chunk_offset + offset
        events = self.events
        if self.tags and events & (1 << EVT_CLOSE_TAG):
            self.tags[-1].text_nodes.append(text.clone())
        if events & (1 << EVT_TEXT) and text.hydrate(self.buf):
            self.handler(EVT_TEXT, text)

    def _markup_decl(self, gc, current):
        """ref parser.rs:630-692 — classify <!… as comment/CDATA/doctype/entity."""
        byte = current[0]
        if byte not in ENTITY_CAPTURE_END:
            gc.take_until_one_found(ENTITY_CAPTURE_END, False)

        md = self.markup_decl
        md.h1 = gc.cursor
        md.b1 = self.chunk_offset + gc.cursor

        md_slice = md.get_value_slice(self.buf, gc.n)
        sl_len = len(md_slice)

        if sl_len >= 4 and md_slice[:4] == b"<!--":
            ch = gc.character
            md.start = (gc.line, ch - 4 if ch >= 4 else 0)
            md.value = b""
            md.h0 = gc.cursor
            md.h1 = 0
            br1 = self.chunk_offset + gc.cursor - 4
            md.b1 = br1 if br1 >= 0 else 0
            self.state = S_COMMENT
            return

        if sl_len >= 9 and md_slice[:9].lower() == b"<![cdata[":
            ch = gc.character
            md.start = (gc.line, ch - 9 if ch >= 9 else 0)
            br1 = self.chunk_offset + gc.cursor - 9
            md.b1 = br1 if br1 >= 0 else 0
            md.value = b""
            md.h0 = gc.cursor
            md.h1 = 0
            self.state = S_CDATA
            return

        if sl_len >= 9 and md_slice[:9].lower() == b"<!doctype":
            ch = gc.character
            md.start = (gc.line, ch - 9 if ch >= 9 else 0)
            br1 = self.chunk_offset + gc.cursor - 9
            md.b1 = br1 if br1 >= 0 else 0
            gc.skip_whitespace()
            md.value = b""
            md.h0 = gc.cursor
            md.h1 = 0
            self.state = S_DOCTYPE
            return

        bytes_to_check = md_slice[:3] if sl_len > 2 else md_slice
        if (
            bytes_to_check != b"<!-"
            and bytes_to_check != b"<!["
            and not _ascii_eq(b"<!D", bytes_to_check)
        ):
            ch = gc.character
            me = TextNode((gc.line, ch - 2 if ch >= 2 else 0))
            br1 = self.chunk_offset + gc.cursor - 2
            me.b1 = br1 if br1 >= 0 else 0
            gc.skip_whitespace()
            me.h0 = gc.cursor
            me.h1 = 0
            self.markup_entity = me
            self.state = S_ENTITY
            self.markup_decl = None
        else:
            md.h0 = gc.cursor
            md.h1 = 0

    def _comment(self, gc, current):
        """ref parser.rs:694-722 — scan to exactly '-->'."""
        md = self.markup_decl
        byte = current[0]
        if byte != 0x3E:
            gc.take_until(0x3E, True)

        md.h1 = gc.cursor
        md.b1 = self.chunk_offset + gc.cursor

        markup_slice = md.get_value_slice(self.buf, gc.n)
        ln = len(markup_slice)
        if ln > 2 and markup_slice[-3:] == b"-->":
            md.end = (gc.line, gc.character)
            if self.events & (1 << EVT_COMMENT) and md.hydrate(self.buf):
                md.value = md.value[:-3]
                self.handler(EVT_COMMENT, md)
            self.markup_decl = None
            self.state = S_BEGIN_WHITESPACE
        else:
            md.h0 = gc.cursor
            md.h1 = 0

    def _cdata(self, gc, current):
        """ref parser.rs:724-748 — scan to exactly ']]>'."""
        if current[0] != 0x3E:
            gc.take_until(0x3E, True)

        md = self.markup_decl
        md.h1 = gc.cursor
        md.b1 = self.chunk_offset + gc.cursor

        markup_slice = md.get_value_slice(self.buf, gc.n)
        ln = len(markup_slice)
        if ln > 2 and markup_slice[-3:] == b"]]>":
            md.end = (gc.line, gc.character)
            if self.events & (1 << EVT_CDATA) and md.hydrate(self.buf):
                md.value = md.value[:-3]
                self.handler(EVT_CDATA, md)
            self.state = S_BEGIN_WHITESPACE
        else:
            md.h0 = gc.cursor
            md.h1 = 0

    def _doctype(self, gc, current):
        """ref parser.rs:750-804"""
        byte = current[0]

        if self.state != S_DOCTYPE_ENTITY and byte not in DOCTYPE_VALUE_END:
            r = gc.take_until_one_found(DOCTYPE_VALUE_END, True)
            if r is not None:
                span, _ = r
                byte = span[-1]
            md = self.markup_decl
            md.h1 = gc.cursor
            md.b1 = self.chunk_offset + gc.cursor

        if byte not in DOCTYPE_END:
            r = gc.take_until_one_found(DOCTYPE_END, True)
            if r is not None:
                span, _ = r
                byte = span[-1]

        if byte == 0x21:  # '!' — <!ENTITY or similar inside the subset
            self.state = S_ENTITY
            me = TextNode((gc.line, gc.character))
            me.h0 = gc.cursor
            me.b0 = self.chunk_offset + gc.cursor
            self.markup_entity = me
            return

        if byte == 0x3E:
            md = self.markup_decl
            self.markup_decl = None
            md.end = (gc.line, gc.character)
            if self.events & (1 << EVT_DOCTYPE) and md.hydrate(self.buf):
                md.value = md.value[:-1]  # remove '>' or '['
                self.handler(EVT_DOCTYPE, md)
            self.state = S_BEGIN_WHITESPACE

    def _entity(self, gc, current):
        """ref parser.rs:806-837 — note the Declaration/Cdata dispatch quirk."""
        byte = current[0]
        if byte != 0x3E:
            r = gc.take_until(0x3E, True)
            if r is not None:
                span, _ = r
                if span:
                    byte = span[-1]

        if byte == 0x3E:
            me = self.markup_entity
            self.markup_entity = None
            me.h1 = gc.cursor - 1 if gc.cursor >= 1 else 0
            br1 = self.chunk_offset + gc.cursor - 1
            me.b1 = br1 if br1 >= 0 else 0
            ch = gc.character
            me.end = (gc.line, ch - 1 if ch >= 1 else 0)

            if self.events & (1 << EVT_DECLARATION) and me.hydrate(self.buf):
                # reference dispatches declarations with the Cdata code
                # (parser.rs:822-823)
                self.handler(EVT_CDATA, me)
            self.state = S_DOCTYPE_ENTITY if self.markup_decl is not None else S_BEGIN_WHITESPACE
            gc.skip_whitespace()

    def _proc_inst(self, gc, current):
        """ref parser.rs:839-869"""
        byte = current[0]
        if byte not in PROC_INST_TARGET_END:
            r = gc.take_until_one_found(PROC_INST_TARGET_END, True)
            if r is not None:
                span, _ = r
                byte = span[-1]

        pi = self.proc_inst
        pi.target.h1 = gc.cursor
        pi.target.b1 = self.chunk_offset + gc.cursor

        if byte == 0x3E:
            self._process_proc_inst(gc)
        elif byte < 33:
            pi.target.h1 = gc.cursor - 1 if gc.cursor >= 1 else 0
            ch = gc.character
            pi.target.end = (gc.line, ch - 1 if ch >= 1 else 0)
            gc.skip_whitespace()
            pi.content.start = (gc.line, gc.character)
            pi.content.h0 = gc.cursor
            pi.content.h1 = 0
            self.state = S_PROC_INST_VALUE

    def _proc_inst_value(self, gc, current):
        """ref parser.rs:871-889"""
        byte = current[0]
        pi = self.proc_inst
        if byte != 0x3E:
            r = gc.take_until(0x3E, True)
            if r is not None:
                span, _ = r
                if span:
                    byte = span[-1]

        pi.content.h1 = gc.cursor
        pi.content.b1 = self.chunk_offset + gc.cursor

        if byte != 0x3E:
            return
        self._process_proc_inst(gc)

    def _process_proc_inst(self, gc):
        """ref parser.rs:891-906"""
        self.state = S_BEGIN_WHITESPACE
        pi = self.proc_inst
        self.proc_inst = None
        pi.hydrate(self.buf)

        if self.events & (1 << EVT_PROC_INST):
            pi.end = (gc.line, gc.character)
            ch = gc.character
            pi.content.end = (gc.line, ch - 2 if ch >= 2 else 0)
            pi.b1 = self.chunk_offset + gc.cursor
            pi.target.value = pi.target.value[2:]  # remove '<?'
            cv = pi.content.value
            pi.content.value = cv[: len(cv) - 2] if len(cv) >= 2 else b""
            self.handler(EVT_PROC_INST, pi)

    def _open_tag_slash(self, gc, current):
        """ref parser.rs:908-914"""
        if current[0] == 0x3E:
            self._process_open_tag(True, gc)
            return
        self.state = S_ATTRIB

    def _attribute(self, gc, current):
        """ref parser.rs:916-938"""
        byte = current[0]
        if byte < 33:
            return
        attr = self.attribute
        br0 = self.chunk_offset + gc.cursor - 1
        attr.b0 = br0 if br0 >= 0 else 0
        if byte == 0x3E:
            self._process_open_tag(False, gc)
        elif byte == 0x2F:
            self.state = S_OPEN_TAG_SLASH
        else:
            ch = gc.character
            attr.name.start = (gc.line, ch - 1 if ch >= 1 else 0)
            attr.name.h0 = gc.last_cursor_pos
            nb0 = self.chunk_offset + gc.cursor - 1
            attr.name.b0 = nb0 if nb0 >= 0 else 0
            self.state = S_ATTRIB_NAME
            self._attribute_name(gc, current)

    def _attribute_name(self, gc, current):
        """ref parser.rs:940-971"""
        byte = current[0]
        attr = self.attribute
        if byte == 0x3D:  # '='
            ch = gc.character
            attr.name.end = (gc.line, ch - 1 if ch >= 1 else 0)
            nb1 = self.chunk_offset + gc.cursor - 1
            attr.name.b1 = nb1 if nb1 >= 0 else 0
            self.state = S_ATTRIB_VALUE
        elif byte == 0x3E:
            ch = gc.character
            attr.name.end = (gc.line, ch - 1 if ch >= 1 else 0)
            self._process_attribute(gc)
            self._process_open_tag(False, gc)
        elif byte < 33:
            if byte == 0x0A:
                attr.name.end = (gc.last_line, gc.last_character)
            else:
                ch = gc.character
                attr.name.end = (gc.line, ch - 1 if ch >= 1 else 0)
            attr.name.h1 = gc.last_cursor_pos
            attr.name.b1 = self.chunk_offset + gc.last_cursor_pos
            self.state = S_ATTRIB_NAME_SAW_WHITE
            self._attribute_name_saw_white(gc, current)
        else:
            gc.take_until_one_found(ATTRIBUTE_NAME_END, False)
            attr.name.end = (gc.line, gc.character)
            attr.name.h1 = gc.cursor
            attr.name.b1 = self.chunk_offset + gc.cursor

    def _attribute_name_saw_white(self, gc, current):
        """ref parser.rs:973-1001"""
        byte = current[0]
        if byte < 33:
            gc.skip_whitespace()
            return

        if byte != 0x3D:
            self._process_attribute(gc)

        if byte == 0x3D:
            self.state = S_ATTRIB_VALUE
        elif byte == 0x2F:
            self.state = S_OPEN_TAG_SLASH
        elif byte == 0x3E:
            self._process_open_tag(False, gc)
        else:
            attr = self.attribute
            ch = gc.character
            attr.name.start = (gc.line, ch - 1 if ch >= 1 else 0)
            attr.name.h0 = gc.last_cursor_pos
            attr.name.b0 = self.chunk_offset + gc.last_cursor_pos
            self.state = S_ATTRIB_NAME
            self._attribute_name(gc, current)

    def _attribute_value(self, gc, current):
        """ref parser.rs:1003-1033"""
        first = current[0]
        if first < 33:
            return
        attr = self.attribute
        attr.value.start = (gc.line, gc.character)
        attr.value.h0 = gc.cursor
        attr.value.b0 = self.chunk_offset + gc.cursor
        if first == 0x22 or first == 0x27:  # '"' or "'"
            self.quote = first
            self.state = S_ATTRIB_VALUE_QUOTED
            attr.attr_type = ATTR_DOUBLE_QUOTED if first == 0x22 else ATTR_SINGLE_QUOTED
        elif first == 0x7B:  # '{'
            self.state = S_JSX_ATTRIBUTE_EXPRESSION
            attr.attr_type = ATTR_JSX
            self.brace_ct += 1
        else:
            attr.value.h0 = gc.last_cursor_pos
            attr.value.b0 = self.chunk_offset + gc.last_cursor_pos
            ch = gc.character
            attr.value.start = (gc.line, ch - 1 if ch >= 1 else 0)
            self.state = S_ATTRIB_VALUE_UNQUOTED
            attr.attr_type = ATTR_NO_QUOTES
            self._attribute_value_unquoted(gc, current)

    def _attribute_value_quoted(self, gc, current):
        """ref parser.rs:1035-1052"""
        attr = self.attribute
        if current[0] == self.quote:
            ch = gc.character
            attr.value.end = (gc.line, ch - 1 if ch >= 1 else 0)
            header_1 = gc.cursor - 1 if gc.cursor >= 1 else 0
            if header_1 == attr.value.h0:
                attr.value.h1 = header_1 - 1 if header_1 >= 1 else 0
            else:
                attr.value.h1 = header_1
            vb1 = self.chunk_offset + gc.cursor - 1
            attr.value.b1 = vb1 if vb1 >= 0 else 0
            self._process_attribute(gc)
            self.quote = 0
            self.state = S_ATTRIB_VALUE_CLOSED
            return
        gc.take_until(self.quote, False)
        attr.value.h1 = gc.cursor

    def _attribute_value_closed(self, gc, current):
        """ref parser.rs:1054-1070"""
        byte = current[0]
        if byte < 33:
            self.state = S_ATTRIB
        elif byte == 0x3E:
            self._process_open_tag(False, gc)
        elif byte == 0x2F:
            self.state = S_OPEN_TAG_SLASH
        else:
            attr = self.attribute
            attr.name.h0 = gc.last_cursor_pos
            attr.name.b0 = self.chunk_offset + gc.last_cursor_pos
            attr.b0 = attr.name.b0
            self.state = S_ATTRIB_NAME
            ch = gc.character
            attr.name.start = (gc.line, ch - 1 if ch >= 1 else 0)
            self._attribute_name(gc, current)

    def _attribute_value_unquoted(self, gc, current):
        """ref parser.rs:1072-1101"""
        byte = current[0]
        if byte < 33:
            gc.skip_whitespace()
            return
        attr = self.attribute
        if byte not in ATTRIBUTE_NAME_END:
            attr_end = False
            r = gc.take_until_one_found(ATTRIBUTE_VALUE_END, False)
            if r is not None:
                span, found = r
                byte = span[-1]
                attr_end = found
            attr.value.h1 = gc.cursor
            # reference quirk: no chunk_offset here (parser.rs:1087)
            attr.value.b1 = gc.cursor
            attr.value.end = (gc.line, gc.character)

            if not attr_end and current[0] != byte:
                return

        self._process_attribute(gc)
        if byte == 0x2F:
            self.state = S_OPEN_TAG_SLASH
        elif byte == 0x3E:
            self._process_open_tag(False, gc)
        else:
            self.state = S_ATTRIB

    def _process_attribute(self, gc):
        """ref parser.rs:1103-1115"""
        attr = self.attribute
        self.attribute = Attribute()
        attr.b1 = self.chunk_offset + gc.cursor
        events = self.events
        if events & (1 << EVT_ATTRIBUTE) and attr.hydrate(self.buf):
            self.handler(EVT_ATTRIBUTE, attr.clone())
        if events & ((1 << EVT_OPEN_TAG) | (1 << EVT_CLOSE_TAG)):
            self.tag.attributes.append(attr)

    def _process_open_tag(self, self_closing: bool, gc):
        """ref parser.rs:1117-1142"""
        tag = self.tag
        self.tag = Tag((0, 0))
        tag.self_closing = self_closing
        tag.open_end = (gc.line, gc.character)
        tag.b1 = self.chunk_offset + gc.cursor

        events = self.events
        if events & (1 << EVT_OPEN_TAG):
            tag.hydrate(self.buf)
            self.handler(EVT_OPEN_TAG, tag.clone())

        if events & (1 << EVT_CLOSE_TAG) and self_closing:
            tag.hydrate(self.buf)
            self.handler(EVT_CLOSE_TAG, tag.clone())

        if not self_closing:
            self.tags.append(tag)

        self.state = S_BEGIN_WHITESPACE

    def _process_close_tag(self, gc):
        """ref parser.rs:1144-1194 — stack search + multi-unwind; orphan
        close tags become text."""
        self.state = S_BEGIN_WHITESPACE
        close_tag = self.close_tag
        self.close_tag = TextNode((0, 0))
        buf = self.buf
        close_name = close_tag.get_value_slice(buf, gc.n)

        tags = self.tags
        found = False
        tag_index = 0
        for i in range(len(tags) - 1, -1, -1):
            tag = tags[i]
            if tag.get_name_slice(buf) == close_name:
                tag.close_start = self.tag.close_start
                tag.close_end = (gc.line, gc.character)
                tag.b1 = self.chunk_offset + gc.cursor
                found = True
                tag_index = i
                break

        if not found:
            # </orphan> becomes a Text event (ref parser.rs:1164-1179)
            if self.text is None:
                self.text = TextNode((0, 0))
            text = self.text
            text.value = b"</" + bytes(close_name) + b">"
            text.start = self.tag.close_start
            text.h0 = 0
            text.h1 = 0
            self._flush_text(gc.line, gc.character, 0)
            self.state = S_BEGIN_WHITESPACE
            return

        if not (self.events & (1 << EVT_CLOSE_TAG)):
            keep = tag_index if tag_index > 1 else 1
            del tags[keep:]
            return

        while len(tags) > tag_index:
            tag = tags.pop()
            tag.hydrate(buf)
            self.handler(EVT_CLOSE_TAG, tag)

    def _jsx_attribute_expression(self, gc, current):
        """ref parser.rs:1196-1211 — balanced-brace JSX value."""
        b0 = current[0]
        if b0 == 0x7D:  # '}'
            self.brace_ct -= 1
        elif b0 == 0x7B:  # '{'
            self.brace_ct += 1

        if self.brace_ct == 0:
            attr = self.attribute
            ch = gc.character
            attr.value.end = (gc.line, ch - 1 if ch >= 1 else 0)
            attr.value.h1 = gc.last_cursor_pos
            self._process_attribute(gc)
            self.state = S_ATTRIB_VALUE_CLOSED
            return
        gc.take_until_one_found(b"{}", False)

    def _new_text(self, line, character, offset):
        """ref parser.rs:1213-1222"""
        if self.text is None and self.events & ((1 << EVT_TEXT) | (1 << EVT_CLOSE_TAG)):
            text = TextNode((line, character))
            text.h0 = offset
            text.h1 = offset
            text.b0 = self.chunk_offset + offset
            self.text = text
        self.state = S_TEXT


def _ascii_eq(expected: bytes, test: bytes) -> bool:
    """ref utils.rs:23-28"""
    if len(expected) != len(test):
        return False
    return expected.lower() == test.lower()


_HANDLERS = [None] * 24
_HANDLERS[S_BEGIN] = SaxParser._begin
_HANDLERS[S_BEGIN_WHITESPACE] = SaxParser._begin_white_space
_HANDLERS[S_TEXT] = SaxParser._text
_HANDLERS[S_LT] = SaxParser._less_than
_HANDLERS[S_MARKUP_DECL] = SaxParser._markup_decl
_HANDLERS[S_ENTITY] = SaxParser._entity
_HANDLERS[S_DOCTYPE] = SaxParser._doctype
_HANDLERS[S_DOCTYPE_ENTITY] = SaxParser._doctype
_HANDLERS[S_COMMENT] = SaxParser._comment
_HANDLERS[S_CDATA] = SaxParser._cdata
_HANDLERS[S_PROC_INST] = SaxParser._proc_inst
_HANDLERS[S_PROC_INST_VALUE] = SaxParser._proc_inst_value
_HANDLERS[S_OPEN_TAG] = SaxParser._open_tag
_HANDLERS[S_OPEN_TAG_SLASH] = SaxParser._open_tag_slash
_HANDLERS[S_ATTRIB] = SaxParser._attribute
_HANDLERS[S_ATTRIB_NAME] = SaxParser._attribute_name
_HANDLERS[S_ATTRIB_NAME_SAW_WHITE] = SaxParser._attribute_name_saw_white
_HANDLERS[S_ATTRIB_VALUE] = SaxParser._attribute_value
_HANDLERS[S_ATTRIB_VALUE_QUOTED] = SaxParser._attribute_value_quoted
_HANDLERS[S_ATTRIB_VALUE_CLOSED] = SaxParser._attribute_value_closed
_HANDLERS[S_ATTRIB_VALUE_UNQUOTED] = SaxParser._attribute_value_unquoted
_HANDLERS[S_CLOSE_TAG] = SaxParser._close_tag_handler
_HANDLERS[S_JSX_ATTRIBUTE_EXPRESSION] = SaxParser._jsx_attribute_expression
_HANDLERS[S_SKIP_WHITESPACE] = SaxParser._skip_whitespace
