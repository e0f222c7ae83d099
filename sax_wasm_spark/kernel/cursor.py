"""UTF-8 grapheme cursor with line / UTF-16-column / byte tracking.

Re-expresses the semantics of the reference cursor
(/root/reference/src/sax/grapheme_iterator.rs) in Python, replacing its
SIMD/per-byte loops with bulk primitives (``bytes.find``, compiled
byte-class regex, ``bytes.translate`` character counting) that are fast
in CPython while producing *identical* observable state:

- ``cursor``/``last_cursor_pos`` byte offsets,
- ``line``/``last_line`` (0-based, incremented on ``\\n``),
- ``character``/``last_character`` — UTF-16 code-unit columns: 1-3-byte
  graphemes count 1, 4-byte graphemes count 2
  (ref grapheme_iterator.rs:410-416).

Positional/edge quirks of the reference are reproduced deliberately:

- scans step grapheme-by-grapheme, so an ASCII target byte hidden inside
  an (invalid) multi-byte sequence is *not* a match — the dirty-buffer
  fallback path walks the same grapheme chain as the reference;
- a broken trailing sequence is never consumed (ref
  grapheme_iterator.rs:202-204, 402-404) but exhausting scans still
  advance the ``character`` counter over it once before backing the
  cursor up (ref :164-204 — only ``cursor`` is corrected, not
  ``character``);
- ``skip_whitespace`` skips *bytes* ``<= 32`` counting one column per
  byte (ref :346-360 scalar loop; the SIMD prefix at :289-344 is an
  optimization with the same net effect).
"""

from __future__ import annotations

import re

# grapheme length from lead byte (ref utils.rs:113-125); invalid lead -> 1
GRAPHEME_LEN = [1] * 256
for _b in range(0xC0, 0xE0):
    GRAPHEME_LEN[_b] = 2
for _b in range(0xE0, 0xF0):
    GRAPHEME_LEN[_b] = 3
for _b in range(0xF0, 0xF8):
    GRAPHEME_LEN[_b] = 4

_CONT_BYTES = bytes(range(0x80, 0xC0))
_FOUR_LEADS = bytes(range(0xF0, 0xF8))
_NON_WS_RE = re.compile(rb"[^\x00-\x20]")

_CLASS_CACHE: dict[bytes, re.Pattern] = {}


def _class_re(targets: bytes) -> re.Pattern:
    pat = _CLASS_CACHE.get(targets)
    if pat is None:
        pat = re.compile(b"[" + re.escape(targets) + b"]")
        _CLASS_CACHE[targets] = pat
    return pat


def _char_count(span: bytes) -> int:
    """UTF-16 column width of a valid-UTF-8 span (4-byte graphemes = 2)."""
    if span.isascii():
        return len(span)
    non_cont = len(span.translate(None, _CONT_BYTES))
    four = len(span) - len(span.translate(None, _FOUR_LEADS))
    return non_cont + four


class GraphemeCursor:
    """Stateful cursor over one write-buffer (fragment + chunk)."""

    __slots__ = (
        "buf",
        "n",
        "cursor",
        "last_cursor_pos",
        "line",
        "last_line",
        "character",
        "last_character",
        "clean",
        "tail_start",
    )

    def __init__(self, buf: bytes):
        self.buf = buf
        self.n = len(buf)
        self.cursor = 0
        self.last_cursor_pos = 0
        self.line = 0
        self.last_line = 0
        self.character = 0
        self.last_character = 0
        # Buffer classification: "clean" == valid UTF-8 except possibly a
        # truncated trailing sequence (the broken-surrogate fragment case,
        # ref parser.rs:235-243). Clean buffers admit byte-level bulk
        # scans; dirty buffers fall back to the grapheme-chain walk.
        n = self.n
        if buf.isascii():
            self.clean = True
            self.tail_start = n
        else:
            try:
                buf.decode("utf-8")
                self.clean = True
                self.tail_start = n
            except UnicodeDecodeError as e:
                if e.start + GRAPHEME_LEN[buf[e.start]] > n:
                    self.clean = True
                    self.tail_start = e.start
                else:
                    self.clean = False
                    self.tail_start = n  # unused in dirty mode

    # -- iteration ---------------------------------------------------------

    def next(self):
        """One grapheme; None at end or on a broken trailing sequence
        (ref grapheme_iterator.rs:384-425)."""
        cursor = self.cursor
        if self.n <= cursor:
            return None
        buf = self.buf
        b0 = buf[cursor]
        ln = GRAPHEME_LEN[b0]
        end = cursor + ln
        if end > self.n:
            return None
        if b0 == 0x0A:
            self.last_line = self.line
            self.line += 1
            self.last_character = self.character
            self.character = 0
        else:
            self.last_line = self.line
            self.last_character = self.character
            self.character += 2 if ln == 4 else 1
        self.last_cursor_pos = cursor
        self.cursor = end
        return buf[cursor:end]

    # -- position advance helpers -----------------------------------------

    def _advance_over(self, span: bytes):
        """Advance line/character over a consumed span (clean path)."""
        nl = span.count(b"\n")
        if nl:
            self.line += nl
            tail = span[span.rfind(b"\n") + 1 :]
            self.character = _char_count(tail)
        else:
            self.character += _char_count(span)

    def _phantom_tail_count(self):
        """Reference exhausting scans count the broken trailing grapheme's
        column width even though the cursor is backed up over it
        (grapheme_iterator.rs:164-204: only `cursor -= len`)."""
        ts = self.tail_start
        if ts < self.n:
            ln = GRAPHEME_LEN[self.buf[ts]]
            self.character += 2 if ln == 4 else 1
            return ln
        return 0

    def _last_grapheme_len(self, end: int) -> int:
        """Length of the final grapheme ending at `end` (clean buffers)."""
        buf = self.buf
        i = end - 1
        stop = max(end - 4, 0)
        while i > stop and 0x80 <= buf[i] < 0xC0:
            i -= 1
        return end - i

    # -- bulk scans --------------------------------------------------------

    def take_until(self, target: int, include: bool):
        """Scan to a single ASCII byte (ref grapheme_iterator.rs:221-279).

        Returns (span, found) or None when already at the end. `include`
        consumes the match too. On exhaustion returns what was scanned.
        """
        if self.cursor == self.n:
            return None
        if not self.clean:
            return self._walk_scan(bytes([target]), include, exhaust_include=include)

        buf = self.buf
        start = self.cursor
        pos = buf.find(target, start)
        if pos >= 0 and pos >= self.tail_start:
            pos = -1  # inside the broken trailing sequence: never consumed

        prev_line, prev_char = self.line, self.character
        if pos >= 0:
            self._advance_over(buf[start:pos])
            cursor = pos
            ln = GRAPHEME_LEN[buf[pos]]
            if include:  # cursor < n always holds here
                if target == 0x0A:
                    self.line += 1
                    self.character = 0
                else:
                    self.character += 1
                ln = 1
                cursor += 1
            found = True
        else:
            ts = self.tail_start
            self._advance_over(buf[start:ts])
            cursor = ts
            ln = self._phantom_tail_count()
            if ln == 0:
                ln = self._last_grapheme_len(ts) if ts > start else 0
            found = False

        self.cursor = cursor
        self.last_cursor_pos = cursor - ln if cursor >= ln else 0
        self.last_line = prev_line
        self.last_character = prev_char
        return (buf[start:cursor], found)

    def take_until_one_found(self, targets: bytes, include: bool):
        """Scan to any of several ASCII bytes
        (ref grapheme_iterator.rs:144-219). The byte *preceding* the
        cursor is checked first and short-circuits without moving."""
        if self.cursor == self.n:
            return None
        buf = self.buf
        idx = self.cursor - 1 if self.cursor else 0
        if buf[idx] in targets:
            return (buf[idx : idx + 1], True)

        if not self.clean:
            return self._walk_scan(targets, include, exhaust_include=False, none_if_empty=True)

        start = self.cursor
        m = _class_re(targets).search(buf, start)
        pos = m.start() if m else -1
        if pos >= 0 and pos >= self.tail_start:
            pos = -1

        prev_line, prev_char = self.line, self.character

        if pos >= 0:
            if pos == start and not include:
                return None  # zero-length take (ref :207-209), no commit
            # local advance (committed below)
            nl_line, nl_char = self.line, self.character
            span = buf[start:pos]
            nl = span.count(b"\n")
            if nl:
                nl_line += nl
                nl_char = _char_count(span[span.rfind(b"\n") + 1 :])
            else:
                nl_char += _char_count(span)
            cursor = pos
            matched = buf[pos]
            ln = GRAPHEME_LEN[matched]
            if include:
                if matched == 0x0A:
                    nl_line += 1
                    nl_char = 0
                else:
                    nl_char += 1
                ln = 1
                cursor += 1
            self.line, self.character = nl_line, nl_char
            found = True
        else:
            ts = self.tail_start
            if start == ts:
                # nothing consumable (only a broken tail): ref returns None
                # before committing any state (:207-209)
                return None
            self._advance_over(buf[start:ts])
            cursor = ts
            ln = self._phantom_tail_count()
            if ln == 0:
                ln = self._last_grapheme_len(ts)
            found = False

        self.cursor = cursor
        self.last_cursor_pos = cursor - ln if cursor >= ln else 0
        self.last_line = prev_line
        self.last_character = prev_char
        return (buf[start:cursor], found)

    def skip_whitespace(self) -> bool:
        """Skip bytes <= 32; one column per byte, '\\n' resets
        (ref grapheme_iterator.rs:281-367). Returns True when a
        non-whitespace byte stopped the scan."""
        buf = self.buf
        start = self.cursor
        m = _NON_WS_RE.search(buf, start)
        pos = m.start() if m else self.n
        span = buf[start:pos]
        prev_line, prev_char = self.line, self.character
        nl = span.count(b"\n")
        if nl:
            self.line += nl
            self.character = len(span) - span.rfind(b"\n") - 1
        else:
            self.character += len(span)
        self.cursor = pos
        self.last_cursor_pos = pos - 1 if pos else 0
        self.last_line = prev_line
        self.last_character = prev_char
        return pos < self.n

    def get_remaining_bytes(self):
        if self.cursor == self.n:
            return None
        return self.buf[self.cursor :]

    # -- dirty-buffer fallback: faithful grapheme-chain walk ---------------

    def _walk_scan(self, targets: bytes, include: bool, exhaust_include: bool, none_if_empty: bool = False):
        """Literal port of the reference scan loops for buffers with
        invalid UTF-8 (grapheme_iterator.rs:144-219 / :221-279)."""
        buf = self.buf
        n = self.n
        start = self.cursor
        cursor = start
        line = self.line
        character = self.character
        found = False
        matched = 0
        ln = 0
        while cursor < n:
            b = buf[cursor]
            ln = GRAPHEME_LEN[b]
            if b in targets:
                found = True
                matched = b
                break
            if b == 0x0A:
                line += 1
                character = 0
            else:
                character += 2 if ln == 4 else 1
            cursor += ln
        if found and include and cursor < n:
            if matched == 0x0A:
                line += 1
                character = 0
            else:
                character += 1
            ln = 1
            cursor += 1
        if cursor > n:
            cursor -= ln
        if none_if_empty and start == cursor:
            return None
        self.cursor = cursor
        self.last_cursor_pos = cursor - ln if cursor >= ln else 0
        self.last_line, self.line = self.line, line
        self.last_character, self.character = self.character, character
        return (buf[start:cursor], found)
