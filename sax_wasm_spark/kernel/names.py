"""XML name predicates.

Semantics mirror the reference predicates at
/root/reference/src/sax/names.rs:31-60 (is_name_start_char) and
:89-121 (is_name_char): an ASCII fast path plus the XML 1.0
NameStartChar / NameChar Unicode ranges over the decoded codepoint of a
single UTF-8 grapheme.
"""

from __future__ import annotations

# ASCII lookup tables (index = byte value 0..127)
_ASCII_NAME_START = bytearray(128)
for _b in range(0x61, 0x7B):  # a-z
    _ASCII_NAME_START[_b] = 1
for _b in range(0x41, 0x5B):  # A-Z
    _ASCII_NAME_START[_b] = 1
_ASCII_NAME_START[0x3A] = 1  # ':'
_ASCII_NAME_START[0x5F] = 1  # '_'

# NB: unlike NameStartChar, the reference's NameChar ASCII path
# (names.rs:96-99) does NOT include ':' — build the table from scratch
# rather than copying _ASCII_NAME_START (which has ':' set).
_ASCII_NAME = bytearray(128)
for _b in range(0x61, 0x7B):  # a-z
    _ASCII_NAME[_b] = 1
for _b in range(0x41, 0x5B):  # A-Z
    _ASCII_NAME[_b] = 1
for _b in range(0x30, 0x3A):  # 0-9
    _ASCII_NAME[_b] = 1
_ASCII_NAME[0x2D] = 1  # '-'
_ASCII_NAME[0x2E] = 1  # '.'
_ASCII_NAME[0x5F] = 1  # '_'

_NAME_START_RANGES = (
    (0xC0, 0xD6),
    (0xD8, 0xF6),
    (0xF8, 0x02FF),
    (0x0370, 0x037D),
    (0x037F, 0x1FFF),
    (0x200C, 0x200D),
    (0x2070, 0x218F),
    (0x2C00, 0x2FEF),
    (0x3001, 0xD7FF),
    (0xF900, 0xFDCF),
    (0xFDF0, 0xFFFD),
    (0x10000, 0xEFFFF),
)

_NAME_EXTRA_RANGES = (
    (0xB7, 0xB7),
    (0x0300, 0x036F),
    (0x203F, 0x2040),
)


def to_char_code(grapheme: bytes) -> int:
    """UTF-8 bytes of one grapheme -> codepoint (ref utils.rs:52-72)."""
    n = len(grapheme)
    if n == 1:
        return grapheme[0]
    if n == 2:
        return ((grapheme[0] & 0x1F) << 6) | (grapheme[1] & 0x3F)
    if n == 3:
        return ((grapheme[0] & 0x0F) << 12) | ((grapheme[1] & 0x3F) << 6) | (grapheme[2] & 0x3F)
    if n == 4:
        return (
            ((grapheme[0] & 0x07) << 18)
            | ((grapheme[1] & 0x3F) << 12)
            | ((grapheme[2] & 0x3F) << 6)
            | (grapheme[3] & 0x3F)
        )
    return 0


def is_name_start_char(grapheme: bytes) -> bool:
    if not grapheme:
        return False
    b0 = grapheme[0]
    if b0 <= 0x7F:
        return bool(_ASCII_NAME_START[b0])
    c = to_char_code(grapheme)
    for lo, hi in _NAME_START_RANGES:
        if lo <= c <= hi:
            return True
    return False


def is_name_char(grapheme: bytes) -> bool:
    if not grapheme:
        return False
    b0 = grapheme[0]
    if b0 <= 0x7F:
        return bool(_ASCII_NAME[b0])
    c = to_char_code(grapheme)
    for lo, hi in _NAME_START_RANGES:
        if lo <= c <= hi:
            return True
    for lo, hi in _NAME_EXTRA_RANGES:
        if lo <= c <= hi:
            return True
    return False
