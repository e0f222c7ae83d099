"""Pin the XML name predicates against the reference semantics
(names.rs:31-60 is_name_start_char, :89-121 is_name_char).

The load-bearing asymmetry: ':' IS a NameStartChar but is NOT a
NameChar in the reference's ASCII fast path (names.rs:96-99) — the
round-1 table wrongly inherited ':' into _ASCII_NAME.
"""

from sax_wasm_spark.kernel.names import is_name_char, is_name_start_char


def _ref_is_name_start_char(c: int) -> bool:
    # names.rs:39-60 transcribed as data (ranges), not code
    if c <= 0x7F:
        return (
            0x61 <= c <= 0x7A or 0x41 <= c <= 0x5A or c == 0x3A or c == 0x5F
        )
    return any(
        lo <= c <= hi
        for lo, hi in (
            (0xC0, 0xD6), (0xD8, 0xF6), (0xF8, 0x02FF), (0x0370, 0x037D),
            (0x037F, 0x1FFF), (0x200C, 0x200D), (0x2070, 0x218F),
            (0x2C00, 0x2FEF), (0x3001, 0xD7FF), (0xF900, 0xFDCF),
            (0xFDF0, 0xFFFD), (0x10000, 0xEFFFF),
        )
    )


def _ref_is_name_char(c: int) -> bool:
    # names.rs:89-121: NO ':' in the ASCII path; adds 0-9, '-', '.',
    # 0xB7, 0x0300-0x036F, 0x203F-0x2040 over the start-char ranges
    if c <= 0x7F:
        return (
            0x61 <= c <= 0x7A
            or 0x41 <= c <= 0x5A
            or 0x30 <= c <= 0x39
            or c in (0x2D, 0x2E, 0x5F)
        )
    if c == 0xB7 or 0x0300 <= c <= 0x036F or 0x203F <= c <= 0x2040:
        return True
    return _ref_is_name_start_char(c) if c > 0x7F else False


def _enc(c: int) -> bytes:
    return chr(c).encode("utf-8")


def test_ascii_paths_match_reference():
    for c in range(1, 0x80):
        g = bytes([c])
        assert is_name_start_char(g) == _ref_is_name_start_char(c), hex(c)
        assert is_name_char(g) == _ref_is_name_char(c), hex(c)


def test_colon_asymmetry():
    assert is_name_start_char(b":")
    assert not is_name_char(b":")


def test_unicode_ranges_match_reference():
    # probe every range boundary ±1 plus interior points
    probes = set()
    for lo, hi in (
        (0xB7, 0xB7), (0xC0, 0xD6), (0xD8, 0xF6), (0xF8, 0x02FF),
        (0x0300, 0x036F), (0x0370, 0x037D), (0x037F, 0x1FFF),
        (0x200C, 0x200D), (0x203F, 0x2040), (0x2070, 0x218F),
        (0x2C00, 0x2FEF), (0x3001, 0xD7FF), (0xF900, 0xFDCF),
        (0xFDF0, 0xFFFD), (0x10000, 0xEFFFF),
    ):
        probes.update((lo - 1, lo, (lo + hi) // 2, hi, hi + 1))
    for c in sorted(probes):
        if c < 0x80 or 0xD800 <= c <= 0xDFFF or c > 0x10FFFF:
            continue
        g = _enc(c)
        assert is_name_start_char(g) == _ref_is_name_start_char(c), hex(c)
        assert is_name_char(g) == _ref_is_name_char(c), hex(c)
