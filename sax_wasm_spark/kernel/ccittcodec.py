"""CCITT Group 4 (ITU-T T.6 / MMR) fax codec — from-scratch encode +
decode of the 2-D Modified Modified READ coding PDF's /CCITTFaxDecode
filter uses with ``/K < 0`` (ISO 32000-1 §7.4.6): the dominant wire
format of SCANNED documents on the crawl. Completes the PDF image tier
beyond DCT — bilevel scans decode losslessly, so deterministic corpora
oracle bit-exactly (q82).

Coding model (T.6 §2, run-length tables from T.4 §4.2): every row is
coded against the previous (reference) row's changing elements —
Vertical mode (offset -3..+3 from b1), Horizontal mode (two T.4
modified-Huffman run lengths), and Pass mode; the reference line for
the first row is an imaginary all-white row; the block ends with EOFB
(two EOLs). Bits are MSB-first. ``1`` = black ("ink") throughout this
module; PDF's /BlackIs1 inversion is the caller's wire concern
(kernel/pdftext.py applies it).

Design constraints, same policy as the other codecs:

- **Per-row CPU work, zero shuffle** — runs inside mapInArrow batches.
- **Hostile-input budget**: dimensions are validated against
  ``max_pixels`` BEFORE allocation; malformed/truncated bitstreams and
  run overruns raise typed ``CcittError`` so poison payloads degrade
  to ``status='error:*'`` rows.
- **Exactness**: MMR is lossless — decode(encode(x)) == x, pinned by
  wire-vector and property tests (tests/test_ccitt.py).

The reference repo has no image surface (sax-wasm is an XML tokenizer,
``/root/reference/src/sax/parser.rs:1``); this tier belongs to the
assignment's multimodal/training-data scope.
"""

from __future__ import annotations

from bisect import bisect_right

import numpy as np


class CcittError(ValueError):
    """Typed failure for malformed/unsupported CCITT payloads."""


# ---------------------------------------------------------------------------
# ITU-T T.4 §4.2 modified-Huffman run-length code tables ("code" strings
# are MSB-first bit patterns). Terminating codes 0..63, makeup codes in
# 64-pixel steps to 1728, extended makeup (T.4 §4.2.1.3, shared by both
# colours) to 2560.

_WHITE_TERM = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011", 14: "110100",
    15: "110101", 16: "101010", 17: "101011", 18: "0100111",
    19: "0001100", 20: "0001000", 21: "0010111", 22: "0000011",
    23: "0000100", 24: "0101000", 25: "0101011", 26: "0010011",
    27: "0100100", 28: "0011000", 29: "00000010", 30: "00000011",
    31: "00011010", 32: "00011011", 33: "00010010", 34: "00010011",
    35: "00010100", 36: "00010101", 37: "00010110", 38: "00010111",
    39: "00101000", 40: "00101001", 41: "00101010", 42: "00101011",
    43: "00101100", 44: "00101101", 45: "00000100", 46: "00000101",
    47: "00001010", 48: "00001011", 49: "01010010", 50: "01010011",
    51: "01010100", 52: "01010101", 53: "00100100", 54: "00100101",
    55: "01011000", 56: "01011001", 57: "01011010", 58: "01011011",
    59: "01001010", 60: "01001011", 61: "00110010", 62: "00110011",
    63: "00110100",
}
_WHITE_MAKEUP = {
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100",
    768: "011001101", 832: "011010010", 896: "011010011",
    960: "011010100", 1024: "011010101", 1088: "011010110",
    1152: "011010111", 1216: "011011000", 1280: "011011001",
    1344: "011011010", 1408: "011011011", 1472: "010011000",
    1536: "010011001", 1600: "010011010", 1664: "011000",
    1728: "010011011",
}
_BLACK_TERM = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011", 5: "0011",
    6: "0010", 7: "00011", 8: "000101", 9: "000100", 10: "0000100",
    11: "0000101", 12: "0000111", 13: "00000100", 14: "00000111",
    15: "000011000", 16: "0000010111", 17: "0000011000",
    18: "0000001000", 19: "00001100111", 20: "00001101000",
    21: "00001101100", 22: "00000110111", 23: "00000101000",
    24: "00000010111", 25: "00000011000", 26: "000011001010",
    27: "000011001011", 28: "000011001100", 29: "000011001101",
    30: "000001101000", 31: "000001101001", 32: "000001101010",
    33: "000001101011", 34: "000011010010", 35: "000011010011",
    36: "000011010100", 37: "000011010101", 38: "000011010110",
    39: "000011010111", 40: "000001101100", 41: "000001101101",
    42: "000011011010", 43: "000011011011", 44: "000001010100",
    45: "000001010101", 46: "000001010110", 47: "000001010111",
    48: "000001100100", 49: "000001100101", 50: "000001010010",
    51: "000001010011", 52: "000000100100", 53: "000000110111",
    54: "000000111000", 55: "000000100111", 56: "000000101000",
    57: "000001011000", 58: "000001011001", 59: "000000101011",
    60: "000000101100", 61: "000001011010", 62: "000001100110",
    63: "000001100111",
}
_BLACK_MAKEUP = {
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}
_EXT_MAKEUP = {  # shared by both colours
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

# decode maps: bitstring -> (run, is_terminating)
_WHITE_DEC = {v: (k, k < 64) for k, v in _WHITE_TERM.items()}
_WHITE_DEC.update({v: (k, False) for k, v in _WHITE_MAKEUP.items()})
_WHITE_DEC.update({v: (k, False) for k, v in _EXT_MAKEUP.items()})
_BLACK_DEC = {v: (k, k < 64) for k, v in _BLACK_TERM.items()}
_BLACK_DEC.update({v: (k, False) for k, v in _BLACK_MAKEUP.items()})
_BLACK_DEC.update({v: (k, False) for k, v in _EXT_MAKEUP.items()})
_MAX_CODE_LEN = 13
_EOL = "000000000001"


# r8 decode fast path: prefix-free run codes resolve from an 8-bit
# window table (codes ≤ 8 bits — the common case) with an int-keyed
# dict for the 9-13-bit tail; the mode coder resolves from a 7-bit
# window table. The bit-at-a-time paths remain for the segment tail so
# exhaustion/bad-code raises stay byte-for-byte identical.
def _build_run_luts(dec: dict):
    lut8 = [None] * 256
    by_len: dict[tuple[int, int], tuple[int, bool]] = {}
    for code, rv in dec.items():
        ln = len(code)
        v = int(code, 2)
        by_len[(ln, v)] = rv
        if ln <= 8:
            base = v << (8 - ln)
            for x in range(1 << (8 - ln)):
                lut8[base | x] = (rv[0], rv[1], ln)
    return lut8, by_len


_WHITE_LUT8, _WHITE_BYLEN = _build_run_luts(_WHITE_DEC)
_BLACK_LUT8, _BLACK_BYLEN = _build_run_luts(_BLACK_DEC)


def _mode_entry(v: int):
    b = format(v, "07b")
    if b[0] == "1":
        return ("v", 0, 1)
    if b[1] == "1":
        return ("v", 1 if b[2] == "1" else -1, 3)
    if b[2] == "1":
        return ("h", 0, 3)
    if b[3] == "1":
        return ("p", 0, 4)
    if b[4] == "1":
        return ("v", 2 if b[5] == "1" else -2, 6)
    if b[5] == "1":
        return ("v", 3 if b[6] == "1" else -3, 7)
    return ("eol", 0, 6)


_MODE7 = [_mode_entry(v) for v in range(128)]
_EOL2_INT = int(_EOL + _EOL, 2)
# T.6 vertical-mode codes keyed by a1 - b1 (hoisted: this literal used
# to be rebuilt on every coding-loop iteration)
_VERTICAL_CODES = {
    0: "1",
    1: "011", 2: "000011", 3: "0000011",
    -1: "010", -2: "000010", -3: "0000010",
}


class _BitWriter:
    def __init__(self) -> None:
        self.bits: list[str] = []
        self._n = 0  # running bit count: align() stays O(1) per row

    def write(self, pattern: str) -> None:
        self.bits.append(pattern)
        self._n += len(pattern)

    def align(self) -> None:
        if self._n % 8:
            self.write("0" * (8 - self._n % 8))

    def tobytes(self) -> bytes:
        s = "".join(self.bits)
        s += "0" * (-len(s) % 8)
        return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit index
        self.n = 8 * len(data)

    def read1(self) -> int:
        if self.pos >= self.n:
            raise CcittError("bitstream exhausted")
        byte = self.data[self.pos >> 3]
        bit = (byte >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return bit

    def peek_is(self, pattern: str) -> bool:
        if self.pos + len(pattern) > self.n:
            return False
        for i, ch in enumerate(pattern):
            p = self.pos + i
            if ((self.data[p >> 3] >> (7 - (p & 7))) & 1) != (ch == "1"):
                return False
        return True

    def skip(self, n: int) -> None:
        self.pos += n

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def peek_bits(self, k: int) -> tuple[int, int]:
        """Up to ``k`` bits MSB-first WITHOUT consuming → (value, got).
        ``got`` < k at the segment tail (r8 fast-path support; callers
        fall back to the bit-at-a-time path when short, so exhaustion
        raises stay byte-for-byte identical)."""
        pos = self.pos
        avail = self.n - pos
        if avail <= 0:
            return 0, 0
        got = k if avail >= k else avail
        byte_i = pos >> 3
        end = (pos + got + 7) >> 3
        chunk = int.from_bytes(self.data[byte_i:end], "big")
        width = (end - byte_i) << 3
        return (chunk >> (width - (pos & 7) - got)) & ((1 << got) - 1), got


def _changes(row) -> list[int]:
    """Positions where the colour differs from the previous pixel (an
    imaginary white pixel precedes the row) — even indices are
    white→black transitions. ``row`` is any 0/1 int sequence; short
    rows walk plain Python ints (numpy per-row overhead dominates tiny
    scans — optimization r8), long rows go through numpy."""
    if len(row) < 256:
        if isinstance(row, np.ndarray):
            row = row.tolist()
        out = []
        prev = 0
        for x, v in enumerate(row):
            if v != prev:
                out.append(x)
                prev = v
        return out
    arr = np.asarray(row, dtype=np.uint8)
    d = np.flatnonzero(arr[1:] != arr[:-1])
    out = (d + 1).tolist()
    if arr[0]:
        out.insert(0, 0)
    return out


def _find_b1(ref_changes: list[int], a0: int, color: int, width: int) -> int:
    """First changing element on the reference line strictly right of
    ``a0`` whose transition is to the OPPOSITE of ``color`` (even index
    = white→black)."""
    i = bisect_right(ref_changes, a0)
    if i % 2 != color:
        i += 1
    return ref_changes[i] if i < len(ref_changes) else width


def _emit_runs(w: _BitWriter, run: int, color: int) -> None:
    term = _BLACK_TERM if color else _WHITE_TERM
    makeup = _BLACK_MAKEUP if color else _WHITE_MAKEUP
    while run >= 2624:  # 2560 + 63: emit the largest extended makeup
        w.write(_EXT_MAKEUP[2560])
        run -= 2560
    if run >= 1792:
        step = (run - 1792) // 64 * 64 + 1792
        step = min(step, 2560)
        w.write(_EXT_MAKEUP[step])
        run -= step
    elif run >= 64:
        step = run // 64 * 64
        w.write(makeup[step])
        run -= step
    w.write(term[run])


def encode_g4(
    bits: np.ndarray, encoded_byte_align: bool = False
) -> bytes:
    """Encode an (h, w) 0/1 array (1 = black ink) as a T.6 MMR block
    terminated by EOFB."""
    img = np.asarray(bits)
    if img.ndim != 2 or img.size == 0:
        raise CcittError("bits must be a non-empty (h, w) array")
    img = (img != 0).astype(np.uint8)
    h, width = img.shape
    w = _BitWriter()
    ref_changes: list[int] = []  # imaginary all-white reference row
    for y in range(h):
        row = img[y]
        cur_changes = _changes(row)
        a0, color = -1, 0
        while a0 < width:
            i = bisect_right(cur_changes, a0)
            a1 = cur_changes[i] if i < len(cur_changes) else width
            a2 = cur_changes[i + 1] if i + 1 < len(cur_changes) else width
            b1 = _find_b1(ref_changes, a0, color, width)
            j = bisect_right(ref_changes, b1)
            b2 = ref_changes[j] if j < len(ref_changes) else width
            if b2 < a1:
                w.write("0001")  # pass
                a0 = b2
            elif abs(a1 - b1) <= 3:
                w.write(_VERTICAL_CODES[a1 - b1])
                a0, color = a1, color ^ 1
            else:
                w.write("001")  # horizontal
                start = a0 if a0 > 0 else 0
                _emit_runs(w, a1 - start, color)
                _emit_runs(w, a2 - a1, color ^ 1)
                a0 = a2
        ref_changes = cur_changes
        if encoded_byte_align:
            w.align()
    w.write(_EOL + _EOL)  # EOFB
    return w.tobytes()


def _read_run(r: _BitReader, color: int) -> int:
    """T.4 modified-Huffman run (makeup chain + terminating code).
    r8: 8-bit-window LUT for the short codes, int-keyed dict for the
    9-13-bit tail, length-scan fallback at the segment tail — same
    decode set and same raises as the bit-at-a-time loop."""
    lut8, by_len = (_BLACK_LUT8, _BLACK_BYLEN) if color else (_WHITE_LUT8, _WHITE_BYLEN)
    total = 0
    while True:
        val, got = r.peek_bits(8)
        hit = lut8[val] if got == 8 else None
        if hit is None:
            if got == 8:
                val13, got13 = r.peek_bits(_MAX_CODE_LEN)
                for ln in range(9, got13 + 1):
                    h = by_len.get((ln, val13 >> (got13 - ln)))
                    if h is not None:
                        hit = (h[0], h[1], ln)
                        break
                if hit is None:
                    if got13 == _MAX_CODE_LEN:
                        raise CcittError(
                            f"bad {'black' if color else 'white'} run code"
                        )
                    # tail shorter than a full long code and nothing
                    # resolved — identical to the old loop running out
                    raise CcittError("bitstream exhausted")
            else:
                # segment tail: try every length the remaining bits allow
                for ln in range(1, got + 1):
                    h = by_len.get((ln, val >> (got - ln)))
                    if h is not None:
                        hit = (h[0], h[1], ln)
                        break
                if hit is None:
                    raise CcittError("bitstream exhausted")
        r.pos += hit[2]
        total += hit[0]
        if hit[1]:  # terminating code
            return total
        # makeup code: a terminating code must follow


def decode_g4(
    data: bytes,
    columns: int,
    rows: int | None = None,
    encoded_byte_align: bool = False,
    max_pixels: int = 1 << 24,
) -> np.ndarray:
    """Decode a T.6 MMR block → (h, columns) uint8 array, 1 = black.
    Stops at EOFB, after ``rows`` rows, or when the bitstream ends on a
    row boundary; typed ``CcittError`` for malformed codes, run
    overruns, or hostile dimensions."""
    if columns <= 0 or columns > 1 << 20:
        raise CcittError(f"bad column count {columns}")
    if rows is not None and rows * columns > max_pixels:
        raise CcittError(f"{columns}x{rows} exceeds max_pixels={max_pixels}")
    r = _BitReader(data)
    out: list[np.ndarray] = []
    ref_changes: list[int] = []
    while rows is None or len(out) < rows:
        v24, g24 = r.peek_bits(24)
        if (g24 == 24 and v24 == _EOL2_INT) or r.pos >= r.n:
            break  # EOFB (same test as peek_is(_EOL*2): short tail = no)
        if (len(out) + 1) * columns > max_pixels:
            raise CcittError(f"image exceeds max_pixels={max_pixels}")
        row = bytearray(columns)  # r8: C-level slice fills + cheap _changes
        a0, color = -1, 0
        while a0 < columns:
            b1 = _find_b1(ref_changes, a0, color, columns)
            j = bisect_right(ref_changes, b1)
            b2 = ref_changes[j] if j < len(ref_changes) else columns
            # mode decode (prefix-free): 1, 011, 010, 001, 0001,
            # 000011, 000010, 0000011, 0000010, 000000000001 (EOL).
            # r8: one 7-bit window lookup resolves every mode; the
            # bit-at-a-time tree remains for the <7-bit segment tail so
            # exhaustion raises land on the same bit.
            val, got = r.peek_bits(7)
            if got == 7:
                kind, delta, ln = _MODE7[val]
                r.pos += ln
                if kind == "v":
                    a1 = b1 + delta
                elif kind == "h":
                    start = a0 if a0 > 0 else 0
                    r1 = _read_run(r, color)
                    r2 = _read_run(r, color ^ 1)
                    if start + r1 + r2 > columns:
                        raise CcittError("horizontal runs overrun row")
                    if color:  # black run, then white run
                        row[start : start + r1] = b"\x01" * r1
                    else:  # white run, then black run
                        row[start + r1 : start + r1 + r2] = b"\x01" * r2
                    a0 = start + r1 + r2
                    continue
                elif kind == "p":
                    if color:
                        lo = max(a0, 0)
                        row[lo:b2] = b"\x01" * (b2 - lo)
                    a0 = b2
                    continue
                else:
                    # 0000000…: EOL / EOFB territory
                    raise CcittError("unexpected EOL inside row")
            elif r.read1():
                a1 = b1  # V0
            else:
                if r.read1():
                    a1 = b1 + 1 if r.read1() else b1 - 1  # VR1 / VL1
                else:
                    if r.read1():  # 001: horizontal
                        start = a0 if a0 > 0 else 0
                        r1 = _read_run(r, color)
                        r2 = _read_run(r, color ^ 1)
                        if start + r1 + r2 > columns:
                            raise CcittError("horizontal runs overrun row")
                        if color:  # black run, then white run
                            row[start : start + r1] = b"\x01" * r1
                        else:  # white run, then black run
                            row[start + r1 : start + r1 + r2] = b"\x01" * r2
                        a0 = start + r1 + r2
                        continue
                    if r.read1():  # 0001: pass
                        if color:
                            lo = max(a0, 0)
                            row[lo:b2] = b"\x01" * (b2 - lo)
                        a0 = b2
                        continue
                    if r.read1():
                        a1 = b1 + 2 if r.read1() else b1 - 2  # VR2 / VL2
                    else:
                        if r.read1():
                            a1 = b1 + 3 if r.read1() else b1 - 3  # VR3/VL3
                        else:
                            # 0000000…: EOL / EOFB territory
                            raise CcittError("unexpected EOL inside row")
            if a1 < 0 or a1 > columns:
                raise CcittError("vertical mode outside row")
            if color:
                lo = max(a0, 0)
                row[lo:a1] = b"\x01" * (a1 - lo)
            a0, color = a1, color ^ 1
        out.append(row)
        ref_changes = _changes(row)
        if encoded_byte_align:
            r.align()
        if rows is None and r.pos >= r.n:
            break
    if not out:
        raise CcittError("no rows decoded")
    return np.frombuffer(bytes(b"".join(out)), dtype=np.uint8).reshape(len(out), columns)
