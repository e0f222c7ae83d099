"""From-scratch PDF text + layout extractor (pure Python, stdlib only).

The north rule names "PDF/layout parse" as part of the main-content
extraction pipeline alongside the HTML boilerplate strip. This module is
that stage, built from the public PDF 1.7 spec (ISO 32000-1) — it is NOT
derived from the reference repo (sax-wasm is XML/HTML-only) and NOT a
wrapper over a PDF library (none is installed; zlib/base64/binascii are
stdlib).

Scope (documented contract, enforced by tests/test_pdf.py):

* **Object layer**: full COS syntax — literal strings (all escapes incl.
  octal and line continuations), hex strings, names with ``#xx`` escapes,
  numbers, booleans, null, arrays, dictionaries, indirect references,
  streams. Objects are discovered by scanning for ``N G obj`` rather than
  trusting the xref table, so documents with broken/absent xref still
  parse; PDF 1.5 object streams (``/Type /ObjStm`` — where modern
  writers keep the catalog/page dicts) are expanded after the scan;
  incremental updates (the same object number redefined later in the
  file, directly or via a later object stream) resolve to the LAST
  definition, matching xref-chain semantics for append-only updates.
* **Filters**: FlateDecode (zlib), LZWDecode (from-scratch variable-width
  codec per ISO 32000-1 §7.4.4, /EarlyChange honored, PNG predictors),
  ASCIIHexDecode, ASCII85Decode, and filter chains thereof. DCT/CCITT/JBIG2
  raise :class:`UnsupportedFilter` (the DataFrame operator maps that to a
  per-row error status — a poison document never kills the task).
* **Page tree**: Catalog → /Pages → /Kids walk (cycle-guarded); when the
  trailer/catalog is missing or broken, falls back to every
  ``/Type /Page`` object in file order. /Contents may be one stream or
  an array of streams (concatenated with a newline, per spec).
* **Text operators**: BT/ET, Tf, Td, TD, TL, T*, Tm, Tj, TJ, ', ".
  Graphics operators are skipped; inline images (BI..ID..EI) are skipped
  bodily. ``Do`` of a /Form XObject recurses into the form's own content
  stream (its own /Resources, or — deprecated §7.8.3 but common — the
  invoking context's when absent; depth-capped, cycle-guarded); ``Do``
  of an /Image is a text no-op, but :func:`pdf_image_stats` inventories
  image metadata (dims/filter/colorspace) without decoding samples.
  When the current font (tracked via ``Tf`` against the page's
  /Resources /Font dict) carries a /ToUnicode CMap, show-strings decode
  through it (codespacerange-derived code width, bfchar + bfrange incl.
  the array form — the CID-font path real crawled PDFs use constantly);
  simple fonts without /ToUnicode decode through their /Encoding — an
  Annex D base-encoding name (WinAnsi/MacRoman/Standard) and/or a
  /Differences array over the /BaseEncoding; otherwise strings decode
  as UTF-16 when BOM-tagged, else Latin-1 (a documented approximation
  of PDFDocEncoding for the printable range).
* **Encryption** (ISO 32000 §7.6, standard security handler, EMPTY
  user password — the "owner-locked" shape real crawls are full of):
  all three wire formats decrypt transparently before object streams
  expand. /V 1-2 RC4 (Algorithm 2 md5 file key from /O + /P + /ID,
  /U-verified, per-object §7.6.2 keys); /V 4 crypt filters (/AESV2
  AES-128-CBC or /V2 RC4 per /StdCF, /StmF//StrF Identity honored,
  /EncryptMetadata folded into the key); /V 5 AES-256 (Algorithm 2.B
  Hash-2B password digests, /UE file-key unwrap; the AES core is the
  from-scratch FIPS-197 implementation in :mod:`aescipher`). Shapes
  beyond that raise :class:`EncryptedAes`; a rejected empty password
  raises :class:`PasswordProtected` — both map to per-row error
  statuses in the DataFrame operator.
* **Layout**: the text matrix is tracked as a position (e, f translation
  of Tm; Td/TD/T* line moves). Each show op appends to the run at the
  current line origin; runs are grouped into lines by y (±``Y_TOL``),
  lines ordered top-to-bottom (descending y, PDF user space points up),
  runs within a line ordered by x — so a two-column page whose content
  stream writes the right column first still reads in visual order.
  Within a TJ array, a kerning adjustment ≤ ``-SPACE_KERN`` renders as a
  single space (the standard heuristic for inter-word gaps encoded as
  negative moves).

``extract_pdf_text(data)`` → text (pages joined by "\\n").
``extract_pdf_runs(data)`` → [(page, y, x, text)] for span consumers.
"""

from __future__ import annotations

import base64
import binascii
import functools
import hashlib
import os
import re
import struct
import zlib
from typing import NamedTuple

from .jpegmeta import jpeg_sof

__all__ = [
    "PdfError",
    "UnsupportedFilter",
    "EncryptedAes",
    "PasswordProtected",
    "PdfDocument",
    "extract_pdf_text",
    "extract_pdf_runs",
]

SPACE_KERN = 180  # TJ adjustment (thousandths of an em) rendered as a space
Y_TOL = 1.5  # runs within this many points of a line's y belong to it


class PdfError(ValueError):
    """Document is not parseable as PDF within this module's scope."""


class UnsupportedFilter(PdfError):
    """Stream uses a filter outside {Flate, LZW, AHx, A85}."""


class EncryptedAes(PdfError):
    """Encrypted with a format outside the implemented tiers (an
    unknown crypt-filter method, or /V beyond 5)."""


class PasswordProtected(PdfError):
    """Standard security handler present but the empty user password
    does not validate against /U — a real password is required."""


class Ref(NamedTuple):
    num: int
    gen: int


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"
_REGULAR_STOP = _WS + _DELIM

_RE_OBJ = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_RE_TRAILER = re.compile(rb"trailer\b")
# r8: the digit-led _RE_OBJ pattern has no literal prefix, so finditer
# attempts a match at every digit byte of every (compressed, digit-rich)
# stream body — measured 0.8 ms/KB, half of _scan_objects. The header
# scan instead finds the LITERAL b"obj" (fast skip-search) and
# reconstructs the same match set by walking \s+ \d+ \s+ \d+ backward;
# greedy-maximal backward runs coincide with the forward regex's
# leftmost-longest matches, and matches can never overlap (each ends at
# its own 'obj'). Differentially tested vs _RE_OBJ on the corpus and
# byte fuzz (tests/test_pdf.py::test_obj_header_scan_equivalence).
_WS_SET = frozenset(b" \t\n\r\x0b\x0c")  # regex \s over bytes


def _iter_obj_headers(data: bytes):
    """Yield (start, end, num_bytes, gen_bytes) for every
    ``(\\d+)\\s+(\\d+)\\s+obj\\b`` match, in order — same spans and
    groups as ``_RE_OBJ.finditer(data)``."""
    ws = _WS_SET
    n = len(data)
    pos = 0
    find = data.find
    while True:
        o = find(b"obj", pos)
        if o < 0:
            return
        pos = o + 3
        # \b after obj
        if pos < n:
            c = data[pos]
            if 0x30 <= c <= 0x39 or 0x41 <= c <= 0x5A or 0x61 <= c <= 0x7A or c == 0x5F:
                continue
        # backward: \s+
        i = o
        while i > 0 and data[i - 1] in ws:
            i -= 1
        if i == o:
            continue
        # \d+ (generation)
        g1 = i
        while i > 0 and 0x30 <= data[i - 1] <= 0x39:
            i -= 1
        if i == g1:
            continue
        g0 = i
        # \s+
        while i > 0 and data[i - 1] in ws:
            i -= 1
        if i == g0:
            continue
        # \d+ (object number)
        n1 = i
        while i > 0 and 0x30 <= data[i - 1] <= 0x39:
            i -= 1
        if i == n1:
            continue
        yield i, pos, data[i:n1], data[g0:g1]
_RE_NUM = re.compile(rb"[+-]?(\d+\.?\d*|\.\d+)")

# Master-regex lexer (optimization r8): one C-level match replaces the
# per-byte skip_ws/_regular_run walk. Alternatives mirror next_token's
# dispatch exactly; the number alternative carries a stop-set lookahead
# so a run like ``3d`` or ``3.4.5`` still tokenizes as a keyword, same
# as `_RE_NUM.fullmatch` on the full regular run.
_RE_SKIP = re.compile(rb"(?:[\x00\t\n\x0c\r ]+|%[^\n]*)*")
_RE_MAIN = re.compile(
    rb"/([^\x00\t\n\x0c\r ()<>\[\]{}/%]*)"  # 1: /Name body
    rb"|(<<)"  # 2
    rb"|(>>)"  # 3
    rb"|(\[)"  # 4
    rb"|(\])"  # 5
    rb"|([+-]?(?:\d+\.?\d*|\.\d+))(?=[\x00\t\n\x0c\r ()<>\[\]{}/%]|\Z)"  # 6: number
    rb"|([^\x00\t\n\x0c\r ()<>\[\]{}/%]+)"  # 7: keyword / regular run
)
# ``N G R`` indirect-reference tail after an integer token: ws/comments,
# a second non-negative integer, ws/comments, then a standalone ``R``
# (followed by a stop char). The separator between the integer and R is
# mandatory: ``0R`` is a single regular run, not a number + keyword.
_RE_REF_TAIL = re.compile(
    rb"(?:[\x00\t\n\x0c\r ]+|%[^\n]*)*"
    rb"(\d+)"
    rb"(?:[\x00\t\n\x0c\r ]|%[^\n]*)+"
    rb"R(?=[\x00\t\n\x0c\r ()<>\[\]{}/%]|\Z)"
)
_RE_NAME_HEX = re.compile(rb"#([0-9A-Fa-f]{2})")
_RE_LIT_SPECIAL = re.compile(rb"[\\()]")


# ---------------------------------------------------------------------------
# lexer (shared by the object layer and the content-stream interpreter)


class _Lexer:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def skip_ws(self) -> None:
        d, n = self.data, len(self.data)
        p = self.pos
        while p < n:
            c = d[p]
            if c in _WS:
                p += 1
            elif c == 0x25:  # % comment to EOL
                e = d.find(b"\n", p)
                p = n if e < 0 else e + 1
            else:
                break
        self.pos = p

    def _regular_run(self) -> bytes:
        d, n = self.data, len(self.data)
        p = self.pos
        q = p
        while q < n and d[q] not in _REGULAR_STOP:
            q += 1
        self.pos = q
        return d[p:q]

    def next_token(self):
        """-> (kind, value) | None at EOF.

        kinds: 'num' float|int, 'name' str, 'str' bytes, 'kw' bytes,
        'arr_open','arr_close','dict_open','dict_close' (value None).

        Dispatches through one master regex (_RE_MAIN) so the common
        tokens lex in a single C-level match; only strings, stray
        delimiters and EOF fall back to byte dispatch. Token-for-token
        identical to the per-byte walk it replaced."""
        d = self.data
        n = len(d)
        while True:
            p = _RE_SKIP.match(d, self.pos).end()
            if p >= n:
                self.pos = p
                return None
            m = _RE_MAIN.match(d, p)
            if m is not None:
                self.pos = m.end()
                g = m.lastindex
                if g == 7:
                    return ("kw", m.group(7))
                if g == 6:
                    v = m.group(6)
                    return ("num", float(v) if b"." in v else int(v))
                if g == 1:
                    raw = m.group(1)
                    if b"#" in raw:
                        raw = _RE_NAME_HEX.sub(
                            lambda mm: bytes([int(mm.group(1), 16)]), raw
                        )
                    return ("name", raw.decode("latin-1"))
                if g == 2:
                    return ("dict_open", None)
                if g == 3:
                    return ("dict_close", None)
                if g == 4:
                    return ("arr_open", None)
                return ("arr_close", None)
            c = d[p]
            if c == 0x28:  # ( literal string
                self.pos = p
                return ("str", self._literal_string())
            if c == 0x3C:  # < hex string (<< is handled by the master)
                self.pos = p
                return ("str", self._hex_string())
            # stray '>', '{', '}' or other lone delimiter — step over
            self.pos = p + 1

    def _literal_string(self) -> bytes:
        d, n = self.data, len(self.data)
        p = self.pos + 1  # past '('
        out = bytearray()
        depth = 1
        find_special = _RE_LIT_SPECIAL.search
        while p < n:
            # bulk-copy up to the next backslash/paren (C-level scan)
            m = find_special(d, p)
            if m is None:
                out += d[p:n]
                p = n
                break
            q = m.start()
            if q > p:
                out += d[p:q]
                p = q
            c = d[p]
            if c == 0x5C:  # backslash
                p += 1
                if p >= n:
                    break
                e = d[p]
                if e in b"nrtbf":
                    out += {0x6E: b"\n", 0x72: b"\r", 0x74: b"\t", 0x62: b"\b", 0x66: b"\f"}[e]
                    p += 1
                elif e in b"()\\":
                    out.append(e)
                    p += 1
                elif 0x30 <= e <= 0x37:  # octal, 1-3 digits
                    oct_digits = bytearray([e])
                    p += 1
                    while p < n and len(oct_digits) < 3 and 0x30 <= d[p] <= 0x37:
                        oct_digits.append(d[p])
                        p += 1
                    out.append(int(oct_digits, 8) & 0xFF)
                elif e == 0x0A:  # line continuation
                    p += 1
                elif e == 0x0D:
                    p += 1
                    if p < n and d[p] == 0x0A:
                        p += 1
                else:  # spec: backslash before other chars is dropped
                    out.append(e)
                    p += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                p += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    p += 1
                    break
                out.append(c)
                p += 1
            else:
                out.append(c)
                p += 1
        self.pos = p
        return bytes(out)

    def _hex_string(self) -> bytes:
        d = self.data
        e = d.find(b">", self.pos + 1)
        if e < 0:
            raise PdfError("unterminated hex string")
        body = re.sub(rb"\s+", b"", d[self.pos + 1 : e])
        self.pos = e + 1
        if len(body) % 2:
            body += b"0"
        try:
            return binascii.unhexlify(body)
        except binascii.Error as exc:
            raise PdfError(f"bad hex string: {exc}") from exc


# ---------------------------------------------------------------------------
# object-layer value parser (with indirect-reference lookahead)


def _parse_value(lex: _Lexer, tok=None):
    if tok is None:
        tok = lex.next_token()
    if tok is None:
        raise PdfError("unexpected EOF in object")
    kind, val = tok
    if kind in ("str",):
        return val
    if kind == "name":
        return "/" + val
    if kind == "num":
        # lookahead for `G R` making this an indirect reference — one
        # anchored regex instead of two token reads + rewind (r8)
        if isinstance(val, int) and val >= 0:
            m = _RE_REF_TAIL.match(lex.data, lex.pos)
            if m is not None:
                lex.pos = m.end()
                return Ref(val, int(m.group(1)))
        return val
    if kind == "arr_open":
        out = []
        while True:
            t = lex.next_token()
            if t is None:
                raise PdfError("unterminated array")
            if t[0] == "arr_close":
                return out
            out.append(_parse_value(lex, t))
    if kind == "dict_open":
        d = {}
        while True:
            t = lex.next_token()
            if t is None:
                raise PdfError("unterminated dict")
            if t[0] == "dict_close":
                return d
            if t[0] != "name":
                # tolerate junk keys by skipping one value
                _parse_value(lex, t)
                continue
            d["/" + t[1]] = _parse_value(lex)
        return d
    if kind == "kw":
        if val == b"true":
            return True
        if val == b"false":
            return False
        if val == b"null":
            return None
        raise PdfError(f"unexpected keyword {val!r} in object")
    raise PdfError(f"unexpected token {kind}")


# ---------------------------------------------------------------------------
# filters


def _lzw_decode(data: bytes, early: int = 1, max_out: int | None = None) -> bytes:
    """LZWDecode per ISO 32000-1 §7.4.4: MSB-first bit packing, variable
    code width 9→12 bits, 256 = ClearTable, 257 = EOD, /EarlyChange
    (default 1) widens the code one entry before the table fills. The
    inverse encoder lives in sources/pdfgen.py (``lzw_encode``); the pair
    is round-trip-property-tested and checked against the spec's own
    worked example (tests/test_pdf.py). ``max_out`` bounds hostile
    expansion: output past it raises DURING decode, not after — the
    TIFF strip path passes its known expected size."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    bitbuf = 0
    bitcnt = 0
    for byte in data:
        bitbuf = (bitbuf << 8) | byte
        bitcnt += 8
        while bitcnt >= width:
            code = (bitbuf >> (bitcnt - width)) & ((1 << width) - 1)
            bitcnt -= width
            if code == 256:
                del table[258:]
                width = 9
                prev = None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    raise PdfError("bad LZW start code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                if len(table) < 4096:
                    table.append(prev + entry[:1])
            elif code == len(table) and code < 4096:
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise PdfError("bad LZW code")
            out += entry
            if max_out is not None and len(out) > max_out:
                raise PdfError(f"LZW output exceeds max_out={max_out}")
            prev = entry
            if len(table) + early >= (1 << width) and width < 12:
                width += 1
    return bytes(out)  # tolerate missing EOD (real files sometimes omit it)


def _apply_filters(raw: bytes, filters, parms) -> bytes:
    if filters is None:
        return raw
    if not isinstance(filters, list):
        filters = [filters]
    if not isinstance(parms, list):
        parms = [parms] * len(filters)
    if len(parms) < len(filters):
        # a malformed shorter /DecodeParms list must not silently truncate
        # the filter chain (ADVICE r3) — pad so every declared filter is
        # applied or raises
        parms = list(parms) + [None] * (len(filters) - len(parms))
    data = raw
    for f, pm in zip(filters, parms):
        if f == "/FlateDecode" or f == "/Fl":
            try:
                data = zlib.decompress(data)
            except zlib.error as exc:
                raise PdfError(f"flate: {exc}") from exc
            if isinstance(pm, dict) and pm.get("/Predictor", 1) != 1:
                data = _png_unpredict(data, pm)
        elif f == "/LZWDecode" or f == "/LZW":
            early = 1
            if isinstance(pm, dict):
                e = pm.get("/EarlyChange", 1)
                if isinstance(e, (int, float)):
                    early = int(e)
            data = _lzw_decode(data, early)
            if isinstance(pm, dict) and pm.get("/Predictor", 1) != 1:
                data = _png_unpredict(data, pm)
        elif f == "/ASCIIHexDecode" or f == "/AHx":
            body = re.sub(rb"\s+", b"", data)
            body = body.split(b">", 1)[0]
            if len(body) % 2:
                body += b"0"
            data = binascii.unhexlify(body)
        elif f == "/ASCII85Decode" or f == "/A85":
            body = data.split(b"~>", 1)[0]
            data = base64.a85decode(re.sub(rb"\s+", b"", body), adobe=False)
        else:
            raise UnsupportedFilter(str(f))
    return data


def _png_unpredict(data: bytes, parms: dict) -> bytes:
    pred = parms.get("/Predictor", 1)
    if pred < 10:
        return data  # TIFF predictor 2 unsupported; 1 = none
    colors = parms.get("/Colors", 1)
    bpc = parms.get("/BitsPerComponent", 8)
    columns = parms.get("/Columns", 1)
    bpp = max(1, colors * bpc // 8)
    row_len = (columns * colors * bpc + 7) // 8
    out = bytearray()
    prev = bytes(row_len)
    i = 0
    while i + 1 + row_len <= len(data) + row_len and i < len(data):
        ft = data[i]
        row = bytearray(data[i + 1 : i + 1 + row_len])
        i += 1 + row_len
        for j in range(len(row)):
            left = row[j - bpp] if j >= bpp else 0
            up = prev[j]
            ul = prev[j - bpp] if j >= bpp else 0
            if ft == 1:
                row[j] = (row[j] + left) & 0xFF
            elif ft == 2:
                row[j] = (row[j] + up) & 0xFF
            elif ft == 3:
                row[j] = (row[j] + ((left + up) >> 1)) & 0xFF
            elif ft == 4:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pr = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
                row[j] = (row[j] + pr) & 0xFF
        out += row
        prev = bytes(row)
    return bytes(out)


# ---------------------------------------------------------------------------
# encryption (ISO 32000 §7.6 standard security handler: RC4 + AES tiers)

# §7.6.3.3 Algorithm 2 step a: the 32-byte password pad
_PWD_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def _rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (symmetric — also used to decrypt). ~40-bit/
    128-bit keys per §7.6.2. Runs natively when the environment allows,
    pure-Python otherwise (kernel/fastcrypto.py)."""
    from .fastcrypto import rc4  # noqa: PLC0415

    return rc4(key, data)


def _std_file_key(
    password: bytes, o: bytes, p: int, id0: bytes, n: int, r: int,
    extra: bytes = b"",
) -> bytes:
    """§7.6.3.3 Algorithm 2: the file encryption key from a user
    password (empty for owner-locked documents), /O, /P (as a SIGNED
    32-bit little-endian), and the first document /ID element.
    ``extra`` carries step f's 0xFFFFFFFF suffix when /V 4 declares
    /EncryptMetadata false."""
    padded = (password + _PWD_PAD)[:32]
    h = hashlib.md5(
        padded + o[:32] + (p & 0xFFFFFFFF).to_bytes(4, "little") + id0 + extra
    ).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:n]).digest()
    return h[:n]


def _user_password_matches(key: bytes, u: bytes, id0: bytes, r: int) -> bool:
    """§7.6.3.4 Algorithms 4 (R2) / 5 (R3): recompute /U from the file
    key and compare. R3 compares only the first 16 bytes (the stored
    tail is arbitrary padding, per spec)."""
    if r == 2:
        return _rc4(key, _PWD_PAD) == u[:32]
    h = hashlib.md5(_PWD_PAD + id0).digest()
    x = _rc4(key, h)
    for i in range(1, 20):
        x = _rc4(bytes(b ^ i for b in key), x)
    return x == u[:16]


def _object_key(file_key: bytes, num: int, gen: int, salt: bytes = b"") -> bytes:
    """§7.6.2 Algorithm 1: per-object key — md5(file key + 3 low-order
    bytes of the object number + 2 of the generation [+ b"sAlT" for
    AESV2 crypt filters]), truncated to min(n + 5, 16)."""
    h = hashlib.md5(
        file_key
        + (num & 0xFFFFFF).to_bytes(3, "little")
        + (gen & 0xFFFF).to_bytes(2, "little")
        + salt
    ).digest()
    return h[: min(len(file_key) + 5, 16)]


def _decrypt_value(v, fn):
    """Recursively decrypt every string inside a parsed object through
    ``fn(bytes) -> bytes`` (names/numbers/refs pass through)."""
    if isinstance(v, bytes):
        return fn(v)
    if isinstance(v, dict):
        return {k: _decrypt_value(x, fn) for k, x in v.items()}
    if isinstance(v, list):
        return [_decrypt_value(x, fn) for x in v]
    return v


def _aes_object_decrypt(okey: bytes, data: bytes) -> bytes:
    """§7.6.2 AES payload layout: a 16-byte IV prepended to the
    CBC ciphertext, PKCS#7-padded. An empty string encrypts to at
    least IV + one padding block; anything shorter is malformed."""
    from .fastcrypto import aes_cbc_decrypt  # noqa: PLC0415

    if len(data) < 32:
        # lenient: some writers emit empty strings UNencrypted
        if not data:
            return b""
        raise PdfError("AES payload shorter than IV + one block")
    return aes_cbc_decrypt(okey, data[:16], data[16:])


def _hash_2b(password: bytes, salt: bytes, udata: bytes, r: int) -> bytes:
    """ISO 32000-2 §7.6.4.3.4 Algorithm 2.B (the R6 password hash;
    R5 is plain sha256). The hardening loop encrypts with
    AES-128-CBC-NoPadding keyed from the running digest."""
    k = hashlib.sha256(password + salt + udata).digest()
    if r == 5:
        return k
    from .fastcrypto import aes_cbc_encrypt  # noqa: PLC0415

    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = aes_cbc_encrypt(k[:16], k[16:32], k1, pad=False)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


# ---------------------------------------------------------------------------
# document


class PdfDocument:
    def __init__(self, data: bytes):
        if not data.lstrip()[:5].startswith(b"%PDF-"):
            raise PdfError("missing %PDF- header")
        self.data = data
        self.objects: dict[int, object] = {}
        self.streams: dict[int, bytes] = {}
        self._order: list[int] = []
        self._obj_pos: dict[int, list[int]] | None = None
        self._def_pos: dict[int, int] = {}
        self._gen: dict[int, int] = {}
        self._font_cmap_cache: dict[int, "_CMap | None"] = {}
        self._xobj_cache: dict[int, tuple] = {}
        self._scan_objects()
        # decryption must precede object-stream expansion: an /ObjStm
        # container is encrypted as a whole, its members' strings are
        # already clear once the container stream decrypts
        self._decrypt_if_needed()
        self._expand_object_streams()
        if not self.objects:
            raise PdfError("no indirect objects found")

    # -- object layer

    def _scan_objects(self) -> None:
        data = self.data
        skip_until = 0  # matches inside a sliced stream body are not objects
        for m_start, m_end, num_b, gen_b in _iter_obj_headers(data):
            if m_start < skip_until:
                continue
            num = int(num_b)
            lex = _Lexer(data, m_end)
            try:
                val = _parse_value(lex)
            except PdfError:
                continue
            raw = None
            save = lex.pos
            t = lex.next_token()
            if t == ("kw", b"stream"):
                p = lex.pos
                if data[p : p + 2] == b"\r\n":
                    p += 2
                elif data[p : p + 1] in (b"\n", b"\r"):
                    p += 1
                raw = self._slice_stream(val, p)
                skip_until = p + len(raw)
            else:
                lex.pos = save
            if num not in self.objects:
                self._order.append(num)
            # last definition wins (incremental updates append re-definitions)
            self.objects[num] = val
            self._def_pos[num] = m_start
            self._gen[num] = int(gen_b)
            if raw is not None:
                self.streams[num] = raw
            elif num in self.streams:
                del self.streams[num]

    def _trailer_dicts(self) -> list[dict]:
        """Every parseable trailer dict in file order, plus xref-stream
        dicts (PDF 1.5 files carry /Encrypt, /ID and /Root there)."""
        out: list[dict] = []
        for m in _RE_TRAILER.finditer(self.data):
            try:
                t = _parse_value(_Lexer(self.data, m.end()))
            except PdfError:
                continue
            if isinstance(t, dict):
                out.append(t)
        for num in self._order:
            v = self.objects[num]
            if isinstance(v, dict) and v.get("/Type") == "/XRef":
                out.append(v)
        return out

    def info(self) -> dict[str, str]:
        """The document information dictionary (/Info, §14.3.3) with its
        values decoded as spec TEXT strings (_decode_text: BOM-tagged
        UTF-16 else PDFDocEncoding) — the one place PDFDocEncoding
        legitimately applies; show strings inside content streams decode
        via the font or the WinAnsi fallback instead (ADVICE r6)."""
        out: dict[str, str] = {}
        for t in self._trailer_dicts():
            info = self.resolve(t.get("/Info"))
            if not isinstance(info, dict):
                continue
            for k, v in info.items():
                v = self.resolve(v)
                if isinstance(v, bytes):
                    out[k.lstrip("/")] = _decode_text(v)
        return out

    def form_fields(self) -> list[tuple[str, str]]:
        """Interactive-form (AcroForm, §12.7) terminal fields as
        (fully-qualified name, value) pairs in tree order. Field names
        join ancestor /T partial names with '.' per §12.7.3.2; values
        decode as spec TEXT strings (/V string → _decode_text — the
        other legitimate PDFDocEncoding scope besides /Info), name
        values (checkbox/radio states like /Yes) surface without the
        slash, choice-array values join with '; '. Encrypted documents
        already hold decrypted strings here. Cycle-guarded and
        depth-capped — a malformed self-referencing /Kids tree
        truncates instead of recursing forever."""
        cat = self.catalog()
        out: list[tuple[str, str]] = []
        if cat is None:
            return out
        acro = self.resolve(cat.get("/AcroForm"))
        if not isinstance(acro, dict):
            return out
        seen: set[int] = set()

        def fmt_value(v) -> str | None:
            v = self.resolve(v)
            if isinstance(v, bytes):
                return _decode_text(v)
            if isinstance(v, str):
                return v.lstrip("/")
            if isinstance(v, list):
                parts = [fmt_value(x) for x in v]
                return "; ".join(p for p in parts if p is not None)
            return None

        def walk(ref, prefix: str, depth: int) -> None:
            if depth >= self._XOBJ_MAX_DEPTH:
                return
            if isinstance(ref, Ref):
                if ref.num in seen:
                    return
                seen.add(ref.num)
            node = self.resolve(ref)
            if not isinstance(node, dict):
                return
            t = self.resolve(node.get("/T"))
            name = prefix
            if isinstance(t, bytes):
                part = _decode_text(t)
                name = f"{prefix}.{part}" if prefix else part
            # kids carrying their own /T are sub-fields; kids without
            # one are merged widget annotations, so the value (and the
            # terminal field) is THIS node (§12.7.3.1)
            kids = self.resolve(node.get("/Kids"))
            named_kids = []
            if isinstance(kids, list):
                for k in kids:
                    kd = self.resolve(k)
                    if isinstance(kd, dict) and "/T" in kd:
                        named_kids.append(k)
            if named_kids:
                for k in named_kids:
                    walk(k, name, depth + 1)
                return
            if name and "/V" in node:
                val = fmt_value(node.get("/V"))
                if val is not None:
                    out.append((name, val))

        fields = self.resolve(acro.get("/Fields"))
        if isinstance(fields, list):
            for f in fields:
                walk(f, "", 0)
        return out

    def outline_titles(self) -> list[tuple[int, str]]:
        """Document outline (§12.3.3 bookmarks) as (depth, title) in
        reading order — depth 1 = top level. Titles decode as TEXT
        strings. The /First→/Next sibling chains are cycle-guarded and
        the descent depth-capped, so malformed outlines truncate."""
        cat = self.catalog()
        out: list[tuple[int, str]] = []
        if cat is None:
            return out
        root = self.resolve(cat.get("/Outlines"))
        if not isinstance(root, dict):
            return out
        seen: set[int] = set()
        steps = [0]

        def walk(ref, depth: int) -> None:
            while ref is not None and depth <= self._XOBJ_MAX_DEPTH:
                steps[0] += 1
                if steps[0] > 65536:  # direct-dict cycle backstop
                    return
                if isinstance(ref, Ref):
                    if ref.num in seen:
                        return
                    seen.add(ref.num)
                item = self.resolve(ref)
                if not isinstance(item, dict):
                    return
                title = self.resolve(item.get("/Title"))
                if isinstance(title, bytes):
                    out.append((depth, _decode_text(title)))
                first = item.get("/First")
                if first is not None:
                    walk(first, depth + 1)
                ref = item.get("/Next")

        walk(root.get("/First"), 1)
        return out

    def _decrypt_if_needed(self) -> None:
        """ISO 32000 §7.6 standard security handler, EMPTY user
        password, all three wire formats:

        * /V 1-2, /R 2-3 — RC4 with the Algorithm 2 md5 file key;
        * /V 4, /R 4 — crypt filters: /AESV2 (AES-128-CBC, per-object
          key salted with b"sAlT") or /V2 (RC4) per the /StdCF /CFM,
          honoring /StmF and /StrF (Identity = that class stays
          clear), /EncryptMetadata folded into the key derivation;
        * /V 5, /R 5-6 — AES-256: the empty password validates against
          /U's hash+salts via Algorithm 2.B (sha256/384/512 + AES-CBC
          hardening loop; plain sha256 for the deprecated R5), the
          file key unwraps from /UE, and every string/stream decrypts
          directly under it (no per-object derivation at V5).

        Unknown handlers/CFMs raise (EncryptedAes for AES-shaped ones
        we don't implement); a rejected empty password raises
        PasswordProtected. The /Encrypt dict's own strings and
        cross-reference streams are exempt per spec."""
        enc_ref, id0 = None, b""
        for t in self._trailer_dicts():
            if "/Encrypt" in t:
                enc_ref = t["/Encrypt"]
                ids = self.resolve(t.get("/ID"))
                if isinstance(ids, list) and ids and isinstance(ids[0], bytes):
                    id0 = ids[0]
        if enc_ref is None:
            return
        enc = self.resolve(enc_ref)
        if not isinstance(enc, dict):
            raise PdfError("unreadable /Encrypt dictionary")
        if self.resolve(enc.get("/Filter")) != "/Standard":
            raise PdfError(
                f"unsupported security handler {enc.get('/Filter')!r}"
            )
        v = int(self.resolve(enc.get("/V", 0)) or 0)
        r = int(self.resolve(enc.get("/R", 2)) or 2)
        dec_string, dec_stream = self._build_decryptors(enc, v, r, id0)
        enc_num = enc_ref.num if isinstance(enc_ref, Ref) else None
        for num in self._order:
            if num == enc_num:
                continue
            val = self.objects[num]
            # xref streams are written unencrypted (§7.5.8.2)
            if isinstance(val, dict) and val.get("/Type") == "/XRef":
                continue
            gen = self._gen.get(num, 0)
            if dec_string is not None:
                self.objects[num] = _decrypt_value(
                    val, lambda b, _n=num, _g=gen: dec_string(_n, _g, b)
                )
            if dec_stream is not None and num in self.streams:
                self.streams[num] = dec_stream(num, gen, self.streams[num])

    def _build_decryptors(self, enc: dict, v: int, r: int, id0: bytes):
        """(dec_string, dec_stream) for the declared format — each a
        ``fn(num, gen, data) -> bytes`` or None for Identity."""
        o = self.resolve(enc.get("/O"))
        u = self.resolve(enc.get("/U"))
        p = self.resolve(enc.get("/P"))
        if v in (1, 2) and r in (2, 3):
            if not isinstance(o, bytes) or not isinstance(u, bytes) or p is None:
                raise PdfError("malformed /Encrypt dictionary (O/U/P)")
            n = 5 if r == 2 else max(
                5, int(self.resolve(enc.get("/Length", 40))) // 8
            )
            key = _std_file_key(b"", o, int(p), id0, n, r)
            if not _user_password_matches(key, u, id0, r):
                raise PasswordProtected("empty user password rejected by /U")

            def rc4_fn(num, gen, b):
                return _rc4(_object_key(key, num, gen), b)

            return rc4_fn, rc4_fn
        if v == 4 and r == 4:
            return self._build_v4(enc, o, u, p, id0)
        if v == 5 and r in (5, 6):
            return self._build_v5(enc, o, u)
        if v >= 4 or r >= 4:
            raise EncryptedAes(f"/V {v} /R {r} not supported")
        raise PdfError(f"unsupported encryption /V {v} /R {r}")

    def _build_v4(self, enc: dict, o, u, p, id0: bytes):
        if not isinstance(o, bytes) or not isinstance(u, bytes) or p is None:
            raise PdfError("malformed /Encrypt dictionary (O/U/P)")
        cf = self.resolve(enc.get("/CF")) or {}
        # Key length at /V 4: the crypt filter's own /Length governs
        # (Table 25; the top-level /Length "applies only if V is 2 or
        # 3" — round-6 review). Writers disagree on units, so ≥ 40 is
        # read as bits, < 40 as bytes; fall back to the top-level
        # /Length (bits), then 128.
        def _key_bytes(v) -> int | None:
            if not isinstance(v, (int, float)):
                return None
            v = int(v)
            return v // 8 if v >= 40 else v

        n = None
        for fname in ("/StmF", "/StrF"):
            spec = self.resolve(cf.get(self.resolve(enc.get(fname))))
            if isinstance(spec, dict):
                n = _key_bytes(self.resolve(spec.get("/Length")))
                if n:
                    break
        if not n:
            n = _key_bytes(self.resolve(enc.get("/Length", 128))) or 16
        n = max(5, min(n, 16))
        meta = self.resolve(enc.get("/EncryptMetadata"))
        extra = b"\xff\xff\xff\xff" if meta is False else b""
        key = _std_file_key(b"", o, int(p), id0, n, 3, extra)
        if not _user_password_matches(key, u, id0, 3):
            raise PasswordProtected("empty user password rejected by /U")

        def make(filter_name):
            if filter_name in (None, "/Identity"):
                return None
            spec = self.resolve(cf.get(filter_name))
            cfm = self.resolve(spec.get("/CFM")) if isinstance(spec, dict) else None
            if cfm == "/V2":
                return lambda num, gen, b: _rc4(_object_key(key, num, gen), b)
            if cfm == "/AESV2":
                return lambda num, gen, b: _aes_object_decrypt(
                    _object_key(key, num, gen, salt=b"sAlT"), b
                )
            raise EncryptedAes(f"unsupported crypt filter method {cfm!r}")

        return (
            make(self.resolve(enc.get("/StrF", "/Identity"))),
            make(self.resolve(enc.get("/StmF", "/Identity"))),
        )

    def _build_v5(self, enc: dict, o, u):
        from .fastcrypto import aes_cbc_decrypt  # noqa: PLC0415

        # The R6 Hash-2B KDF is deliberately slow by spec (~0.3 s/call
        # of pure-Python AES hardening rounds), so a crawl shard dense
        # in AESV3 docs can straggle. The env knob lets an operator
        # trade that capability for throughput: docs degrade to an
        # error:EncryptedAes row instead of paying the KDF.
        if os.environ.get("SAX_WASM_SPARK_AESV3", "1") == "0":
            raise EncryptedAes(
                "AESV3 disabled by SAX_WASM_SPARK_AESV3=0 (Hash-2B KDF budget)"
            )
        r = int(self.resolve(enc.get("/R", 6)) or 6)
        ue = self.resolve(enc.get("/UE"))
        if not isinstance(u, bytes) or len(u) < 48 or not isinstance(ue, bytes):
            raise PdfError("malformed /Encrypt dictionary (U/UE)")
        vsalt, ksalt = u[32:40], u[40:48]
        vhash = _hash_2b(b"", vsalt, b"", r)
        if vhash != u[:32]:
            raise PasswordProtected("empty user password rejected by /U")
        # equal salts ⇒ identical KDF input ⇒ the verification digest IS
        # the intermediate key — skip the second ~0.3 s Hash-2B call
        # (our writer twin emits this shape; real files with distinct
        # salts still take the two-call path)
        ikey = vhash if ksalt == vsalt else _hash_2b(b"", ksalt, b"", r)
        file_key = aes_cbc_decrypt(ikey, bytes(16), ue[:32], unpad=False)

        def aes_fn(num, gen, b):  # V5: one key for every object
            return _aes_object_decrypt(file_key, b)

        cf = self.resolve(enc.get("/CF")) or {}

        def gate(filter_name):
            if filter_name in (None, "/Identity"):
                return None
            spec = self.resolve(cf.get(filter_name))
            cfm = self.resolve(spec.get("/CFM")) if isinstance(spec, dict) else None
            if cfm != "/AESV3":
                raise EncryptedAes(f"unsupported crypt filter method {cfm!r}")
            return aes_fn

        return (
            gate(self.resolve(enc.get("/StrF", "/Identity"))),
            gate(self.resolve(enc.get("/StmF", "/Identity"))),
        )

    def _expand_object_streams(self) -> None:
        """Register the members of every ``/Type /ObjStm`` stream (PDF 1.5
        object streams, ISO 32000-1 §7.5.7) — modern writers keep the
        catalog/page dicts INSIDE compressed object streams, so a scan
        that only sees top-level ``N G obj`` markers misses the entire
        document structure. Stream layout: ``/N`` pairs of
        ``objnum offset`` integers in the first ``/First`` bytes, then
        the serialized objects at ``First + offset``. Last-definition-
        wins ordering is preserved by position: a member only overrides
        a direct definition that appears EARLIER in the file than its
        containing stream (and vice versa), matching the incremental-
        update semantics of the direct scan. Malformed object streams
        are skipped (poison-tolerance, same policy as the rest of the
        scan)."""
        for num in list(self._order):
            d = self.objects.get(num)
            if not (
                isinstance(d, dict)
                and d.get("/Type") == "/ObjStm"
                and num in self.streams
            ):
                continue
            stm_pos = self._def_pos.get(num, 0)
            try:
                body = self.stream_bytes(num)
                n_objs = int(self.resolve(d.get("/N")))
                first = int(self.resolve(d.get("/First")))
            except (PdfError, TypeError, ValueError):
                continue
            lex = _Lexer(body[:first])
            pairs: list[tuple[int, int]] = []
            ok = True
            for _ in range(n_objs):
                t1 = lex.next_token()
                t2 = lex.next_token()
                if not (t1 and t2 and t1[0] == "num" and t2[0] == "num"):
                    ok = False
                    break
                pairs.append((int(t1[1]), int(t2[1])))
            if not ok:
                continue
            for onum, off in pairs:
                if first + off >= len(body):
                    continue
                try:
                    val = _parse_value(_Lexer(body, first + off))
                except PdfError:
                    continue
                prev_pos = self._def_pos.get(onum)
                if prev_pos is not None and prev_pos > stm_pos:
                    continue  # a later direct definition wins
                if onum not in self.objects:
                    self._order.append(onum)
                self.objects[onum] = val
                self._def_pos[onum] = stm_pos
                self.streams.pop(onum, None)

    def _slice_stream(self, d: object, start: int) -> bytes:
        data = self.data
        length = d.get("/Length") if isinstance(d, dict) else None
        candidates: list[object] = (
            self._length_candidates(length)
            if isinstance(length, Ref)
            else [length]
        )
        for cand in candidates:
            if isinstance(cand, (int, float)):
                end = start + int(cand)
                tail = data[end : end + 20].lstrip(b"\r\n \t")
                if tail.startswith(b"endstream"):
                    return data[start:end]
        e = data.find(b"endstream", start)
        if e < 0:
            raise PdfError("unterminated stream")
        return data[start:e].rstrip(b"\r\n")

    def _length_candidates(self, ref: Ref) -> list[object]:
        """Candidate values for an indirect /Length during the scan (the
        target object may appear later in the file, so parse directly).
        The raw ``N G obj`` scan CANNOT use the stream-body skip the main
        scan uses (the needed lengths are exactly what is being resolved),
        so bytes like ``7 0 obj`` INSIDE an uncompressed content stream
        can shadow the real definition (ADVICE r3). Instead of trusting
        one 'last-wins' offset, every match position is kept and the
        caller validates each candidate, newest first, against the
        ``endstream`` tail — a shadowed garbage length fails validation
        and the real one is used. Offsets are indexed once — without the
        cache every indirect /Length costs a full-file rescan (quadratic
        in stream count)."""
        if self._obj_pos is None:
            self._obj_pos = {}
            for _s, end, num_b, _g in _iter_obj_headers(self.data):
                self._obj_pos.setdefault(int(num_b), []).append(end)
        out = []
        for end in reversed(self._obj_pos.get(ref.num, ())):
            try:
                out.append(_parse_value(_Lexer(self.data, end)))
            except PdfError:
                continue
        return out

    def resolve(self, v, _depth: int = 0):
        while isinstance(v, Ref):
            if _depth > 32:
                raise PdfError("reference cycle")
            v = self.objects.get(v.num)
            _depth += 1
        return v

    def stream_bytes(self, ref_or_num) -> bytes:
        num = ref_or_num.num if isinstance(ref_or_num, Ref) else ref_or_num
        d = self.objects.get(num)
        raw = self.streams.get(num)
        if raw is None or not isinstance(d, dict):
            raise PdfError(f"object {num} is not a stream")
        return _apply_filters(
            raw, self.resolve(d.get("/Filter")), self.resolve(d.get("/DecodeParms"))
        )

    def xmp_metadata(self) -> "bytes | None":
        """The document-level XMP packet (ISO 32000-1 §14.3.2): the
        catalog's /Metadata stream with filters applied — RDF/XML the
        SAX kernel tokenizes like any other XML (q83). None when the
        catalog has no /Metadata or the stream is unreadable."""
        cat = self.catalog()
        if not isinstance(cat, dict):
            return None
        ref = cat.get("/Metadata")
        if ref is None:
            return None
        try:
            return self.stream_bytes(ref)
        except PdfError:
            return None

    # -- page tree

    def catalog(self):
        root = None
        for t in self._trailer_dicts():
            if "/Root" in t:
                root = t["/Root"]
        if root is not None:
            cat = self.resolve(root)
            if isinstance(cat, dict):
                return cat
        for num in self._order:  # xref-stream PDFs / broken trailers
            v = self.objects[num]
            if isinstance(v, dict) and v.get("/Type") == "/Catalog":
                return v
        return None

    def pages(self) -> list[dict]:
        cat = self.catalog()
        out: list[dict] = []
        if cat is not None:
            seen: set[int] = set()

            def walk(node_ref):
                if isinstance(node_ref, Ref):
                    if node_ref.num in seen:
                        return
                    seen.add(node_ref.num)
                node = self.resolve(node_ref)
                if not isinstance(node, dict):
                    return
                t = node.get("/Type")
                if t == "/Page":
                    out.append(node)
                elif t == "/Pages" or "/Kids" in node:
                    kids = self.resolve(node.get("/Kids")) or []
                    for k in kids:
                        walk(k)

            walk(cat.get("/Pages"))
        if not out:  # fallback: file order
            for num in self._order:
                v = self.objects[num]
                if isinstance(v, dict) and v.get("/Type") == "/Page":
                    out.append(v)
        return out

    def page_content(self, page: dict) -> bytes:
        contents = page.get("/Contents")
        refs: list[Ref] = []
        if isinstance(contents, Ref):
            refs = [contents]
        else:
            resolved = self.resolve(contents)
            if isinstance(resolved, list):
                refs = [r for r in resolved if isinstance(r, Ref)]
        return b"\n".join(self.stream_bytes(r) for r in refs)

    def page_fonts(self, page: dict) -> dict[str, "_CMap"]:
        """Resource-name → /ToUnicode CMap for every font of the page
        that carries one (fonts without a CMap fall back to the default
        string decoding). Resource name is WITHOUT the leading slash, to
        match how ``Tf`` operands surface in the content interpreter."""
        return self._fonts_from_resources(self.resolve(page.get("/Resources")))

    def _fonts_from_resources(self, res) -> dict[str, "_CMap"]:
        out: dict[str, _CMap] = {}
        if not isinstance(res, dict):
            return out
        fonts = self.resolve(res.get("/Font"))
        if not isinstance(fonts, dict):
            return out
        for name, fref in fonts.items():
            font = self.resolve(fref)
            if not isinstance(font, dict):
                continue
            cmap = None
            tu = font.get("/ToUnicode")
            if isinstance(tu, Ref):
                # /ToUnicode is authoritative for text extraction (§9.10.2).
                # Cache per object number: a 1000-page doc with one CID
                # font must inflate+parse its CMap once, not per page.
                if tu.num in self._font_cmap_cache:
                    cmap = self._font_cmap_cache[tu.num]
                else:
                    try:
                        cmap = _parse_tounicode(self.stream_bytes(tu))
                    except PdfError:
                        cmap = None
                    self._font_cmap_cache[tu.num] = cmap
            if cmap is None and font.get("/Subtype") == "/Type0":
                # composite font (§9.7): 2-byte show codes; decode
                # source is the descendant CIDFontType2's embedded
                # program — the simple-font paths below never apply
                cmap = self._composite_font_cmap(font)
                if cmap is not None:
                    out[name.lstrip("/")] = cmap
                continue
            if cmap is None:
                # simple-font /Encoding: a bare Annex D name, or a dict
                # with /BaseEncoding + /Differences overlaid (§9.6.5)
                enc = self.resolve(font.get("/Encoding"))
                base = diffs = None
                if isinstance(enc, str):
                    base = base_encoding_map(enc)
                elif isinstance(enc, dict):
                    be = enc.get("/BaseEncoding")
                    if isinstance(be, str):
                        base = base_encoding_map(be)
                    d = self.resolve(enc.get("/Differences"))
                    if isinstance(d, list):
                        diffs = d
                if diffs is not None and base is None:
                    # ISO 32000-1 Table 114: with no /BaseEncoding the
                    # /Differences overlay the font's BUILT-IN encoding
                    # — which the embedded-program decoders below can
                    # recover (round-7 review: without this, any
                    # Differences-only /Encoding dict made the embedded
                    # decode unreachable)
                    builtin = self._embedded_font_cmap(font)
                    if builtin is not None:
                        base = dict(builtin.map)
                if base is not None or diffs is not None:
                    cmap = _differences_cmap(diffs or [], base)
            if cmap is None:
                # last decode source before the Latin-1 fallback: the
                # embedded TrueType program's own 'cmap' table (§9.6.6.4
                # inverted for extraction — the dominant real-crawl shape
                # for subset fonts that ship no /ToUnicode)
                cmap = self._embedded_font_cmap(font)
            if cmap is not None:
                out[name.lstrip("/")] = cmap
        return out

    # -- XObjects (§8.8/§8.10: form XObjects carry their own content
    # streams — real-crawl PDFs put letterheads, stamps, and whole
    # generated bodies behind ``Do``, so text extraction must recurse)

    _XOBJ_MAX_DEPTH = 8

    def page_xobjects(self, page: dict) -> dict:
        """Resource-name (no slash) → XObject entry for the page:
        ``('form', objnum, content_bytes, fonts|None, xobjs|None)``
        (``None`` fonts/xobjs = the form has no /Resources of its own
        and inherits the invoking context's — deprecated by ISO 32000
        §7.8.3 but ubiquitous in real files) or
        ``('image', objnum, dict, raw_len, raw_bytes)``. Nested form resources are
        resolved recursively with a depth cap and a visited set, so
        self-referencing forms degrade to truncated nesting instead of
        recursing forever. Shared forms (per-page headers) are cached
        per object number."""
        return self._xobjects_from_resources(
            self.resolve(page.get("/Resources")), 0, frozenset()
        )

    def _xobjects_from_resources(self, res, depth: int, seen: frozenset) -> dict:
        out: dict = {}
        if not isinstance(res, dict) or depth >= self._XOBJ_MAX_DEPTH:
            return out
        xo = self.resolve(res.get("/XObject"))
        if not isinstance(xo, dict):
            return out
        for name, ref in xo.items():
            if not isinstance(ref, Ref):
                continue
            d = self.resolve(ref)
            if not isinstance(d, dict):
                continue
            sub = d.get("/Subtype")
            if sub == "/Form":
                if ref.num in seen:
                    continue  # reference cycle — drop the re-entry
                cached = self._xobj_cache.get(ref.num)
                if cached is None:
                    try:
                        content = self.stream_bytes(ref)
                    except PdfError:
                        continue
                    sres = self.resolve(d.get("/Resources"))
                    if isinstance(sres, dict):
                        sfonts = self._fonts_from_resources(sres)
                        sxobjs = self._xobjects_from_resources(
                            sres, depth + 1, seen | {ref.num}
                        )
                    else:
                        sfonts = sxobjs = None  # inherit at interpret time
                    cached = ("form", ref.num, content, sfonts, sxobjs)
                    self._xobj_cache[ref.num] = cached
                out[name.lstrip("/")] = cached
            elif sub == "/Image":
                raw = self.streams.get(ref.num)
                out[name.lstrip("/")] = (
                    "image", ref.num, d, 0 if raw is None else len(raw), raw
                )
        return out

    def _composite_font_cmap(self, font: dict) -> "_CMap | None":
        """Type0 font without /ToUnicode → width-2 decoder, or None.

        ISO 32000-1 §9.7.4/§9.7.5: with an /Identity-H or /Identity-V
        CMap the 2-byte show code IS the CID; /CIDToGIDMap (the name
        /Identity, or a stream of big-endian uint16 GIDs indexed by
        CID) maps CID → glyph; unicode comes from inverting the
        embedded TrueType program's Unicode-platform cmap subtable
        (GID → smallest code point), the same inversion the symbolic
        simple-font path uses. Degrades per ISO semantics, never
        crashes:

        - a predefined non-Identity CMap name (the CJK registry —
          multi-kilobyte external tables) or an embedded CMap stream
          /Encoding: return None (show fallback), a declared gap;
        - descendant /CIDFontType0 (CID-keyed CFF, /ROS): its charset
          maps GID→CID with no name/unicode layer — None;
        - Identity CMap confirmed but no usable /FontFile2: the 2-byte
          framing is still certain, so return an empty width-2 map
          (code units degrade to ``chr(cid)`` deterministically rather
          than latin-1-per-byte mojibake)."""
        enc = font.get("/Encoding")
        if isinstance(enc, Ref):
            enc = self.resolve(enc)  # an indirect name is still a name
        if enc not in ("/Identity-H", "/Identity-V"):
            return None  # embedded CMap stream / predefined CJK CMap
        dfs = self.resolve(font.get("/DescendantFonts"))
        if isinstance(dfs, list) and dfs:
            df = self.resolve(dfs[0])
        else:
            df = None
        if not isinstance(df, dict) or df.get("/Subtype") != "/CIDFontType2":
            return None
        fallback = _CMap(2, {})
        desc = self.resolve(df.get("/FontDescriptor"))
        if not isinstance(desc, dict):
            return fallback
        ff = desc.get("/FontFile2")
        if not isinstance(ff, Ref):
            return fallback
        c2g = df.get("/CIDToGIDMap", "/Identity")
        c2g_key = c2g.num if isinstance(c2g, Ref) else "id"
        key = ("cid2", ff.num, c2g_key)
        if key in self._font_cmap_cache:
            return self._font_cmap_cache[key]
        try:
            gid_uni = _tt_gid_to_unicode_cached(self.stream_bytes(ff))
        except PdfError:
            gid_uni = None
        cmap = fallback
        if gid_uni is not None:
            mapping: dict[int, str] = {}
            if isinstance(c2g, Ref):
                try:
                    table = self.stream_bytes(c2g)
                except PdfError:
                    table = b""
                # 2-byte codes bound CIDs to 0xFFFF; a longer stream is
                # unreachable map tail, not a reason to scan further
                n = min(len(table) // 2, 0x10000)
                gids = struct.unpack(">%dH" % n, table[: 2 * n])
                for cid, gid in enumerate(gids):
                    if gid:
                        u = gid_uni.get(gid)
                        if u is not None:
                            mapping[cid] = u
            else:
                # /Identity: CID == GID
                mapping = {gid: u for gid, u in gid_uni.items() if gid <= 0xFFFF}
            cmap = _CMap(2, mapping) if mapping else fallback
        self._font_cmap_cache[key] = cmap
        return cmap

    def _embedded_font_cmap(self, font: dict) -> "_CMap | None":
        """/FontDescriptor /FontFile2 (TrueType cmap table), /FontFile
        (Type1 cleartext /Encoding array) or /FontFile3 (bare CFF
        charset+encoding; OTTO-wrapped CFF defers to the cmap path) →
        1-byte decoder, cached per stream object number (a 1000-page
        doc parses its subset once)."""
        desc = self.resolve(font.get("/FontDescriptor"))
        if not isinstance(desc, dict):
            return None
        ff = desc.get("/FontFile2")
        parse = _parse_truetype_cmap
        if not isinstance(ff, Ref):
            ff = desc.get("/FontFile")
            parse = _parse_type1_encoding
        if not isinstance(ff, Ref):
            ff = desc.get("/FontFile3")
            parse = _parse_cff_encoding
        if not isinstance(ff, Ref):
            return None
        if ff.num in self._font_cmap_cache:
            return self._font_cmap_cache[ff.num]
        try:
            cmap = parse(self.stream_bytes(ff))
        except PdfError:
            cmap = None
        self._font_cmap_cache[ff.num] = cmap
        return cmap


# ---------------------------------------------------------------------------
# glyph names (the /Encoding /Differences simple-font text path)

# Adobe Glyph List subset: ASCII coverage + the accented Latin names real
# simple-font subsets use. Arbitrary characters arrive as uniXXXX /
# uXXXXX names, handled in _glyph_to_unicode.
_AGL: dict[str, str] = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
    "exclamdown": "¡", "cent": "¢", "sterling": "£",
    "currency": "¤", "yen": "¥", "section": "§",
    "copyright": "©", "guillemotleft": "«", "registered": "®",
    "degree": "°", "plusminus": "±", "mu": "µ",
    "paragraph": "¶", "guillemotright": "»",
    "questiondown": "¿", "Agrave": "À", "Aacute": "Á",
    "Acircumflex": "Â", "Atilde": "Ã", "Adieresis": "Ä",
    "Aring": "Å", "AE": "Æ", "Ccedilla": "Ç",
    "Egrave": "È", "Eacute": "É", "Ecircumflex": "Ê",
    "Edieresis": "Ë", "Igrave": "Ì", "Iacute": "Í",
    "Ntilde": "Ñ", "Ograve": "Ò", "Oacute": "Ó",
    "Ocircumflex": "Ô", "Otilde": "Õ", "Odieresis": "Ö",
    "Oslash": "Ø", "Ugrave": "Ù", "Uacute": "Ú",
    "Ucircumflex": "Û", "Udieresis": "Ü", "Yacute": "Ý",
    "germandbls": "ß", "agrave": "à", "aacute": "á",
    "acircumflex": "â", "atilde": "ã", "adieresis": "ä",
    "aring": "å", "ae": "æ", "ccedilla": "ç",
    "egrave": "è", "eacute": "é", "ecircumflex": "ê",
    "edieresis": "ë", "igrave": "ì", "iacute": "í",
    "icircumflex": "î", "idieresis": "ï", "ntilde": "ñ",
    "ograve": "ò", "oacute": "ó", "ocircumflex": "ô",
    "otilde": "õ", "odieresis": "ö", "divide": "÷",
    "oslash": "ø", "ugrave": "ù", "uacute": "ú",
    "ucircumflex": "û", "udieresis": "ü", "yacute": "ý",
    "ydieresis": "ÿ", "bullet": "•", "endash": "–",
    "emdash": "—", "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”",
    "dagger": "†", "daggerdbl": "‡", "ellipsis": "…",
    "perthousand": "‰", "guilsinglleft": "‹",
    "guilsinglright": "›", "trademark": "™", "Euro": "€",
    "fi": "ﬁ", "fl": "ﬂ",
    # names used by the Annex D base encodings (StandardEncoding's
    # accent/ligature set + the WinAnsi/MacRoman extras), so the
    # /Differences path understands them too
    "fraction": "⁄", "florin": "ƒ", "periodcentered": "·",
    "quotesinglbase": "‚", "quotedblbase": "„", "acute": "´",
    "circumflex": "ˆ", "tilde": "˜", "macron": "¯", "breve": "˘",
    "dotaccent": "˙", "dieresis": "¨", "ring": "˚", "cedilla": "¸",
    "hungarumlaut": "˝", "ogonek": "˛", "caron": "ˇ",
    "ordfeminine": "ª", "ordmasculine": "º", "Lslash": "Ł",
    "lslash": "ł", "dotlessi": "ı", "OE": "Œ", "oe": "œ",
    "Scaron": "Š", "scaron": "š", "Zcaron": "Ž", "zcaron": "ž",
    "Ydieresis": "Ÿ", "brokenbar": "¦", "logicalnot": "¬",
    "onesuperior": "¹", "twosuperior": "²",
    "threesuperior": "³", "onequarter": "¼", "onehalf": "½",
    "threequarters": "¾", "multiply": "×", "Eth": "Ð", "eth": "ð",
    "Thorn": "Þ", "thorn": "þ", "Icircumflex": "Î", "Idieresis": "Ï",
}
# single ASCII letters map to themselves
for _c in "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz":
    _AGL[_c] = _c
del _c


def _glyph_to_unicode(name: str) -> str | None:
    """Glyph name (with or without the leading slash) → unicode string,
    per the Adobe Glyph List conventions: table lookup, then the
    ``uniXXXX[XXXX…]`` and ``uXXXX[XX]`` algorithmic forms."""
    g = name.lstrip("/")
    hit = _AGL.get(g)
    if hit is not None:
        return hit
    if g.startswith("uni") and len(g) >= 7 and (len(g) - 3) % 4 == 0:
        try:
            cps = [int(g[i : i + 4], 16) for i in range(3, len(g), 4)]
        except ValueError:
            return None
        if any(0xD800 <= c <= 0xDFFF for c in cps):
            return None
        return "".join(chr(c) for c in cps)
    if g.startswith("u") and 5 <= len(g) <= 7:
        try:
            c = int(g[1:], 16)
        except ValueError:
            return None
        if 0xD800 <= c <= 0xDFFF or c > 0x10FFFF:
            return None
        return chr(c)
    return None


# ---------------------------------------------------------------------------
# Annex D base encodings (ISO 32000-1, simple fonts without /ToUnicode)
#
# A simple font whose /Encoding is one of these NAMES (or a dict whose
# /BaseEncoding is) decodes its 1-byte show-string codes through the
# named table, with /Differences overlaid on top. Before round 5 such
# fonts fell back to latin-1, silently mojibaking MacRoman text and the
# WinAnsi 0x80-0x9F punctuation block (curly quotes, bullets, dashes —
# ubiquitous in real office/crawled PDFs).


def _codec_range_map(codec: str) -> dict[int, str]:
    m: dict[int, str] = {}
    for c in range(0x20, 0x100):
        try:
            m[c] = bytes([c]).decode(codec)
        except UnicodeDecodeError:
            pass  # code undefined in the encoding — stays unmapped
    return m


# StandardEncoding has no Python codec; its table is ASCII with
# quoteright/quoteleft at 0x27/0x60 plus the Annex D high range below
# (code → glyph name, resolved through the AGL table at build time).
_STANDARD_HIGH = {
    0o241: "exclamdown", 0o242: "cent", 0o243: "sterling",
    0o244: "fraction", 0o245: "yen", 0o246: "florin", 0o247: "section",
    0o250: "currency", 0o251: "quotesingle", 0o252: "quotedblleft",
    0o253: "guillemotleft", 0o254: "guilsinglleft",
    0o255: "guilsinglright", 0o256: "fi", 0o257: "fl",
    0o261: "endash", 0o262: "dagger", 0o263: "daggerdbl",
    0o264: "periodcentered", 0o266: "paragraph", 0o267: "bullet",
    0o270: "quotesinglbase", 0o271: "quotedblbase",
    0o272: "quotedblright", 0o273: "guillemotright", 0o274: "ellipsis",
    0o275: "perthousand", 0o277: "questiondown",
    0o301: "grave", 0o302: "acute", 0o303: "circumflex", 0o304: "tilde",
    0o305: "macron", 0o306: "breve", 0o307: "dotaccent",
    0o310: "dieresis", 0o312: "ring", 0o313: "cedilla",
    0o315: "hungarumlaut", 0o316: "ogonek", 0o317: "caron",
    0o320: "emdash", 0o341: "AE", 0o343: "ordfeminine",
    0o350: "Lslash", 0o351: "Oslash", 0o352: "OE",
    0o353: "ordmasculine", 0o361: "ae", 0o365: "dotlessi",
    0o370: "lslash", 0o371: "oslash", 0o372: "oe", 0o373: "germandbls",
}


@functools.lru_cache(maxsize=None)
def base_encoding_map(name: str) -> dict[int, str] | None:
    """``/WinAnsiEncoding`` / ``/MacRomanEncoding`` /
    ``/StandardEncoding`` (leading slash optional) → {code: char};
    None for any other name. WinAnsi is cp1252 (Annex D's table is the
    same; cp1252's five unassigned codes stay unmapped). MacRoman is
    the pre-OS-8.5 table Annex D froze: 0xDB is the currency sign (not
    the euro Python's mac_roman codec has) and 0xF0 (the Apple logo,
    private use) is unmapped."""
    n = name.lstrip("/")
    if n == "WinAnsiEncoding":
        return _codec_range_map("cp1252")
    if n == "MacRomanEncoding":
        m = _codec_range_map("mac_roman")
        m[0xDB] = "¤"
        del m[0xF0]
        return m
    if n == "StandardEncoding":
        m = {c: chr(c) for c in range(0x20, 0x7F)}
        m[0x27] = "’"  # quoteright
        m[0x60] = "‘"  # quoteleft
        for code, glyph in _STANDARD_HIGH.items():
            u = _glyph_to_unicode(glyph)
            if u is not None:
                m[code] = u
        return m
    return None


def _differences_cmap(diffs: list, base: dict[int, str] | None = None) -> "_CMap | None":
    """/Encoding /Differences array → 1-byte decoder: an integer sets
    the next code, each following name assigns consecutive codes —
    overlaid on ``base`` (the /BaseEncoding table) when present.
    Unknown glyph names are left unmapped (they fall back to Latin-1
    via _CMap.decode's chr())."""
    mapping: dict[int, str] = dict(base) if base else {}
    code = 0
    for el in diffs:
        if isinstance(el, (int, float)):
            code = int(el)
        elif isinstance(el, str):
            u = _glyph_to_unicode(el)
            if u is not None and 0 <= code <= 255:
                mapping[code] = u
            code += 1
    return _CMap(1, mapping) if mapping else None


# ---------------------------------------------------------------------------
# /ToUnicode CMaps (the CID-font text path)


class _CMap:
    """code-int → unicode-str mapping with a fixed code byte width."""

    __slots__ = ("width", "map")

    def __init__(self, width: int, mapping: dict[int, str]):
        self.width = width
        self.map = mapping

    def decode(self, b: bytes) -> str:
        m = self.map
        get = m.get
        if self.width == 2:
            # bulk-unpack the code units (the dominant CID case) — one
            # struct call instead of a python slice+from_bytes per code
            k = len(b) // 2
            codes = struct.unpack(">%dH" % k, b[: 2 * k])
        elif self.width == 1:
            codes = b
        else:
            w = self.width
            codes = [
                int.from_bytes(b[i : i + w], "big")
                for i in range(0, len(b) - w + 1, w)
            ]
        return "".join(
            [s if (s := get(c)) is not None else chr(c) for c in codes]
        )


@functools.lru_cache(maxsize=256)
def _parse_tounicode(data: bytes) -> _CMap | None:
    """Parse the bfchar/bfrange sections of a ToUnicode CMap stream
    (memoized on the decoded stream bytes: real corpora repeat the same
    font subsets across thousands of pages, so the parse runs once per
    distinct font per worker, not once per document).
    ISO 32000-1 §9.10.3: 1- and 2-byte code spaces, bfchar pairs,
    bfrange with an incrementing destination, and bfrange with an
    explicit destination array. CMap/PostScript framing keywords are
    skipped as unknown tokens, so a full CIDInit prologue parses fine."""
    lex = _Lexer(data)
    width: int | None = None
    mapping: dict[int, str] = {}

    def _dst_str(b: bytes) -> str:
        return b.decode("utf-16-be", "replace") if b else ""

    while True:
        tok = lex.next_token()
        if tok is None:
            break
        kind, val = tok
        if kind == "kw":
            if val == b"begincodespacerange":
                pair: list[bytes] = []
                while True:
                    t = lex.next_token()
                    if t is None or t == ("kw", b"endcodespacerange"):
                        break
                    if t[0] == "str":
                        pair.append(t[1])
                if pair and width is None:
                    width = max(1, len(pair[0]))
            elif val == b"beginbfchar":
                pair = []
                while True:
                    t = lex.next_token()
                    if t is None or t == ("kw", b"endbfchar"):
                        break
                    if t[0] == "str":
                        pair.append(t[1])
                        if len(pair) == 2:
                            src, dst = pair
                            pair = []
                            if width is None:
                                width = max(1, len(src))
                            mapping[int.from_bytes(src, "big")] = _dst_str(dst)
            elif val == b"beginbfrange":
                triple: list = []
                while True:
                    t = lex.next_token()
                    if t is None or t == ("kw", b"endbfrange"):
                        break
                    if t[0] == "str":
                        triple.append(t[1])
                    elif t[0] == "arr_open":
                        arr: list[bytes] = []
                        while True:
                            t2 = lex.next_token()
                            if t2 is None or t2[0] == "arr_close":
                                break
                            if t2[0] == "str":
                                arr.append(t2[1])
                        triple.append(arr)
                    else:
                        continue
                    if len(triple) == 3:
                        lo_b, hi_b, dst = triple
                        triple = []
                        if not isinstance(lo_b, bytes) or not isinstance(hi_b, bytes):
                            continue
                        lo = int.from_bytes(lo_b, "big")
                        hi = int.from_bytes(hi_b, "big")
                        if width is None:
                            width = max(1, len(lo_b))
                        if hi < lo or hi - lo > 0xFFFF:
                            continue  # malformed range — skip, never hang
                        if isinstance(dst, list):
                            for i, d in enumerate(dst):
                                if lo + i > hi:
                                    break
                                mapping[lo + i] = _dst_str(d)
                        elif isinstance(dst, bytes) and dst:
                            base = int.from_bytes(dst, "big")
                            n = len(dst)
                            top = 1 << (8 * n)
                            for i in range(hi - lo + 1):
                                if base + i >= top:
                                    break  # dst width exhausted — stop, not crash
                                mapping[lo + i] = _dst_str(
                                    (base + i).to_bytes(n, "big")
                                )

    if width is None or not mapping:
        return None
    return _CMap(width, mapping)


# ---------------------------------------------------------------------------
# embedded TrueType 'cmap' tables (simple fonts without /ToUnicode)
#
# A large share of real-crawl PDFs embed TrueType subsets with neither a
# /ToUnicode CMap nor an /Encoding /Differences array; their show bytes
# only become text through the font program's own 'cmap' table (Apple/MS
# TrueType spec, public). The reference has no PDF counterpart at all
# (sax-wasm is XML-only — /root/reference/src/sax/parser.rs:1); this is
# the north rule's "PDF/layout parse" leg.


def _tt_subtable(data: bytes, off: int) -> dict[int, int] | None:
    """One cmap subtable at ``off`` → {code point: glyph id}. Formats 0
    (byte table), 4 (segment delta, the BMP workhorse), 6 (trimmed) and
    12 (segmented coverage) are enough for real subsets; anything else
    returns None. Lenient: truncated tables yield what parsed."""
    fmt = struct.unpack_from(">H", data, off)[0]
    out: dict[int, int] = {}
    # a corrupt/hostile segment table must not hang a worker: every
    # expanding branch (4 and 12) draws from one decreasing budget —
    # far above any real subset's mapping count, tiny next to the
    # blow-up a crafted full-range segment list could otherwise cause
    budget = 1 << 17
    if fmt == 0:
        for code, gid in enumerate(data[off + 6 : off + 262]):
            if gid:
                out[code] = gid
    elif fmt == 4:
        seg2 = struct.unpack_from(">H", data, off + 6)[0]
        segs = seg2 // 2
        ends = struct.unpack_from(">%dH" % segs, data, off + 14)
        start_off = off + 16 + seg2
        starts = struct.unpack_from(">%dH" % segs, data, start_off)
        deltas = struct.unpack_from(">%dh" % segs, data, start_off + seg2)
        ro_off = start_off + 2 * seg2
        range_offs = struct.unpack_from(">%dH" % segs, data, ro_off)
        for i in range(segs):
            s, e = starts[i], ends[i]
            if s > e or (s == 0xFFFF and e == 0xFFFF):
                continue
            if e - s >= budget:
                e = s + budget - 1
            budget -= e - s + 1
            if range_offs[i] == 0:
                for c in range(s, e + 1):
                    gid = (c + deltas[i]) & 0xFFFF
                    if gid:
                        out[c] = gid
            else:
                # glyphIdArray indexing: the offset is relative to the
                # idRangeOffset WORD itself (the spec's famous quirk)
                base = ro_off + 2 * i + range_offs[i]
                for c in range(s, e + 1):
                    p = base + 2 * (c - s)
                    if p + 2 > len(data):
                        break
                    gid = struct.unpack_from(">H", data, p)[0]
                    if gid:
                        out[c] = (gid + deltas[i]) & 0xFFFF
            if budget <= 0:
                break
    elif fmt == 6:
        first, count = struct.unpack_from(">2H", data, off + 6)
        gids = struct.unpack_from(">%dH" % count, data, off + 10)
        for i, gid in enumerate(gids):
            if gid:
                out[first + i] = gid
    elif fmt == 12:
        n_groups = struct.unpack_from(">I", data, off + 12)[0]
        p = off + 16
        for _ in range(min(n_groups, 1 << 16)):
            if p + 12 > len(data):
                break
            s, e, g = struct.unpack_from(">3I", data, p)
            p += 12
            # corrupt groups: reversed, absurdly wide, or lying outside
            # the Unicode range entirely (chr() on such a cp would
            # raise and break the per-row-degradation contract)
            if e < s or e - s > budget or s > 0x10FFFF:
                continue
            e = min(e, 0x10FFFF)
            for i in range(e - s + 1):
                out[s + i] = g + i
            budget -= e - s + 1
            if budget <= 0:
                break
    else:
        return None
    return out


# Type1 font programs (/FontFile): the built-in encoding lives in the
# CLEARTEXT portion (before eexec) as PostScript — either
# `/Encoding StandardEncoding def` or an array filled with
# `dup <code> /<glyphname> put` entries (Adobe Type 1 Font Format
# §2.3, public). Glyph names resolve through the same AGL machinery
# the /Differences path uses.

_T1_DUP_RE = re.compile(rb"dup\s+(\d+)\s*/([^\s/{}()<>\[\]]+)\s+put")


def _parse_type1_encoding(data: bytes) -> "_CMap | None":
    """Embedded Type1 program → 1-byte decoder from its built-in
    /Encoding, or None (caller falls back). Lenient: PFB segment
    framing is unwrapped if present; everything after eexec (encrypted
    charstrings) is ignored — the encoding is cleartext by format."""
    if data[:1] == b"\x80":
        # PFB framing: 0x80 0x01 <len LE32> ascii / 0x80 0x02 binary
        clear = bytearray()
        pos = 0
        while pos + 6 <= len(data) and data[pos] == 0x80:
            seg_type = data[pos + 1]
            ln = int.from_bytes(data[pos + 2 : pos + 6], "little")
            if seg_type == 3:
                break
            if seg_type == 1:
                clear += data[pos + 6 : pos + 6 + ln]
            pos += 6 + ln
        clear = bytes(clear)
    else:
        i = data.find(b"eexec")
        clear = data[: i if i >= 0 else len(data)]
    m = clear.find(b"/Encoding")
    if m < 0:
        return None
    if b"StandardEncoding" in clear[m : m + 40]:
        base = base_encoding_map("/StandardEncoding")
        return _CMap(1, dict(base)) if base else None
    # dup/put entries appear only in the Encoding array within the
    # cleartext (charstring/Subr dups live inside eexec); cap the scan
    # window against degenerate inputs
    mapping: dict[int, str] = {}
    for code_b, name_b in _T1_DUP_RE.findall(clear[m : m + 65536]):
        code = int(code_b)
        if not 0 <= code <= 255 or name_b == b".notdef":
            continue
        u = _glyph_to_unicode(name_b.decode("latin-1"))
        if u is not None:
            mapping[code] = u
    return _CMap(1, mapping) if mapping else None


# CFF / Type1C font programs (/FontFile3): bare-CFF layout per the
# public Compact Font Format spec (Adobe TN #5176) — INDEX structures,
# Top DICT operators, charset (GID→SID) and Encoding (code→GID) tables,
# standard strings for SIDs 0..228 (the full Latin repertoire; Expert
# SIDs 229..390 are decoration glyphs and fall back) plus the String
# INDEX for custom SIDs ≥ 391. OpenType-wrapped CFF (OTTO sfnt) routes
# through the TrueType cmap path instead. CIDFont CFFs (a /ROS Top DICT
# op) map GIDs to CIDs, not names — those need the composite-font
# machinery and degrade per-row here.

# SIDs 0..228 (spec Appendix A): StandardEncoding names then the
# ISOLatin1 additions — names resolve through the same AGL table the
# /Differences path uses.
_CFF_STD_STRINGS = (
    ".notdef space exclam quotedbl numbersign dollar percent ampersand "
    "quoteright parenleft parenright asterisk plus comma hyphen period "
    "slash zero one two three four five six seven eight nine colon "
    "semicolon less equal greater question at A B C D E F G H I J K L M "
    "N O P Q R S T U V W X Y Z bracketleft backslash bracketright "
    "asciicircum underscore quoteleft a b c d e f g h i j k l m n o p q "
    "r s t u v w x y z braceleft bar braceright asciitilde exclamdown "
    "cent sterling fraction yen florin section currency quotesingle "
    "quotedblleft guillemotleft guilsinglleft guilsinglright fi fl "
    "endash dagger daggerdbl periodcentered paragraph bullet "
    "quotesinglbase quotedblbase quotedblright guillemotright ellipsis "
    "perthousand questiondown grave acute circumflex tilde macron breve "
    "dotaccent dieresis ring cedilla hungarumlaut ogonek caron emdash "
    "AE ordfeminine Lslash Oslash OE ordmasculine ae dotlessi lslash "
    "oslash oe germandbls onesuperior logicalnot mu trademark Eth "
    "onehalf plusminus Thorn onequarter divide brokenbar degree thorn "
    "threequarters twosuperior registered minus eth multiply "
    "threesuperior copyright Aacute Acircumflex Adieresis Agrave Aring "
    "Atilde Ccedilla Eacute Ecircumflex Edieresis Egrave Iacute "
    "Icircumflex Idieresis Igrave Ntilde Oacute Ocircumflex Odieresis "
    "Ograve Otilde Scaron Uacute Ucircumflex Udieresis Ugrave Yacute "
    "Ydieresis Zcaron aacute acircumflex adieresis agrave aring atilde "
    "ccedilla eacute ecircumflex edieresis egrave iacute icircumflex "
    "idieresis igrave ntilde oacute ocircumflex odieresis ograve otilde "
    "scaron uacute ucircumflex udieresis ugrave yacute ydieresis zcaron"
).split()


def _cff_index(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """One CFF INDEX at ``pos`` → (items, position after the INDEX)."""
    count = struct.unpack_from(">H", data, pos)[0]
    if count == 0:
        return [], pos + 2
    off_size = data[pos + 2]
    if not 1 <= off_size <= 4:
        raise PdfError("cff: bad offSize")
    o0 = pos + 3
    offs = [
        int.from_bytes(data[o0 + i * off_size : o0 + (i + 1) * off_size], "big")
        for i in range(count + 1)
    ]
    base = o0 + (count + 1) * off_size - 1  # offsets are 1-based
    if offs[0] != 1 or any(offs[i] > offs[i + 1] for i in range(count)):
        raise PdfError("cff: bad INDEX offsets")
    items = [data[base + offs[i] : base + offs[i + 1]] for i in range(count)]
    return items, base + offs[count]


def _cff_dict(data: bytes) -> dict[int, list]:
    """CFF DICT bytes → {operator: operands}. Two-byte operators key as
    0xC00 | second byte."""
    out: dict[int, list] = {}
    operands: list = []
    pos = 0
    n = len(data)
    while pos < n:
        b0 = data[pos]
        if b0 <= 21:
            op = b0
            pos += 1
            if b0 == 12:
                op = 0xC00 | data[pos]
                pos += 1
            out[op] = operands
            operands = []
        elif 32 <= b0 <= 246:
            operands.append(b0 - 139)
            pos += 1
        elif 247 <= b0 <= 250:
            operands.append((b0 - 247) * 256 + data[pos + 1] + 108)
            pos += 2
        elif 251 <= b0 <= 254:
            operands.append(-(b0 - 251) * 256 - data[pos + 1] - 108)
            pos += 2
        elif b0 == 28:
            operands.append(struct.unpack_from(">h", data, pos + 1)[0])
            pos += 3
        elif b0 == 29:
            operands.append(struct.unpack_from(">i", data, pos + 1)[0])
            pos += 5
        elif b0 == 30:  # real number: nibble-encoded, 0xf terminates
            pos += 1
            while pos < n:
                nb = data[pos]
                pos += 1
                if nb & 0x0F == 0x0F or nb >> 4 == 0x0F:
                    break
            operands.append(0.0)  # value never needed for our ops
        else:
            raise PdfError("cff: bad dict byte")
    return out


def _parse_cff_encoding(data: bytes) -> "_CMap | None":
    """Embedded bare-CFF program → 1-byte decoder from its charset +
    encoding tables, or None (caller falls back). OTTO-wrapped CFF
    defers to the TrueType cmap path."""
    if data[:4] == b"OTTO":
        return _parse_truetype_cmap(data)  # the digest-memoized path
    try:
        if len(data) < 4 or data[0] != 1:  # major version 1 only
            return None
        pos = data[2]  # hdrSize
        _names, pos = _cff_index(data, pos)
        top_dicts, pos = _cff_index(data, pos)
        strings, _pos = _cff_index(data, pos)
        if not top_dicts:
            return None
        top = _cff_dict(top_dicts[0])
        if 0xC1E in top:  # ROS → CIDFont: GIDs map to CIDs, not names
            return None
        cs_off = top.get(17)
        charset_off = int(top.get(15, [0])[0])
        enc_off = int(top.get(16, [0])[0])
        if enc_off in (0, 1):
            # predefined Standard/Expert encodings: code → name is the
            # Annex D Standard table (Expert's repertoire is outside
            # our text scope and falls back the same way)
            base = base_encoding_map("/StandardEncoding")
            return _CMap(1, dict(base)) if base and enc_off == 0 else None
        n_glyphs = (
            struct.unpack_from(">H", data, int(cs_off[0]))[0] if cs_off else 0
        )
        if not n_glyphs:
            return None

        def sid_name(sid: int) -> str | None:
            if 0 <= sid < len(_CFF_STD_STRINGS):
                return _CFF_STD_STRINGS[sid]
            i = sid - 391
            if 0 <= i < len(strings):
                return strings[i].decode("latin-1")
            return None

        # charset: GID (1..n-1) → SID; GID 0 is .notdef. Predefined
        # offset 0 (ISOAdobe) is SID == GID identity; 1/2 (Expert/
        # ExpertSubset) map GIDs to SIDs 229+ — NOT identity, and their
        # repertoire is decoration glyphs, so they degrade cleanly
        # instead of decoding wrong letters (round-7 review).
        gid_sid: dict[int, int] = {}
        if charset_off == 0:
            for g in range(1, n_glyphs):
                gid_sid[g] = g
        elif charset_off in (1, 2):
            return None
        else:
            fmt = data[charset_off]
            p = charset_off + 1
            if fmt == 0:
                for g in range(1, n_glyphs):
                    gid_sid[g] = struct.unpack_from(">H", data, p)[0]
                    p += 2
            elif fmt in (1, 2):
                g = 1
                step = 3 if fmt == 1 else 4
                while g < n_glyphs and p + step <= len(data):
                    first = struct.unpack_from(">H", data, p)[0]
                    n_left = (
                        data[p + 2]
                        if fmt == 1
                        else struct.unpack_from(">H", data, p + 2)[0]
                    )
                    p += step
                    for k in range(n_left + 1):
                        if g >= n_glyphs:
                            break
                        gid_sid[g] = first + k
                        g += 1
            else:
                return None

        # encoding: code → GID (custom formats 0/1 + supplements)
        fmt = data[enc_off]
        p = enc_off + 1
        code_gid: dict[int, int] = {}
        if fmt & 0x7F == 0:
            # ALWAYS consume all nCodes bytes, even past nGlyphs-1 —
            # stopping early leaves p misaligned for the supplement
            # block (round-7 review, probe-confirmed)
            n_codes = data[p]
            p += 1
            for i in range(n_codes):
                if i + 1 <= n_glyphs - 1:
                    code_gid[data[p]] = i + 1
                p += 1
        elif fmt & 0x7F == 1:
            n_ranges = data[p]
            p += 1
            g = 1
            for _ in range(n_ranges):
                first, n_left = data[p], data[p + 1]
                p += 2
                for k in range(n_left + 1):
                    if g >= n_glyphs:
                        break
                    code_gid[first + k] = g
                    g += 1
        else:
            return None
        mapping: dict[int, str] = {}
        for code, gid in code_gid.items():
            name = sid_name(gid_sid.get(gid, -1))
            if name is None:
                continue
            u = _glyph_to_unicode(name)
            if u is not None:
                mapping[code] = u
        if fmt & 0x80:  # supplements: code → glyph BY SID
            sid_gid = {s: g for g, s in gid_sid.items()}
            n_sups = data[p]
            p += 1
            for _ in range(n_sups):
                code = data[p]
                sid = struct.unpack_from(">H", data, p + 1)[0]
                p += 3
                name = sid_name(sid) if sid in sid_gid else None
                u = _glyph_to_unicode(name) if name else None
                if u is not None:
                    mapping[code] = u
        return _CMap(1, mapping) if mapping else None
    except (struct.error, IndexError, PdfError):
        return None


# cross-document memo keyed by CONTENT DIGEST, not the blob itself:
# real /FontFile2 programs carry glyf/loca tables (hundreds of KB), and
# an lru_cache keyed on the bytes would pin dozens of dead font blobs
# per long-lived worker. Real corpora repeat the same subset across
# thousands of docs, so the digest hit rate is the same.
_TT_CMAP_CACHE: dict[bytes, "_CMap | None"] = {}


def _tt_cmap_subtables(
    data: bytes,
) -> dict[tuple[int, int], dict[int, int]] | None:
    """TrueType/OpenType program → {(platform, encoding): {cp: gid}}
    for every parseable 'cmap' subtable (first member of a 'ttcf'
    collection). None when the blob is not a font program or carries no
    usable cmap — shared by the simple-font decoder and the composite
    CIDFontType2 GID→unicode inversion."""
    try:
        if data[:4] not in (b"\x00\x01\x00\x00", b"true", b"OTTO", b"ttcf"):
            return None
        if data[:4] == b"ttcf":  # TrueType collection: first font
            # member directory offsets are absolute within the TTC blob
            first = struct.unpack_from(">I", data, 12)[0]
            n_tables = struct.unpack_from(">H", data, first + 4)[0]
            rec0 = first + 12
        else:
            n_tables = struct.unpack_from(">H", data, 4)[0]
            rec0 = 12
        cmap_off = None
        for i in range(min(n_tables, 64)):
            tag, _cs, off, _ln = struct.unpack_from(">4s3I", data, rec0 + 16 * i)
            if tag == b"cmap":
                cmap_off = off
                break
        if cmap_off is None:
            return None
        n_sub = struct.unpack_from(">H", data, cmap_off + 2)[0]
        subs: dict[tuple[int, int], dict[int, int]] = {}
        for i in range(min(n_sub, 16)):
            plat, enc, rel = struct.unpack_from(
                ">2HI", data, cmap_off + 4 + 8 * i
            )
            if (plat, enc) in subs:
                continue
            try:
                t = _tt_subtable(data, cmap_off + rel)
            except struct.error:
                t = None
            if t:
                subs[(plat, enc)] = t
    except (struct.error, IndexError):
        return None
    return subs or None


def _tt_gid_to_unicode(data: bytes) -> dict[int, str] | None:
    """Embedded TrueType program → {glyph id: unicode str}, the
    inversion of its Unicode-platform cmap ((3,1) Windows BMP first,
    then (0,3)/(0,4), then any platform-0 subtable; ties break to the
    smallest code point, the deterministic inverse the simple-font path
    already uses). This is the unicode source for composite
    CIDFontType2 fonts without /ToUnicode: show code → CID (Identity
    CMap) → GID (CIDToGIDMap) → unicode (here)."""
    subs = _tt_cmap_subtables(data)
    if subs is None:
        return None
    uni = subs.get((3, 1)) or subs.get((0, 3)) or subs.get((0, 4))
    if uni is None:
        uni = next((t for (p, _e), t in subs.items() if p == 0), None)
    if uni is None:
        return None
    out: dict[int, str] = {}
    for cp, gid in sorted(uni.items(), reverse=True):
        if gid and 0 <= cp <= 0x10FFFF and not (0xD800 <= cp <= 0xDFFF):
            out[gid] = chr(cp)  # reverse-sorted: smallest cp wins
    return out or None


_TT_GID_UNI_CACHE: dict[bytes, "dict[int, str] | None"] = {}


def _tt_gid_to_unicode_cached(data: bytes) -> "dict[int, str] | None":
    """Digest-memoized _tt_gid_to_unicode — same rationale as
    _TT_CMAP_CACHE: corpora repeat subsets across thousands of docs,
    and keying by sha1 digest (not the blob) keeps long-lived workers
    from pinning megabytes of font bytes."""
    key = hashlib.sha1(data).digest()
    if key in _TT_GID_UNI_CACHE:
        return _TT_GID_UNI_CACHE[key]
    out = _tt_gid_to_unicode(data)
    if len(_TT_GID_UNI_CACHE) >= 256:
        _TT_GID_UNI_CACHE.clear()
    _TT_GID_UNI_CACHE[key] = out
    return out


def _parse_truetype_cmap(data: bytes) -> "_CMap | None":
    key = hashlib.sha1(data).digest()
    if key in _TT_CMAP_CACHE:
        return _TT_CMAP_CACHE[key]
    out = _parse_truetype_cmap_impl(data)
    if len(_TT_CMAP_CACHE) >= 256:
        _TT_CMAP_CACHE.clear()
    _TT_CMAP_CACHE[key] = out
    return out


def _parse_truetype_cmap_impl(data: bytes) -> _CMap | None:
    """Embedded TrueType font program → 1-byte show-code decoder.

    Subtable selection follows what a conforming reader does with a
    simple TrueType font (ISO 32000-1 §9.6.6.4) inverted for text
    extraction:

    - symbolic fonts carry a (3,0) Microsoft Symbol cmap keyed by the
      raw show code (looked up at 0xF000|code first, then code) or a
      (1,0) Mac Roman cmap keyed by the code directly — either gives
      code → GID; unicode then comes from inverting the font's (3,1)
      Windows BMP (or (0,x) Unicode-platform) subtable, GID → the
      smallest code point that reaches it (deterministic inverse);
    - fonts with only a Unicode-platform subtable map nonsymbolically:
      a code decodes as itself exactly when the font actually maps that
      code point (glyph present ⇒ the code means its own unicode).

    Returns None (caller falls back to the default show decoding) when
    there is no cmap table, no usable subtable pair, or the program is
    malformed — per-row degradation, never a crash."""
    subs = _tt_cmap_subtables(data)
    if subs is None:
        return None

    uni = subs.get((3, 1)) or subs.get((0, 3)) or subs.get((0, 4))
    if uni is None:
        uni = next((t for (p, _e), t in subs.items() if p == 0), None)
    sym = subs.get((3, 0))
    mac = subs.get((1, 0))
    if uni is None:
        return None
    mapping: dict[int, str] = {}
    if sym is not None or mac is not None:
        gid_to_uni: dict[int, int] = {}
        for cp, gid in uni.items():
            if gid not in gid_to_uni or cp < gid_to_uni[gid]:
                gid_to_uni[gid] = cp
        for code in range(256):
            if sym is not None:
                gid = sym.get(0xF000 | code) or sym.get(code)
            else:
                gid = mac.get(code)
            if gid:
                cp = gid_to_uni.get(gid)
                if cp is not None:
                    mapping[code] = chr(cp)
    else:
        for code in range(0x20, 256):
            if code in uni:
                mapping[code] = chr(code)
    return _CMap(1, mapping) if mapping else None


# ---------------------------------------------------------------------------
# content-stream text interpreter


# PDFDocEncoding (ISO 32000-1 Annex D.3, Table D.2) deltas vs Latin-1:
# 0x18-0x1F accent modifiers, 0x80-0x9E typographic punctuation +
# ligatures + Latin-extended letters, 0xA0 the euro sign. Bytes the
# table leaves undefined (0x7F, 0x9F, 0xAD) decode leniently as their
# Latin-1 identity — a real crawl's malformed metadata should degrade,
# not error.
_PDFDOC_DELTAS = {
    0x18: "˘", 0x19: "ˇ", 0x1A: "ˆ", 0x1B: "˙",
    0x1C: "˝", 0x1D: "˛", 0x1E: "˚", 0x1F: "˜",
    0x80: "•", 0x81: "†", 0x82: "‡", 0x83: "…",
    0x84: "—", 0x85: "–", 0x86: "ƒ", 0x87: "⁄",
    0x88: "‹", 0x89: "›", 0x8A: "−", 0x8B: "‰",
    0x8C: "„", 0x8D: "“", 0x8E: "”", 0x8F: "‘",
    0x90: "’", 0x91: "‚", 0x92: "™", 0x93: "ﬁ",
    0x94: "ﬂ", 0x95: "Ł", 0x96: "Œ", 0x97: "Š",
    0x98: "Ÿ", 0x99: "Ž", 0x9A: "ı", 0x9B: "ł",
    0x9C: "œ", 0x9D: "š", 0x9E: "ž", 0xA0: "€",
}
_PDFDOC_MAP = str.maketrans({chr(i): s for i, s in _PDFDOC_DELTAS.items()})


def _decode_text(b: bytes) -> str:
    """Spec TEXT-STRING decoding (§7.9.2.2): UTF-16 when BOM-tagged,
    else PDFDocEncoding via the Annex D table. Scope (ADVICE r6): text
    strings live OUTSIDE content streams — /Info values, outlines,
    annotations (surfaced via PdfDocument.info()) — never show strings,
    whose bytes are font codes and decode via _decode_show."""
    if b[:2] == b"\xfe\xff":
        return b[2:].decode("utf-16-be", "replace")
    if b[:2] == b"\xff\xfe":
        return b[2:].decode("utf-16-le", "replace")
    return b.decode("latin-1").translate(_PDFDOC_MAP)


# WinAnsiEncoding deltas vs Latin-1 (cp1252's 0x80-0x9F punctuation
# block): the show-string fallback table. Unencoded simple-font show
# bytes follow the font's built-in encoding, which in real crawls is
# overwhelmingly WinAnsi-like — 0x85 is an ellipsis there, not PDFDoc's
# en-dash (the round-6 accuracy bug on real input). Bytes WinAnsi
# leaves unassigned (0x81/0x8D/0x8F/0x90/0x9D) stay Latin-1 identity.
_SHOW_DELTAS: dict[int, str] = {
    k: v
    for k, v in (base_encoding_map("/WinAnsiEncoding") or {}).items()
    if v != chr(k)
}
_SHOW_MAP = str.maketrans({chr(k): v for k, v in _SHOW_DELTAS.items()})


def _decode_show(b: bytes) -> str:
    """Fallback decoding for SHOW strings whose font offers no decode
    source (no /ToUnicode, no /Encoding, no usable embedded cmap):
    WinAnsi with Latin-1 fallthrough. The BOM checks are a lenient
    heuristic for synthetic/UTF-16-authored content streams (the writer
    twin emits them for non-Latin-1 text); real font codes never start
    with a BOM pair."""
    if b[:2] == b"\xfe\xff":
        return b[2:].decode("utf-16-be", "replace")
    if b[:2] == b"\xff\xfe":
        return b[2:].decode("utf-16-le", "replace")
    return b.decode("latin-1").translate(_SHOW_MAP)


def _parse_inline_image(
    content: bytes, pos: int
) -> tuple[int, dict, int, int]:
    """Inline image (§8.9.7): ``BI <dict entries> ID <payload> EI``,
    with ``pos`` just past the BI keyword. → (resume_pos, params,
    payload_start, payload_end).

    The payload length comes from /L (PDF 2.0's explicit byte count)
    when present and truthful; otherwise the payload ends at the first
    ``EI`` that is PRECEDED by whitespace and FOLLOWED by whitespace /
    a delimiter / EOF — the conforming-reader heuristic. A bare
    ``find(b"EI")`` (the previous behavior) truncates at any payload
    bytes that happen to spell EI and then lexes the rest of the binary
    as operators, which can surface garbage text runs."""
    lex = _Lexer(content, pos)
    params: dict = {}
    key: str | None = None
    n = len(content)
    while True:
        tok = lex.next_token()
        if tok is None:
            return n, params, n, n
        kind, val = tok
        if kind == "kw":
            if val == b"ID":
                break
            if key is not None:  # true/false value
                params[key] = val
                key = None
            continue
        if kind in ("arr_open", "dict_open"):
            depth = 1
            while depth:
                t = lex.next_token()
                if t is None:
                    return n, params, n, n
                if t[0] in ("arr_open", "dict_open"):
                    depth += 1
                elif t[0] in ("arr_close", "dict_close"):
                    depth -= 1
            if key is not None:
                params[key] = None  # composite value — not needed
                key = None
            continue
        if kind == "name" and key is None:
            key = val
        elif key is not None:
            params[key] = val
            key = None
    # exactly one whitespace byte separates ID from the payload
    start = lex.pos + 1 if lex.pos < n and content[lex.pos] in _WS else lex.pos
    ln = params.get("L", params.get("Length"))
    if isinstance(ln, (int, float)) and ln >= 0:
        end = min(start + int(ln), n)
        lx2 = _Lexer(content, end)
        if lx2.next_token() == ("kw", b"EI"):
            return lx2.pos, params, start, end
        # /L lied — fall through to the delimiter scan
    p = start
    while True:
        e = content.find(b"EI", p)
        if e < 0:
            return n, params, start, n
        after = e + 2
        if (e == 0 or content[e - 1] in _WS) and (
            after >= n or content[after] in _WS or content[after : after + 1] in
            (b"/", b"[", b"]", b"<", b">", b"(", b"%")
        ):
            return after, params, start, e
        p = e + 1


def _skip_inline_image(content: bytes, pos: int) -> int:
    return _parse_inline_image(content, pos)[0]


_TEXT_OPS = frozenset(
    b.encode() for b in ("BT", "ET", "Tf", "Td", "TD", "TL", "T*", "Tm", "Tj", "TJ", "'", '"')
)


def _runs_from_content(
    content: bytes,
    fonts: dict[str, _CMap] | None = None,
    xobjs: dict | None = None,
    _depth: int = 0,
) -> list[tuple[float, float, str]]:
    """Interpret text operators → [(y, x, text)] in stream order. When
    ``fonts`` maps the current ``Tf`` resource name to a /ToUnicode CMap,
    show-strings decode through it instead of the Latin-1/UTF-16 default.
    ``xobjs`` (PdfDocument.page_xobjects) lets ``Do`` of a form XObject
    recurse into the form's own content stream — a form without its own
    /Resources inherits the invoking context's fonts/xobjects (the
    deprecated-but-common §7.8.3 shape); image ``Do`` is a no-op for
    text. Depth-capped so inherit-induced cycles terminate."""
    lex = _Lexer(content)
    stack: list = []
    runs: list[tuple[float, float, str]] = []
    in_text = False
    x = y = 0.0
    leading = 0.0
    cur: list[str] | None = None
    cur_xy = (0.0, 0.0)
    cmap: _CMap | None = None

    def decode(b: bytes) -> str:
        return cmap.decode(b) if cmap is not None else _decode_show(b)

    def show(s: str) -> None:
        nonlocal cur, cur_xy
        if not in_text:
            return
        if cur is None or cur_xy != (x, y):
            cur = [s]
            cur_xy = (x, y)
            runs.append((y, x, ""))  # placeholder, patched below via index
            cur_idx[0] = len(runs) - 1
        else:
            cur.append(s)
        runs[cur_idx[0]] = (y, x, "".join(cur))

    cur_idx = [0]

    def newline() -> None:
        nonlocal y, cur
        y -= leading
        cur = None

    while True:
        tok = lex.next_token()
        if tok is None:
            break
        kind, val = tok
        if kind == "kw":
            op = val
            if op == b"BT":
                in_text = True
                x = y = 0.0
                cur = None
            elif op == b"ET":
                in_text = False
                cur = None
            elif op == b"Td" and len(stack) >= 2:
                x += _num(stack[-2])
                y += _num(stack[-1])
                cur = None
            elif op == b"TD" and len(stack) >= 2:
                x += _num(stack[-2])
                ty = _num(stack[-1])
                y += ty
                leading = -ty
                cur = None
            elif op == b"Tm" and len(stack) >= 6:
                x = _num(stack[-2])
                y = _num(stack[-1])
                cur = None
            elif op == b"TL" and stack:
                leading = _num(stack[-1])
            elif op == b"T*":
                newline()
            elif op == b"Tf" and len(stack) >= 2:
                fname = stack[-2]
                cmap = (fonts or {}).get(fname) if isinstance(fname, str) else None
            elif op == b"Tj" and stack:
                if isinstance(stack[-1], bytes):
                    show(decode(stack[-1]))
            elif op == b"'" and stack:
                newline()
                if isinstance(stack[-1], bytes):
                    show(decode(stack[-1]))
            elif op == b'"' and len(stack) >= 3:
                newline()
                if isinstance(stack[-1], bytes):
                    show(decode(stack[-1]))
            elif op == b"TJ" and stack and isinstance(stack[-1], list):
                parts: list[str] = []
                for el in stack[-1]:
                    if isinstance(el, bytes):
                        parts.append(decode(el))
                    elif isinstance(el, (int, float)) and el <= -SPACE_KERN:
                        parts.append(" ")
                show("".join(parts))
            elif op == b"Do" and stack:
                nm = stack[-1]
                xo = (
                    xobjs.get(nm)
                    if xobjs is not None and isinstance(nm, str)
                    else None
                )
                if (
                    xo is not None
                    and xo[0] == "form"
                    and _depth < PdfDocument._XOBJ_MAX_DEPTH
                ):
                    _, _, sub_content, sub_fonts, sub_xobjs = xo
                    runs.extend(
                        _runs_from_content(
                            sub_content,
                            fonts if sub_fonts is None else sub_fonts,
                            xobjs if sub_xobjs is None else sub_xobjs,
                            _depth + 1,
                        )
                    )
                    cur = None  # never merge runs across a Do boundary
            elif op == b"BI":
                lex.pos = _skip_inline_image(content, lex.pos)
            stack.clear()
        elif kind == "arr_open":
            # array operand (TJ) — parse inline, refs impossible in content
            arr: list = []
            depth = 1
            while depth:
                t = lex.next_token()
                if t is None:
                    break
                if t[0] == "arr_close":
                    depth -= 1
                elif t[0] == "arr_open":
                    depth += 1
                elif depth == 1 and t[0] in ("num", "str"):
                    arr.append(t[1])
            stack.append(arr)
        elif kind == "dict_open":
            depth = 1
            while depth:
                t = lex.next_token()
                if t is None:
                    break
                if t[0] == "dict_close":
                    depth -= 1
                elif t[0] == "dict_open":
                    depth += 1
            stack.append({})
        else:
            stack.append(val)
    # empty-text runs are kept: a show op marks a line even when its
    # string is empty (blank source lines round-trip through assembly)
    return runs


def _num(v) -> float:
    return float(v) if isinstance(v, (int, float)) else 0.0


# ---------------------------------------------------------------------------
# public API


def extract_pdf_runs(data: bytes) -> list[tuple[int, float, float, str]]:
    """[(page_index, y, x, text)] — every text run with its layout origin."""
    doc = PdfDocument(data)
    out = []
    for i, page in enumerate(doc.pages()):
        fonts = doc.page_fonts(page)
        xobjs = doc.page_xobjects(page)
        for y, x, s in _runs_from_content(doc.page_content(page), fonts, xobjs):
            out.append((i, y, x, s))
    return out


def _assemble(run_list: list[tuple[float, float, str]]) -> str:
    """Group runs into visual lines (y within Y_TOL), top-to-bottom, runs
    left-to-right within a line. Deterministic for ties (stable sort)."""
    if not run_list:
        return ""
    by_y = sorted(run_list, key=lambda r: -r[0])
    lines: list[tuple[float, list[tuple[float, str]]]] = []
    for y, x, s in by_y:
        if lines and abs(lines[-1][0] - y) <= Y_TOL:
            lines[-1][1].append((x, s))
        else:
            lines.append((y, [(x, s)]))
    out_lines = []
    for _, runs in lines:
        runs.sort(key=lambda r: r[0])
        out_lines.append("".join(s for _, s in runs))
    return "\n".join(out_lines)


def extract_pdf_text(data: bytes) -> str:
    """Full-document text in reading order; pages joined by a newline."""
    doc = PdfDocument(data)
    pages = []
    for page in doc.pages():
        fonts = doc.page_fonts(page)
        xobjs = doc.page_xobjects(page)
        pages.append(
            _assemble(_runs_from_content(doc.page_content(page), fonts, xobjs))
        )
    return "\n".join(pages)


# inline-image abbreviated names (ISO 32000-1 Tables 93/94): the BI
# dict may use short keys and short filter/colorspace names; the
# inventory reports the canonical long forms so XObject and inline rows
# aggregate together.
_INLINE_FILTER_ABBR = {
    "AHx": "ASCIIHexDecode", "A85": "ASCII85Decode", "LZW": "LZWDecode",
    "Fl": "FlateDecode", "RL": "RunLengthDecode", "CCF": "CCITTFaxDecode",
    "DCT": "DCTDecode",
}
_INLINE_CS_ABBR = {"G": "DeviceGray", "RGB": "DeviceRGB", "CMYK": "DeviceCMYK", "I": "Indexed"}


def _inline_images_from_content(content: bytes) -> list[tuple[dict, int]]:
    """[(BI-dict params, payload_byte_count, payload_bytes)] for every inline image in
    one content stream, in stream order. Strings/arrays tokenize as
    units, so payload-lookalike bytes inside them never false-trigger;
    the payload itself is skipped by _parse_inline_image's /L-or-
    delimited-EI logic."""
    lex = _Lexer(content)
    out: list[tuple[dict, int]] = []
    while True:
        tok = lex.next_token()
        if tok is None:
            return out
        if tok == ("kw", b"BI"):
            resume, params, s, e = _parse_inline_image(content, lex.pos)
            out.append((params, max(0, e - s), content[s:e]))
            lex.pos = resume


def _codec_truth(filt: str, raw: bytes | None, parms=None):
    """(codec_w, codec_h, codec_nc, codec_progressive) — the JPEG
    payload's OWN frame-header facts for a stream whose filter chain
    ENDS in /DCTDecode: a pure DCT stream parses directly; a chained
    one (e.g. Flate+DCT — generators recompress) has its prefix
    filters applied first via the ordinary filter machinery, bounded
    by the stream's own size. Unsupported prefix filters or a
    non-JPEG payload degrade to None-columns, never an error row —
    wire truth is best-effort metadata. The dict's claims and the
    codec's facts disagree in real crawls; the inventory reports
    both."""
    if not raw or not filt:
        return (None, None, None, None)
    chain = filt.split("+")
    if chain[-1] != "DCTDecode":
        return (None, None, None, None)
    data = raw
    if len(chain) > 1:
        prefix = ["/" + f for f in chain[:-1]]
        pm = parms if isinstance(parms, list) else [parms] * len(prefix)
        try:
            data = _apply_filters(data, prefix, pm[: len(prefix)])
        except Exception:
            return (None, None, None, None)
    sof = jpeg_sof(data)
    return sof if sof is not None else (None, None, None, None)


def pdf_image_stats(
    data: bytes,
) -> list[tuple]:
    """Per-image inventory WITHOUT decoding pixels: [(page_index,
    resource_name, width, height, bits_per_component, filter,
    colorspace, raw_stream_bytes, codec_w, codec_h, codec_nc,
    codec_progressive)] — the last four from the JPEG payload's own
    SOF header for pure-/DCTDecode images (kernel/jpegmeta.py), None for every /Subtype /Image XObject
    reachable from each page's resources, including images inside
    (nested) form XObjects, PLUS every inline image (§8.9.7
    ``BI..ID..EI``) in the page's and its forms' content streams —
    named ``BI<j>`` in per-page encounter order, abbreviated dict keys
    and filter/colorspace names expanded to their canonical long forms.
    Metadata comes from the image dict only —
    the sample stream stays encoded (DCT/JPX payloads need no codec for
    corpus analytics: format mix, pixel volume, bytes-per-page). Images
    shared by name at several nesting levels are reported once per
    distinct object per page; pages sharing one image each report it."""

    def name_of(v) -> str:
        return v.lstrip("/") if isinstance(v, str) else ""

    doc = PdfDocument(data)
    out = []
    for i, page in enumerate(doc.pages()):
        seen: set[int] = set()

        def walk(xobjs: dict, page_idx: int = i, seen_nums: set = seen) -> None:
            for name, xo in sorted(xobjs.items()):
                if xo[0] == "image":
                    _, num, d, raw_len, raw = xo
                    if num in seen_nums:
                        continue
                    seen_nums.add(num)
                    w = d.get("/Width")
                    h = d.get("/Height")
                    bpc = d.get("/BitsPerComponent")
                    filt = doc.resolve(d.get("/Filter"))
                    if isinstance(filt, list):
                        filt = "+".join(name_of(f) for f in filt)
                    else:
                        filt = name_of(filt)
                    cs = doc.resolve(d.get("/ColorSpace"))
                    if isinstance(cs, list):
                        cs = name_of(cs[0]) if cs else ""
                    else:
                        cs = name_of(cs)
                    out.append(
                        (
                            page_idx,
                            name,
                            int(w) if isinstance(w, (int, float)) else 0,
                            int(h) if isinstance(h, (int, float)) else 0,
                            int(bpc) if isinstance(bpc, (int, float)) else 0,
                            filt,
                            cs,
                            raw_len,
                            *_codec_truth(
                                filt, raw, doc.resolve(d.get("/DecodeParms"))
                            ),
                        )
                    )
                elif xo[0] == "form" and xo[4]:
                    walk(xo[4], page_idx, seen_nums)

        xobjs = doc.page_xobjects(page)
        walk(xobjs)

        # inline images: page content first, then form content streams
        # (sorted resource order, nested), once per distinct form object
        contents: list[bytes] = [doc.page_content(page)]
        seen_forms: set[int] = set()

        def collect_forms(xo_map: dict) -> None:
            for _name, xo in sorted(xo_map.items()):
                if xo[0] == "form" and xo[1] not in seen_forms:
                    seen_forms.add(xo[1])
                    contents.append(xo[2])
                    if xo[4]:
                        collect_forms(xo[4])

        collect_forms(xobjs)
        j = 0
        for blob in contents:
            for params, n_payload, payload in _inline_images_from_content(blob):
                w = params.get("W", params.get("Width"))
                h = params.get("H", params.get("Height"))
                bpc = params.get("BPC", params.get("BitsPerComponent"))
                filt = params.get("F", params.get("Filter")) or ""
                cs = params.get("CS", params.get("ColorSpace")) or ""
                out.append(
                    (
                        i,
                        "BI%d" % j,
                        int(w) if isinstance(w, (int, float)) else 0,
                        int(h) if isinstance(h, (int, float)) else 0,
                        int(bpc) if isinstance(bpc, (int, float)) else 0,
                        _INLINE_FILTER_ABBR.get(filt, filt) if isinstance(filt, str) else "",
                        _INLINE_CS_ABBR.get(cs, cs) if isinstance(cs, str) else "",
                        n_payload,
                        *_codec_truth(
                            _INLINE_FILTER_ABBR.get(filt, filt)
                            if isinstance(filt, str) else "",
                            payload,
                        ),
                    )
                )
                j += 1
    return out


def _ccitt_image(doc, d: dict, parms, payload: bytes, parms_is_list: bool,
                 max_pixels: int):
    """Decode a /CCITTFaxDecode image stream → (planes (h,w,1) uint8 of
    the FILTER OUTPUT BITS, width, height, 1). Wire semantics per ISO
    32000-1 §7.4.6: /K < 0 = pure G4 (the only mode scanned-PDF
    producers emit and the only one supported — G3 raises), /Columns
    (default 1728), /Rows (falls back to /Height), /BlackIs1 (default
    false: 0 bits are BLACK, so the codec's ink bits invert),
    /EncodedByteAlign. The bits are reported as decoded (0/1), before
    /Decode arrays or colorspace mapping — codec facts, not dict
    claims."""
    import numpy as np  # noqa: PLC0415

    from .ccittcodec import decode_g4  # noqa: PLC0415

    p = parms[-1] if parms_is_list and isinstance(parms, list) else parms
    p = doc.resolve(p) if p is not None else {}
    if not isinstance(p, dict):
        p = {}
    k = doc.resolve(p.get("/K", 0)) or 0
    if k >= 0:
        raise PdfError("CCITT /K >= 0 (G3) unsupported; G4 only")
    columns = int(doc.resolve(p.get("/Columns", 1728)) or 1728)
    rows = doc.resolve(p.get("/Rows"))
    if rows is None:
        rows = doc.resolve(d.get("/Height"))
    rows = int(rows) if rows else None
    black_is_1 = doc.resolve(p.get("/BlackIs1", False)) is True
    align = doc.resolve(p.get("/EncodedByteAlign", False)) is True
    ink = decode_g4(
        payload, columns, rows=rows,
        encoded_byte_align=align, max_pixels=max_pixels,
    )
    bits = ink if black_is_1 else (1 - ink).astype(np.uint8)
    return bits[:, :, None], columns, ink.shape[0], 1


def pdf_decode_image_stats(data: bytes, max_pixels: int = 1 << 24) -> list[tuple]:
    """REAL pixel decode of every image XObject whose filter chain ends
    in /DCTDecode (prefix filters applied first, same machinery as
    ``_codec_truth``): [(page_index, resource_name, width, height,
    n_channels, pixel_sum, pixel_min, pixel_max, status)]. Dimensions
    and stats are the CODEC's facts (raw component planes, no color
    transform — deterministic corpora keep their closed forms), not the
    dict's claims. Non-DCT images yield ``status='skip:<filter>'`` rows
    with NULL stats; malformed/unsupported payloads (progressive,
    truncated, hostile dims past ``max_pixels``) degrade to
    ``status='error:…'`` rows — the straggler/poison budget, same
    policy as the extraction tier. Walks nested form XObjects like
    ``pdf_image_stats``; under the §7.6 encryption variants the stream
    bytes arrive decrypted, so this oracles decode-under-encryption.
    The reference repo has no image/PDF surface (sax-wasm is an XML
    tokenizer, ``/root/reference/src/sax/parser.rs:1``); this serves
    the assignment's multimodal tier."""
    import numpy as np  # noqa: PLC0415

    from .jpegcodec import decode_jpeg  # noqa: PLC0415

    def name_of(v) -> str:
        return v.lstrip("/") if isinstance(v, str) else ""

    doc = PdfDocument(data)
    out = []
    for i, page in enumerate(doc.pages()):
        seen: set[int] = set()

        def walk(xobjs: dict, page_idx: int = i, seen_nums: set = seen) -> None:
            for name, xo in sorted(xobjs.items()):
                if xo[0] == "image":
                    _, num, d, _raw_len, raw = xo
                    if num in seen_nums:
                        continue
                    seen_nums.add(num)
                    filt = doc.resolve(d.get("/Filter"))
                    if isinstance(filt, list):
                        filt = "+".join(name_of(f) for f in filt)
                    else:
                        filt = name_of(filt)
                    chain = filt.split("+") if filt else []
                    if not chain or chain[-1] not in (
                        "DCTDecode", "CCITTFaxDecode"
                    ):
                        out.append(
                            (page_idx, name, None, None, None, None, None,
                             None, "skip:%s" % filt)
                        )
                        continue
                    payload = raw or b""
                    try:
                        parms = doc.resolve(d.get("/DecodeParms"))
                        if len(chain) > 1:
                            prefix = ["/" + f for f in chain[:-1]]
                            pm = (
                                parms if isinstance(parms, list)
                                else [parms] * len(prefix)
                            )
                            payload = _apply_filters(
                                payload, prefix, pm[: len(prefix)]
                            )
                        if chain[-1] == "CCITTFaxDecode":
                            planes, wpx, hpx, ncomp = _ccitt_image(
                                doc, d, parms, payload,
                                isinstance(parms, list), max_pixels,
                            )
                        else:
                            img = decode_jpeg(payload, max_pixels=max_pixels)
                            planes, wpx, hpx, ncomp = (
                                img.planes, img.width, img.height,
                                img.n_components,
                            )
                    except Exception as e:  # codec / filter failures
                        out.append(
                            (page_idx, name, None, None, None, None, None,
                             None, "error:%s" % e)
                        )
                        continue
                    px = planes  # r8: sum(dtype=int64) exact, no copy
                    out.append(
                        (page_idx, name, wpx, hpx,
                         ncomp, int(px.sum(dtype=np.int64)), int(px.min()),
                         int(px.max()), "ok")
                    )
                elif xo[0] == "form" and xo[4]:
                    walk(xo[4], page_idx, seen_nums)

        walk(doc.page_xobjects(page))
    return out
