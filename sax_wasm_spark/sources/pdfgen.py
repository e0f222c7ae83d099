"""Deterministic synthetic PDF writer (test/bench corpus only).

``build_pdf(text, variant)`` renders ``text`` into a small but fully
valid PDF 1.4 file whose text round-trips byte-for-byte through
:mod:`sax_wasm_spark.kernel.pdftext` — the closed-form oracle the
``pdf_extract_roundtrip`` query and the pytest suite rely on
(``extract_pdf_text(build_pdf(t, v)) == t`` for any ``t`` free of
control characters other than ``\\n``, any variant).

Variants exercise distinct parser surfaces so one query covers them all:

* 0 — literal-string ``Tj`` per line, uncompressed content stream.
* 1 — same content FlateDecode-compressed, indirect ``/Length``.
* 2 — ``TJ`` arrays: words as alternating literal/hex strings with
  ``-250`` kerning adjustments standing in for inter-word spaces,
  compressed.
* 3 — two content streams (``/Contents`` as an array) split mid-page +
  an incremental-update tail that redefines the info object (exercises
  last-definition-wins).
* 4 — LZWDecode-compressed content stream (``lzw_encode`` below is the
  exact inverse of the kernel's from-scratch decoder; round-trip
  property + the ISO 32000-1 worked example in tests/test_pdf.py).
* 5 — a /ToUnicode CID-style font: every show string is 2-byte codes
  from a deterministic per-document code assignment, mapped back by a
  CMap that exercises bfchar, incrementing bfrange, AND array-form
  bfrange (consecutive charset runs become ranges, pairs become array
  ranges, singletons become bfchars).
* 6 — PDF 1.5 object streams: EVERY non-stream object (catalog, page
  tree, pages, font) lives inside one Flate-compressed ``/Type /ObjStm``
  — the modern-writer layout where a top-level ``N G obj`` scan finds
  no document structure at all.
* 7 — a simple font with an ``/Encoding /Differences`` array: every
  show string is 1-byte codes mapped back through Adobe-Glyph-List
  names (table names for ASCII/Latin, ``uniXXXX``/``uXXXXX`` for the
  rest) — the subset-font path of real scanned/office PDFs. Falls back
  to variant-0 literal strings when a document's charset exceeds the
  224 assignable codes.
* 9 — RC4-encrypted (ISO 32000-1 §7.6 standard security handler) with
  an EMPTY user password and owner password ``saxgen-owner`` — the
  "owner-locked" shape ubiquitous in real crawls. Revision cycles by
  text length: R2 (/V 1, 40-bit) and R3 (/V 2, 128-bit). Content
  streams are Flate-compressed THEN encrypted (matching write order:
  filter, then encrypt); an /Info object carries an encrypted literal
  string so string decryption is exercised, and the trailer gains
  /Encrypt + a deterministic md5-of-text /ID.
* 10 — AES-encrypted via crypt filters: /V 4 /R 4 /AESV2
  (AES-128-CBC, per-object md5+"sAlT" keys) for most texts,
  /V 5 /R 6 /AESV3 (ISO 32000-2 AES-256: Hash-2B salted password
  digests, /UE-wrapped file key, /Perms block) when
  len(text) % 16 == 1 — both with an
  empty user password, Flate-then-encrypt streams (IV ‖ CBC, PKCS#7),
  and an encrypted /Info string. The AES core is the from-scratch
  FIPS-197 implementation in kernel/aescipher.py.
* 8 — a simple font with an Annex D base-encoding NAME
  (``/WinAnsiEncoding`` / ``/MacRomanEncoding`` / ``/StandardEncoding``,
  cycled deterministically by text length): show strings are 1-byte
  codes under that table — the plain office-PDF path where the bytes
  are NOT latin-1 (WinAnsi's 0x80-0x9F punctuation, MacRoman's whole
  high range, Standard's quote remaps). Falls back to variant-0
  literal strings when the charset is not representable.
* 11 — an embedded TrueType subset with NO /ToUnicode and NO
  /Encoding: the text is recoverable only through the font program's
  own ``cmap`` table (kernel twin: ``_parse_truetype_cmap``). Shape
  cycles by text length — even: a SYMBOLIC subset whose show codes are
  arbitrary 1-byte assignments, carried by a (3,0) Microsoft-Symbol
  format-6 subtable at ``0xF000|code`` plus a (3,1) Windows-BMP
  format-4 subtable the reader inverts GID→unicode; odd: a
  NONSYMBOLIC subset with only the (3,1) table, where a show code
  decodes as itself exactly when the font maps that code point. The
  format-4 builder alternates idDelta and idRangeOffset/glyphIdArray
  segments so both reader branches are exercised per document. Falls
  back to variant-0 literal strings when the charset doesn't fit
  (non-BMP chars; >224 chars symbolic; non-Latin-1 nonsymbolic).
* 12 — an embedded bare-CFF (Type1C) subset via /FontFile3, again with
  NO /ToUnicode and NO /Encoding dict: codes resolve through the CFF
  program's encoding table (format 0 explicit array for even text
  lengths, format 1 contiguous range for odd), charset (custom SIDs
  391+), and String INDEX glyph names (AGL table names / uniXXXX /
  uXXXXX — so CJK and non-BMP text exercises the custom-string path).
  Falls back to variant-0 literal strings past 224 distinct chars.
* 13 — form XObjects: the text splits across THREE content streams —
  page content, a Flate-compressed /Form XObject with its OWN
  /Resources, and a second form nested INSIDE the first with NO
  /Resources (inheriting the invoking context's — the deprecated
  §7.8.3 shape real files still use). Interleaved line thirds, so a
  correct extraction REQUIRES recursing both ``Do`` levels and merging
  runs by layout.
* 14 — a Type0 /Identity-H composite font with NO /ToUnicode (the
  CJK/office CID shape): show strings are 2-byte CIDs; the descendant
  /CIDFontType2 carries an embedded TrueType program whose (3,1) cmap
  is the only unicode source, reached through /CIDToGIDMap (kernel
  twin: ``PdfDocument._composite_font_cmap``). Shape cycles by text
  length — even: ``/CIDToGIDMap /Identity`` (CID == GID); odd: a
  binary uint16 map stream with CIDs spread to 2·(index+1) so the
  stream path is distinguishable from identity. Falls back to
  variant-0 literal strings when the charset leaves
  BMP-minus-surrogates.

Non-Latin-1 text is emitted as BOM-tagged UTF-16BE hex strings (the
spec's text-string encoding), so any Unicode round-trips.

Layout constants match the extractor's assembly rules: one text line per
source line, leading 14 pt from y=720, x=72. ``two_column=True`` writes
the SECOND half of the lines first at x=320, then the first half at
x=72 — stream order deliberately scrambled so only a layout-aware
reader reconstructs the original line order.
"""

from __future__ import annotations

import re
import struct
import zlib

from ..kernel.pdftext import (  # noqa: F401  (doc cross-link)
    _AGL,
    _SHOW_DELTAS,
    SPACE_KERN,
)

# unicode char -> canonical glyph name (first AGL entry wins)
_AGL_REV: dict[str, str] = {}
for _k, _v in _AGL.items():
    if len(_v) == 1 and _v not in _AGL_REV:
        _AGL_REV[_v] = _k
del _k, _v


def _glyph_name(ch: str) -> bytes | None:
    name = _AGL_REV.get(ch)
    if name is not None:
        return b"/" + name.encode("ascii")
    cp = ord(ch)
    if 0xD800 <= cp <= 0xDFFF:
        return None
    if cp <= 0xFFFF:
        return b"/uni%04X" % cp
    return b"/u%05X" % cp


def _diff_codes(text: str) -> dict[str, int] | None:
    """char -> 1-byte code (32..255) for variant 7; None when the
    charset does not fit (caller falls back to literal strings)."""
    charset = sorted(set(text) - {"\n"})
    if len(charset) > 224:
        return None
    if any(_glyph_name(c) is None for c in charset):
        return None
    return {c: 32 + i for i, c in enumerate(charset)}


def _differences_array(codes: dict[str, int]) -> bytes:
    """/Differences with a restart integer every 16 names (codes are
    consecutive, so the restarts are redundant-but-legal — they exercise
    the parser's code-reset handling)."""
    items = sorted(codes.items(), key=lambda kv: kv[1])
    parts: list[bytes] = []
    for i, (ch, code) in enumerate(items):
        if i % 16 == 0:
            parts.append(b"%d" % code)
        parts.append(_glyph_name(ch))
    return b"[ " + b" ".join(parts) + b" ]"


_X0, _X1 = 72, 320
_Y0, _LEAD = 720.0, 14.0

N_VARIANTS = 15

_BASE_ENCODINGS = (b"WinAnsiEncoding", b"MacRomanEncoding", b"StandardEncoding")


def _base_enc_codes(text: str, enc_name: bytes) -> dict[str, int] | None:
    """char → 1-byte code under an Annex D base encoding (reverse of
    kernel.pdftext.base_encoding_map; lowest code wins for chars the
    table reaches twice); None when any char is unrepresentable
    (caller falls back to literal strings)."""
    from ..kernel.pdftext import base_encoding_map  # noqa: PLC0415

    fwd = base_encoding_map(enc_name.decode())
    rev: dict[str, int] = {}
    for code in sorted(fwd):
        rev.setdefault(fwd[code], code)
    charset = set(text) - {"\n"}
    if not charset <= rev.keys():
        return None
    return {c: rev[c] for c in charset}


# -- minimal TrueType font programs (variant 11: subset fonts that ship
# no /ToUnicode and no /Encoding — the text is only recoverable through
# the font program's own 'cmap' table; reader twin:
# kernel.pdftext._parse_truetype_cmap). The blobs carry just the 'cmap'
# table: extraction never touches glyph outlines, and lenient real-world
# parsers (like the kernel) ignore the directory checksums.


def _tt_format4(mapping: dict[int, int]) -> bytes:
    """cmap subtable format 4 for a cp→gid mapping. Contiguous-cp runs
    with consecutive gids become segments; even-indexed segments take
    the idDelta path, odd-indexed the idRangeOffset/glyphIdArray path,
    so one document exercises both reader branches (including the
    spec's offset-relative-to-the-idRangeOffset-word quirk)."""
    cps = sorted(mapping)
    runs: list[list[int]] = []
    for cp in cps:
        if runs and cp == runs[-1][1] + 1 and mapping[cp] == mapping[cp - 1] + 1:
            runs[-1][1] = cp
        else:
            runs.append([cp, cp])
    segs = len(runs) + 1  # + the required 0xFFFF terminator
    ends: list[int] = []
    starts: list[int] = []
    deltas: list[int] = []
    range_offs: list[int] = []
    glyph_array: list[int] = []
    for i, (s, e) in enumerate(runs):
        ends.append(e)
        starts.append(s)
        if i % 2 == 0:
            deltas.append((mapping[s] - s) & 0xFFFF)
            range_offs.append(0)
        else:
            deltas.append(0)
            # reader: base = ro_off + 2*i + range_offs[i]; the glyph
            # array begins at ro_off + 2*segs, so offset past the
            # remaining idRangeOffset words plus the array prefix
            range_offs.append(2 * (segs - i) + 2 * len(glyph_array))
            glyph_array.extend(mapping[c] for c in range(s, e + 1))
    ends.append(0xFFFF)
    starts.append(0xFFFF)
    deltas.append(1)
    range_offs.append(0)
    body = (
        struct.pack(">%dH" % segs, *ends)
        + b"\x00\x00"
        + struct.pack(">%dH" % segs, *starts)
        + struct.pack(
            ">%dh" % segs,
            *[d - 0x10000 if d > 0x7FFF else d for d in deltas],
        )
        + struct.pack(">%dH" % segs, *range_offs)
        + struct.pack(">%dH" % len(glyph_array), *glyph_array)
    )
    sel = max(segs.bit_length() - 1, 0)
    search = 2 * (1 << sel)
    return (
        struct.pack(">7H", 4, 14 + len(body), 0, 2 * segs, search, sel, 2 * segs - search)
        + body
    )


def _tt_format6(first: int, gids: list[int]) -> bytes:
    """cmap subtable format 6: a trimmed gid array starting at ``first``."""
    return struct.pack(
        ">5H", 6, 10 + 2 * len(gids), 0, first, len(gids)
    ) + struct.pack(">%dH" % len(gids), *gids)


def _truetype_blob(subtables: list[tuple[int, int, bytes]]) -> bytes:
    """One-table sfnt wrapping a 'cmap' with the given (platformID,
    encodingID, subtable-bytes) records."""
    n = len(subtables)
    recs = b""
    bodies = b""
    off = 4 + 8 * n
    for plat, enc, body in subtables:
        recs += struct.pack(">2HI", plat, enc, off)
        bodies += body
        off += len(body)
    cmap = struct.pack(">2H", 0, n) + recs + bodies
    return (
        struct.pack(">I4H", 0x00010000, 1, 16, 0, 0)
        + struct.pack(">4s3I", b"cmap", 0, 28, len(cmap))
        + cmap
    )


# -- minimal bare-CFF font programs (variant 12: /FontFile3 Type1C
# subsets with no /ToUnicode and no /Encoding dict — text is only
# recoverable through the program's charset + encoding tables; reader
# twin: kernel.pdftext._parse_cff_encoding)


def _cff_index(items: list[bytes]) -> bytes:
    """CFF INDEX with offSize picked to fit the payload."""
    if not items:
        return struct.pack(">H", 0)
    total = sum(map(len, items)) + 1
    off_size = 1 if total <= 0xFF else 2 if total <= 0xFFFF else 3
    offs = [1]
    for it in items:
        offs.append(offs[-1] + len(it))
    ob = b"".join(o.to_bytes(off_size, "big") for o in offs)
    return struct.pack(">HB", len(items), off_size) + ob + b"".join(items)


def _cff_font(text: str, range_encoding: bool) -> tuple[dict[str, int], bytes] | None:
    """(char → 1-byte show code, bare-CFF program) for variant 12, or
    None when the charset doesn't fit. Every glyph name goes through
    the String INDEX as a custom SID (391+i) — AGL table names for
    Latin, uniXXXX/uXXXXX for the rest, exactly the /Differences name
    vocabulary — so the reader's SID→string→AGL chain is exercised on
    every document. ``range_encoding`` picks encoding format 1 (one
    contiguous range) over format 0 (explicit code array)."""
    charset = sorted(set(text) - {"\n"})
    if not charset or len(charset) > 224:
        return None
    names = []
    for c in charset:
        n = _glyph_name(c)
        if n is None:
            return None
        names.append(n.lstrip(b"/"))
    codes = {c: 32 + i for i, c in enumerate(charset)}
    n_glyphs = len(charset) + 1  # + .notdef

    header = bytes([1, 0, 4, 1])
    name_idx = _cff_index([b"SaxGenCFF"])
    string_idx = _cff_index(names)  # SIDs 391..391+n-1
    gsubr_idx = _cff_index([])
    cs_idx = _cff_index([b"\x0e"] * n_glyphs)  # endchar stubs
    # charset format 0: GID i+1 -> SID 391+i
    charset_tbl = b"\x00" + b"".join(
        struct.pack(">H", 391 + i) for i in range(len(charset))
    )
    if range_encoding:
        enc_tbl = bytes([1, 1, 32, len(charset) - 1])
    else:
        enc_tbl = bytes([0, len(charset)]) + bytes(range(32, 32 + len(charset)))

    def top_dict(cs: int, ch: int, en: int) -> bytes:
        def op(v: int) -> bytes:
            return b"\x1d" + struct.pack(">i", v)  # fixed-width int32

        return _cff_index(
            [op(ch) + b"\x0f" + op(en) + b"\x10" + op(cs) + b"\x11"]
        )

    pre = (
        len(header) + len(name_idx) + len(top_dict(0, 0, 0))
        + len(string_idx) + len(gsubr_idx)
    )
    ch_off = pre
    en_off = ch_off + len(charset_tbl)
    cs_off = en_off + len(enc_tbl)
    blob = (
        header + name_idx + top_dict(cs_off, ch_off, en_off)
        + string_idx + gsubr_idx + charset_tbl + enc_tbl + cs_idx
    )
    return codes, blob


def _relength(sd: bytes, n: int) -> bytes:
    """Rewrite a stream dict's direct /Length after encryption changed
    the payload size, preserving every other entry (image dicts must
    keep /Subtype /Width /Filter …). Only dicts with a literal length
    pass through here — variant 1's indirect /Length is never
    combined with the encrypting variants."""
    return re.sub(rb"/Length \d+", b"/Length %d" % n, sd, count=1)


_IMG_FILTERS = (b"DCTDecode", b"FlateDecode", b"CCITTFaxDecode", b"JPXDecode")
_IMG_SPACES = (b"DeviceRGB", b"DeviceGray", b"DeviceCMYK")


def _image_params(
    text_len: int, k: int, inline: bool = False
) -> tuple[int, int, int, bytes, bytes, bytes]:
    """(width, height, bpc, filter, colorspace, payload) for per-page
    image ``k`` — every metadata field is a closed form of (text_len,
    k) so the image inventory query's DuckDB oracle reproduces the
    result without parsing a byte of PDF. Non-DCT payloads are
    deterministic junk (the inventory reports metadata + raw byte
    count and never decodes samples); /DCTDecode XObject payloads are
    a minimal REAL JPEG (kernel/jpegmeta.synth_jpeg_header — SOI +
    SOFn + SOS + entropy + EOI) whose frame header restates the same
    closed-form dims, n_components from the colorspace, and
    progressive iff ``text_len`` is odd — so the reader's codec-truth
    columns have a closed SQL form too (total bytes =
    22 + 5*nc + 16 + (w*h)%191). Inline images pin /CCF and keep the
    junk payload regardless of k."""
    import hashlib  # noqa: PLC0415

    from ..kernel.jpegmeta import synth_jpeg_header  # noqa: PLC0415

    w = 64 + (text_len * 7 + k * 13) % 512
    h = 36 + (text_len * 11 + k * 17) % 512
    bpc = 1 if k % 3 == 1 else 8
    filt = _IMG_FILTERS[k % 4]
    cs = _IMG_SPACES[k % 3]
    seed = hashlib.sha256(b"img:%d:%d" % (text_len, k)).digest()
    if filt == b"DCTDecode" and not inline:
        nc = {b"DeviceRGB": 3, b"DeviceGray": 1, b"DeviceCMYK": 4}[cs]
        e = 16 + (w * h) % 191
        entropy = (seed * (e // 32 + 1))[:e]
        payload = synth_jpeg_header(w, h, nc, text_len % 2 == 1, entropy)
        return w, h, bpc, filt, cs, payload
    n_bytes = 32 + (w * h) % 191
    payload = (seed * (n_bytes // 32 + 1))[:n_bytes]
    return w, h, bpc, filt, cs, payload


def _image_xobject(text_len: int, k: int) -> tuple[bytes, bytes]:
    """(stream dict, raw payload) for per-page image XObject ``k``."""
    w, h, bpc, filt, cs, payload = _image_params(text_len, k)
    sd = (
        b"<< /Type /XObject /Subtype /Image /Width %d /Height %d"
        b" /BitsPerComponent %d /ColorSpace /%s /Filter /%s /Length %d >>"
        % (w, h, bpc, cs, filt, len(payload))
    )
    return sd, payload


def _real_image_xobject(text_len: int, k: int) -> tuple[bytes, bytes]:
    """(stream dict, payload) for DECODABLE image XObject ``k`` — a
    real baseline JPEG from the imagegen closed forms keyed on
    ``(text_len, k)`` (grayscale 4:4:4 / RGB 4:4:4 + restarts /
    RGB 4:2:0 cycling by k%3, tiny block-grid dims, bit-exact at
    quant=1), so the pixel-decode roundtrip (q71) has a pure-SQL
    oracle THROUGH the PDF container — incl. the encrypting variants,
    which encrypt the JPEG payload like any other stream. Distinct
    ``/Rm<k>`` names keep these apart from the metadata-only ``/Im<k>``
    synth images (whose n_bytes closed form q58 depends on)."""
    from .imagegen import build_jpeg, jpeg_geometry  # noqa: PLC0415

    mode, w, h, nc = jpeg_geometry(text_len, k)
    payload = build_jpeg(text_len, k)
    cs = b"DeviceGray" if nc == 1 else b"DeviceRGB"
    sd = (
        b"<< /Type /XObject /Subtype /Image /Width %d /Height %d"
        b" /BitsPerComponent 8 /ColorSpace /%s /Filter /DCTDecode"
        b" /Length %d >>" % (w, h, cs, len(payload))
    )
    return sd, payload


def _inline_image_op(text_len: int, k: int) -> bytes:
    """A ``BI..ID..EI`` content-stream operator for image ``k``
    (§8.9.7): abbreviated dict keys and names (Table 93/94) with /CCF —
    inline images may not use JPXDecode, so the filter pins to
    CCITTFaxDecode — and an explicit /L so the reader's exact-length
    path (not the delimited-EI scan) carries arbitrary binary payloads.
    Same closed-form dims/colorspace/payload as the XObject twin."""
    w, h, bpc, _filt, cs, payload = _image_params(text_len, k, inline=True)
    abbr_cs = {b"DeviceRGB": b"RGB", b"DeviceGray": b"G", b"DeviceCMYK": b"CMYK"}[cs]
    return (
        b"BI /W %d /H %d /BPC %d /CS /%s /F /CCF /L %d ID "
        % (w, h, bpc, abbr_cs, len(payload))
    ) + payload + b" EI"


def _truetype_font(
    text: str, symbolic: bool
) -> tuple[dict[str, int], bytes] | None:
    """(char → 1-byte show code, font program) for variant 11, or None
    when the charset doesn't fit (caller falls back to literal strings).

    symbolic: codes are arbitrary consecutive assignments from 32; the
    program carries a (3,0) Microsoft-Symbol format-6 subtable keyed at
    ``0xF000|code`` → GID plus a (3,1) format-4 Unicode subtable; the
    reader recovers text by inverting (3,1) GID→unicode.
    nonsymbolic: codes ARE the code points (0x20..0xFF); the program
    carries only the (3,1) table, and a code decodes as itself exactly
    when the font maps that code point."""
    # 0xFFFF is excluded like the surrogates: a [0xFFFF,0xFFFF] format-4
    # segment is indistinguishable from the mandatory terminator, so the
    # reader (correctly) skips it and the char would silently drop
    # (round-7 review finding, confirmed by execution)
    charset = sorted(set(text) - {"\n"})
    if not charset or any(
        not 0x20 <= ord(c) <= 0xFFFE or 0xD800 <= ord(c) <= 0xDFFF
        for c in charset
    ):
        return None
    if symbolic:
        if len(charset) > 224:
            return None
        codes = {c: 32 + i for i, c in enumerate(charset)}
        gids = {c: i + 1 for i, c in enumerate(charset)}
        sym = _tt_format6(0xF020, [gids[c] for c in charset])
        uni = _tt_format4({ord(c): gids[c] for c in charset})
        return codes, _truetype_blob([(3, 0, sym), (3, 1, uni)])
    if any(ord(c) > 0xFF for c in charset):
        return None
    codes = {c: ord(c) for c in charset}
    uni = _tt_format4({ord(c): ord(c) - 31 for c in charset})
    return codes, _truetype_blob([(3, 1, uni)])


def _cid_truetype_font(
    text: str, gid_stream: bool
) -> tuple[dict[str, int], bytes, bytes | None] | None:
    """(char → 2-byte CID show code, TrueType program, CIDToGIDMap
    stream bytes or None for /Identity) for variant 14 — a Type0
    /Identity-H composite font that ships NO /ToUnicode: the reader
    (kernel.pdftext.PdfDocument._composite_font_cmap) recovers text
    only through show code → CID (Identity CMap) → GID (/CIDToGIDMap)
    → unicode (inverted embedded (3,1) cmap subtable). None when the
    charset leaves the BMP-minus-surrogates window (caller falls back
    to variant-0 literal strings).

    gid_stream=False: /CIDToGIDMap /Identity, CID == GID == charset
    index + 1. gid_stream=True: CIDs are spread to 2·(index+1) and a
    binary uint16 map stream carries CID → GID, so the two reader
    branches are both exercised by real corpus docs."""
    charset = sorted(set(text) - {"\n"})
    if (
        not charset
        or len(charset) > 16000
        or any(
            not 0x20 <= ord(c) <= 0xFFFE or 0xD800 <= ord(c) <= 0xDFFF
            for c in charset
        )
    ):
        return None
    gids = {c: i + 1 for i, c in enumerate(charset)}
    uni = _tt_format4({ord(c): gids[c] for c in charset})
    blob = _truetype_blob([(3, 1, uni)])
    if not gid_stream:
        return dict(gids), blob, None
    codes = {c: 2 * g for c, g in gids.items()}
    table = bytearray(2 * (2 * len(charset) + 1))
    for c, g in gids.items():
        struct.pack_into(">H", table, 2 * codes[c], g)
    return codes, blob, bytes(table)


# -- §7.6 standard security handler (writer side; independent
# transcription of the published algorithms — the kernel's reader-side
# implementation is the differential twin, like lzw_encode/_lzw_decode)

_ENC_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def _rc4_ks(key: bytes, data: bytes) -> bytes:
    """RC4 (writer side) — native when available, pure fallback
    (kernel/fastcrypto.py; the from-scratch loop lives there)."""
    from ..kernel.fastcrypto import rc4  # noqa: PLC0415

    return rc4(key, data)


def _std_security(
    owner_pwd: bytes, user_pwd: bytes, p: int, id0: bytes, r: int
) -> tuple[bytes, bytes, bytes]:
    """ISO 32000-1 §7.6.3 Algorithms 3 (/O), 2 (file key) and 4/5 (/U)
    → (O, U, file_key). NB the 50-round md5 loops differ: Algorithm 3
    re-hashes the FULL digest, Algorithm 2 only the first n bytes."""
    import hashlib  # noqa: PLC0415

    n = 5 if r == 2 else 16
    h = hashlib.md5((owner_pwd + _ENC_PAD)[:32]).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    okey = h[:n]
    o = _rc4_ks(okey, (user_pwd + _ENC_PAD)[:32])
    if r >= 3:
        for i in range(1, 20):
            o = _rc4_ks(bytes(c ^ i for c in okey), o)
    h = hashlib.md5(
        (user_pwd + _ENC_PAD)[:32]
        + o
        + (p & 0xFFFFFFFF).to_bytes(4, "little")
        + id0
    ).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:n]).digest()
    key = h[:n]
    if r == 2:
        u = _rc4_ks(key, _ENC_PAD)
    else:
        u = _rc4_ks(key, hashlib.md5(_ENC_PAD + id0).digest())
        for i in range(1, 20):
            u = _rc4_ks(bytes(c ^ i for c in key), u)
        u += bytes(16)
    return o, u, key


def _enc_obj_key(key: bytes, num: int, gen: int = 0, aes: bool = False) -> bytes:
    import hashlib  # noqa: PLC0415

    salt = b"sAlT" if aes else b""
    return hashlib.md5(
        key + num.to_bytes(3, "little") + gen.to_bytes(2, "little") + salt
    ).digest()[: min(len(key) + 5, 16)]


def _hash_2b_w(password: bytes, salt: bytes, udata: bytes, r: int) -> bytes:
    """Writer-side transcription of ISO 32000-2 Algorithm 2.B (reader
    twin: kernel.pdftext._hash_2b)."""
    import hashlib  # noqa: PLC0415

    from ..kernel.fastcrypto import aes_cbc_encrypt  # noqa: PLC0415

    k = hashlib.sha256(password + salt + udata).digest()
    if r == 5:
        return k
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = aes_cbc_encrypt(k[:16], k[16:32], k1, pad=False)
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[sum(e[:16]) % 3](
            e
        ).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def lzw_encode(data: bytes, early: int = 1) -> bytes:
    """LZWDecode-compatible encoder (ISO 32000-1 §7.4.4): MSB-first,
    9→12-bit variable width, ClearTable at start and on table overflow,
    EOD at end, /EarlyChange widens one entry before the width's last
    code. Inverse of kernel.pdftext._lzw_decode."""
    out = bytearray()
    bitbuf = 0
    bitcnt = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, bitcnt
        bitbuf = (bitbuf << width) | code
        bitcnt += width
        while bitcnt >= 8:
            out.append((bitbuf >> (bitcnt - 8)) & 0xFF)
            bitcnt -= 8

    # Width sync with the decoder (whose table lags the encoder's by one
    # entry): encoder widens when next_code + early > 2^width AFTER its
    # eager append; the decoder widens when len(table) + early >= 2^width
    # after its lagged append — both switch between the same two codes.
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(256, width)
    w = b""
    for i in range(len(data)):
        ch = data[i : i + 1]
        wc = w + ch
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        if next_code + early > (1 << width) and width < 12:
            width += 1
        if next_code >= 3800:
            # clear well below the 12-bit ceiling — spec-legal at any
            # point, and it keeps both ends away from the 4096 edge
            emit(256, width)
            table = {bytes([j]): j for j in range(256)}
            next_code = 258
            width = 9
        w = ch
    if w:
        emit(table[w], width)
    emit(257, width)
    if bitcnt:
        out.append((bitbuf << (8 - bitcnt)) & 0xFF)
    return bytes(out)


# Latin-1-encodable chars whose byte means something ELSE under the
# reader's show-string fallback (WinAnsi deltas — ADVICE r6 scoped
# PDFDocEncoding to text strings outside content streams; show bytes
# decode WinAnsi-with-Latin-1-fallthrough). Every remapped byte
# (cp1252's 0x80-0x9F punctuation block, NEL 0x85 included) must take
# the BOM-tagged UTF-16 path or the round-trip silently corrupts.
# Derived from the kernel's table, never hand-listed — the twins move
# together by construction.
_NON_SHOW_LATIN1 = {chr(k) for k in _SHOW_DELTAS}


def _latin1_show_safe(s: str) -> bytes | None:
    """s as bytes that the reader's show fallback decodes back to s,
    or None → use BOM-tagged UTF-16BE. Text beginning with þÿ/ÿþ must
    also take the UTF-16 path: its latin-1 bytes ARE a BOM pair, which
    the reader's lenient BOM sniff would decode as UTF-16 (round-7
    review finding, confirmed by execution)."""
    if any(c in _NON_SHOW_LATIN1 for c in s):
        return None
    if s[:2] in ("\xfe\xff", "\xff\xfe"):
        return None
    try:
        return s.encode("latin-1")
    except UnicodeEncodeError:
        return None


def _lit(s: str) -> bytes:
    """Literal or UTF-16BE-hex string for arbitrary text."""
    raw = _latin1_show_safe(s)
    if raw is None:
        return b"<" + (b"\xfe\xff" + s.encode("utf-16-be")).hex().encode() + b">"
    return b"(" + raw.replace(b"\\", rb"\\").replace(b"(", rb"\(").replace(b")", rb"\)") + b")"


def _hex(s: str) -> bytes:
    raw = _latin1_show_safe(s)
    if raw is None:
        raw = b"\xfe\xff" + s.encode("utf-16-be")
    return b"<" + raw.hex().encode() + b">"


def _tj_array(line: str) -> bytes:
    """Words as alternating literal/hex strings, spaces as -250 kerns."""
    words = line.split(" ")
    parts = []
    for i, w in enumerate(words):
        if i:
            parts.append(b"-250")
        parts.append(_hex(w) if i % 2 else _lit(w))
    return b"[" + b" ".join(parts) + b"] TJ"


def _cid_codes(text: str) -> dict[str, int]:
    """Deterministic char → 2-byte code assignment for variant 5: sorted
    charset, codes from 1 (0 left unused). Newlines never reach show
    strings (lines are split first) but are harmless if present."""
    return {ch: i + 1 for i, ch in enumerate(sorted(set(text)))}


def _tounicode_cmap(codes: dict[str, int]) -> bytes:
    """CMap stream exercising all three mapping shapes: consecutive
    BMP runs (len ≥ 3) → incrementing bfrange, len-2 runs → array-form
    bfrange, singletons and non-BMP chars → bfchar. Sections chunked at
    100 entries per spec."""
    items = sorted(codes.items(), key=lambda kv: kv[1])
    runs: list[list[tuple[str, int]]] = []
    for ch, code in items:
        if (
            runs
            and ord(ch) == ord(runs[-1][-1][0]) + 1
            and code == runs[-1][-1][1] + 1
            and ord(ch) <= 0xFFFF
            and ord(runs[-1][0][0]) <= 0xFFFF
            # spec: a bfrange must not cross a high-byte boundary
            and (code >> 8) == (runs[-1][0][1] >> 8)
        ):
            runs[-1].append((ch, code))
        else:
            runs.append([(ch, code)])

    def _hx(v: int) -> bytes:
        return b"<%04X>" % v

    def _uhx(s: str) -> bytes:
        return b"<" + s.encode("utf-16-be").hex().upper().encode() + b">"

    bfchars: list[bytes] = []
    bfranges: list[bytes] = []
    for run in runs:
        if len(run) == 1 or ord(run[0][0]) > 0xFFFF:
            bfchars.extend(_hx(c) + b" " + _uhx(ch) for ch, c in run)
        elif len(run) == 2:
            (c1, k1), (c2, k2) = run
            bfranges.append(
                _hx(k1) + b" " + _hx(k2) + b" [" + _uhx(c1) + b" " + _uhx(c2) + b"]"
            )
        else:
            bfranges.append(
                _hx(run[0][1]) + b" " + _hx(run[-1][1]) + b" " + _uhx(run[0][0])
            )

    out = [
        b"/CIDInit /ProcSet findresource begin",
        b"12 dict begin",
        b"begincmap",
        b"/CMapName /SaxGen-UCS def",
        b"1 begincodespacerange",
        b"<0000> <FFFF>",
        b"endcodespacerange",
    ]
    for kind, rows in ((b"bfchar", bfchars), (b"bfrange", bfranges)):
        for i in range(0, len(rows), 100):
            chunk = rows[i : i + 100]
            out.append(b"%d begin" % len(chunk) + kind)
            out.extend(chunk)
            out.append(b"end" + kind)
    out += [b"endcmap", b"CMapName currentdict /CMap defineresource pop", b"end", b"end"]
    return b"\n".join(out)


def _cid_hex(line: str, codes: dict[str, int], width: int = 2) -> bytes:
    raw = b"".join(codes[ch].to_bytes(width, "big") for ch in line)
    return b"<" + raw.hex().upper().encode() + b">"


def _layout_order(
    lines: list[str], two_column: bool
) -> list[tuple[int, float, str]]:
    """[(x, y, line)] placement entries in deliberate stream order."""
    order: list[tuple[int, float, str]] = []
    if two_column:
        half = (len(lines) + 1) // 2
        for i, ln in enumerate(lines[half:]):
            order.append((_X1, _Y0 - _LEAD * (half + i), ln))
        for i, ln in enumerate(lines[:half]):
            order.append((_X0, _Y0 - _LEAD * i, ln))
    else:
        for i, ln in enumerate(lines):
            order.append((_X0, _Y0 - _LEAD * i, ln))
    return order


def _plain_ops(entries: list[tuple[int, float, str]]) -> list[bytes]:
    """Variant-0-style literal-string ops for explicit placements —
    the building block variant 13 splits across page + form streams."""
    ops = [b"BT", b"/F1 12 Tf", b"%.1f TL" % _LEAD]
    for x, y, ln in entries:
        ops.append(b"1 0 0 1 %d %.1f Tm" % (x, y))
        ops.append(_lit(ln) + b" Tj")
    ops.append(b"ET")
    return ops


def _content_ops(
    lines: list[str],
    variant: int,
    two_column: bool,
    codes: dict[str, int] | None = None,
    code_width: int = 2,
) -> list[bytes]:
    if codes is None:
        font = b"/F1 12 Tf"
    else:
        font = b"/F3 12 Tf" if code_width == 1 else b"/F2 12 Tf"
    ops = [b"BT", font, b"%.1f TL" % _LEAD]
    for x, y, ln in _layout_order(lines, two_column):
        ops.append(b"1 0 0 1 %d %.1f Tm" % (x, y))
        if codes is not None:
            ops.append(_cid_hex(ln, codes, code_width) + b" Tj")
        elif variant == 2:
            ops.append(_tj_array(ln))
        else:
            ops.append(_lit(ln) + b" Tj")
    ops.append(b"ET")
    return ops


def build_pdf(
    text: str,
    variant: int = 0,
    two_column: bool = False,
    lines_per_page: int | None = None,
    n_images: int = 0,
    n_fields: int = 0,
    n_outline: int = 0,
    n_real_images: int = 0,
) -> bytes:
    """Render ``text`` (lines split on \\n) into a deterministic PDF.

    ``n_images`` > 0 additionally embeds that many deterministic images
    per page (dims/filter/colorspace closed-form from ``len(text)`` and
    the image index — see ``_image_params``): index ``k % 3 == 2`` is
    an INLINE image (``BI..ID..EI`` in the content stream, abbreviated
    keys, exact /L), the rest are image XObjects each invoked by a
    ``Do`` between the text streams. The payloads stay
    encoded junk (inventory never decodes samples) and MUST be
    text-invisible to the extractor. Works with every variant; under
    the encrypting variants the image dicts survive because encryption
    rewrites only the /Length entry.

    ``n_real_images`` > 0 embeds that many DECODABLE /DCTDecode image
    XObjects per page (real baseline JPEGs, imagegen closed forms keyed
    on ``len(text)`` and the index, ``/Rm<k>`` names) — the pixel-level
    roundtrip corpus (q71); independent of ``n_images`` so the q58
    metadata closed forms stay untouched.

    ``n_fields`` adds that many AcroForm text fields (shapes cycle:
    flat, hierarchical parent.kid, widget-merged value-on-parent;
    names/values closed-form in ``len(text)`` and the index) and
    ``n_outline`` a bookmark tree (even indices top-level, odd the
    child of the preceding top — reading order equals the index). Both
    surface TEXT strings, which the encrypting variants emit as
    per-object encrypted hex — so ``form_fields()``/``outline_titles()``
    exercise string decryption, not just stream decryption."""
    lines = text.split("\n") if text else [""]
    page_lines: list[list[str]]
    if lines_per_page:
        page_lines = [lines[i : i + lines_per_page] for i in range(0, len(lines), lines_per_page)]
    else:
        page_lines = [lines]

    objs: dict[int, bytes] = {}
    n_pages = len(page_lines)
    kids = b" ".join(b"%d 0 R" % (3 + i) for i in range(n_pages))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n_pages

    next_num = 3 + n_pages
    font_num = next_num
    objs[font_num] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    next_num += 1

    streams: dict[int, tuple[bytes, bytes]] = {}  # num -> (dict, raw)

    codes: dict[str, int] | None = None
    code_width = 2
    font_res = b"<< /F1 %d 0 R >>" % font_num
    if variant == 7:
        codes = _diff_codes("".join(lines))
        if codes is not None:
            code_width = 1
            diff_font_num = next_num
            next_num += 1
            objs[diff_font_num] = (
                b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
                b"/Encoding << /Type /Encoding /Differences "
                + _differences_array(codes)
                + b" >> >>"
            )
            font_res = b"<< /F1 %d 0 R /F3 %d 0 R >>" % (font_num, diff_font_num)
    if variant == 8:
        enc_name = _BASE_ENCODINGS[len(text) % 3]
        codes = _base_enc_codes("".join(lines), enc_name)
        if codes is not None:
            code_width = 1
            enc_font_num = next_num
            next_num += 1
            objs[enc_font_num] = (
                b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
                b"/Encoding /" + enc_name + b" >>"
            )
            # same /F3 resource tag as variant 7: _content_ops selects
            # it for any 1-byte-coded simple font
            font_res = b"<< /F1 %d 0 R /F3 %d 0 R >>" % (font_num, enc_font_num)
    if variant == 11:
        sub = _truetype_font("".join(lines), symbolic=(len(text) % 2 == 0))
        if sub is not None:
            codes, ttf = sub
            code_width = 1
            ff_num = next_num
            desc_num = next_num + 1
            tt_font_num = next_num + 2
            next_num += 3
            streams[ff_num] = (
                b"<< /Length %d /Length1 %d >>" % (len(ttf), len(ttf)),
                ttf,
            )
            objs[desc_num] = (
                b"<< /Type /FontDescriptor /FontName /SAXGN+SaxTT"
                b" /Flags %d /FontFile2 %d 0 R >>"
                % (4 if len(text) % 2 == 0 else 32, ff_num)
            )
            # deliberately NO /ToUnicode and NO /Encoding: the embedded
            # program's cmap is the only decode source
            objs[tt_font_num] = (
                b"<< /Type /Font /Subtype /TrueType /BaseFont /SAXGN+SaxTT"
                b" /FontDescriptor %d 0 R >>" % desc_num
            )
            # same /F3 resource tag as variants 7/8: _content_ops
            # selects it for any 1-byte-coded simple font
            font_res = b"<< /F1 %d 0 R /F3 %d 0 R >>" % (font_num, tt_font_num)
    if variant == 12:
        sub = _cff_font("".join(lines), range_encoding=(len(text) % 2 == 1))
        if sub is not None:
            codes, cff = sub
            code_width = 1
            ff_num = next_num
            desc_num = next_num + 1
            cff_font_num = next_num + 2
            next_num += 3
            streams[ff_num] = (
                b"<< /Subtype /Type1C /Length %d >>" % len(cff),
                cff,
            )
            objs[desc_num] = (
                b"<< /Type /FontDescriptor /FontName /SAXGN+SaxCFF"
                b" /Flags 32 /FontFile3 %d 0 R >>" % ff_num
            )
            # deliberately NO /ToUnicode and NO /Encoding: the CFF
            # program's charset+encoding are the only decode source
            objs[cff_font_num] = (
                b"<< /Type /Font /Subtype /Type1 /BaseFont /SAXGN+SaxCFF"
                b" /FontDescriptor %d 0 R >>" % desc_num
            )
            font_res = b"<< /F1 %d 0 R /F3 %d 0 R >>" % (font_num, cff_font_num)
    if variant == 14:
        sub = _cid_truetype_font("".join(lines), gid_stream=(len(text) % 2 == 1))
        if sub is not None:
            codes, ttf, c2g = sub
            # code_width stays 2: _content_ops emits 2-byte CID codes
            # under the /F2 resource tag, same as variant 5
            ff_num = next_num
            desc_num = next_num + 1
            cid_num = next_num + 2
            t0_num = next_num + 3
            next_num += 4
            streams[ff_num] = (
                b"<< /Length %d /Length1 %d >>" % (len(ttf), len(ttf)),
                ttf,
            )
            objs[desc_num] = (
                b"<< /Type /FontDescriptor /FontName /SAXGN+SaxCID"
                b" /Flags 4 /FontFile2 %d 0 R >>" % ff_num
            )
            if c2g is None:
                c2g_entry = b"/CIDToGIDMap /Identity"
            else:
                c2g_num = next_num
                next_num += 1
                streams[c2g_num] = (b"<< /Length %d >>" % len(c2g), c2g)
                c2g_entry = b"/CIDToGIDMap %d 0 R" % c2g_num
            objs[cid_num] = (
                b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont"
                b" /SAXGN+SaxCID /CIDSystemInfo << /Registry (Adobe)"
                b" /Ordering (Identity) /Supplement 0 >>"
                b" /FontDescriptor %d 0 R " % desc_num
            ) + c2g_entry + b" >>"
            # deliberately NO /ToUnicode: CIDToGIDMap + the embedded
            # program's cmap are the only decode source
            objs[t0_num] = (
                b"<< /Type /Font /Subtype /Type0 /BaseFont /SAXGN+SaxCID"
                b" /Encoding /Identity-H /DescendantFonts [%d 0 R] >>"
                % cid_num
            )
            font_res = b"<< /F1 %d 0 R /F2 %d 0 R >>" % (font_num, t0_num)
    if variant == 5:
        codes = _cid_codes("".join(lines))
        cmap_raw = zlib.compress(_tounicode_cmap(codes))
        cmap_num = next_num
        next_num += 1
        streams[cmap_num] = (
            b"<< /Length %d /Filter /FlateDecode >>" % len(cmap_raw),
            cmap_raw,
        )
        cid_font_num = next_num
        next_num += 1
        objs[cid_font_num] = (
            b"<< /Type /Font /Subtype /Type0 /BaseFont /SaxGen "
            b"/Encoding /Identity-H /ToUnicode %d 0 R >>" % cmap_num
        )
        font_res = b"<< /F1 %d 0 R /F2 %d 0 R >>" % (font_num, cid_font_num)

    # -- AcroForm fields + outline (deferred-string slots: the \x00S\x00
    # placeholders substitute to plain literals for clear files and to
    # per-object encrypted hex strings under variants 9/10, exercising
    # the reader's string decryption on the TEXT-string surface)
    str_slots: dict[int, list[bytes]] = {}

    def _fill_strings(strfn) -> None:
        for num, raws in str_slots.items():
            body = objs[num]
            for raw in raws:
                body = body.replace(b"\x00S\x00", strfn(num, raw), 1)
            objs[num] = body
        str_slots.clear()

    def _plain_str(_num: int, raw: bytes) -> bytes:
        return (
            b"("
            + raw.replace(b"\\", rb"\\").replace(b"(", rb"\(").replace(b")", rb"\)")
            + b")"
        )

    cat_extra = b""
    if n_fields:
        fd_refs = []
        for k in range(n_fields):
            val = b"val %d" % (len(text) * 31 + k)
            shape = k % 3
            if shape == 1:
                # hierarchical: parent /T carries the prefix, named kid
                # the terminal field — full name grp<k>.a
                kid = next_num
                par = next_num + 1
                next_num += 2
                objs[kid] = (
                    b"<< /FT /Tx /T \x00S\x00 /V \x00S\x00 /Parent %d 0 R >>"
                    % par
                )
                str_slots[kid] = [b"a", val]
                objs[par] = b"<< /T \x00S\x00 /Kids [%d 0 R] >>" % kid
                str_slots[par] = [b"grp%d" % k]
                fd_refs.append(par)
            elif shape == 2:
                # widget-merged: the kid is a bare widget annotation
                # (no /T), so the value lives on the parent (§12.7.3.1)
                par = next_num
                kid = next_num + 1
                next_num += 2
                objs[par] = (
                    b"<< /FT /Tx /T \x00S\x00 /V \x00S\x00 /Kids [%d 0 R] >>"
                    % kid
                )
                str_slots[par] = [b"field%d" % k, val]
                objs[kid] = (
                    b"<< /Type /Annot /Subtype /Widget /Rect [0 0 1 1]"
                    b" /Parent %d 0 R >>" % par
                )
                fd_refs.append(par)
            else:
                fnum = next_num
                next_num += 1
                objs[fnum] = b"<< /FT /Tx /T \x00S\x00 /V \x00S\x00 >>"
                str_slots[fnum] = [b"field%d" % k, val]
                fd_refs.append(fnum)
        acro_num = next_num
        next_num += 1
        objs[acro_num] = (
            b"<< /Fields ["
            + b" ".join(b"%d 0 R" % r for r in fd_refs)
            + b"] >>"
        )
        cat_extra += b" /AcroForm %d 0 R" % acro_num
    if n_outline:
        # chain: even j are top-level siblings, odd j the single child
        # of the preceding top-level item — reading order equals j
        onums = list(range(next_num, next_num + n_outline))
        next_num += n_outline
        root_num = next_num
        next_num += 1
        tops = [j for j in range(n_outline) if j % 2 == 0]
        for j in range(n_outline):
            if j % 2 == 0:
                parent = root_num
                nxt = j + 2 if j + 2 < n_outline else None
            else:
                parent = onums[j - 1]
                nxt = None
            body = b"<< /Title \x00S\x00 /Parent %d 0 R" % parent
            if nxt is not None:
                body += b" /Next %d 0 R" % onums[nxt]
            if j % 2 == 0 and j + 1 < n_outline:
                body += b" /First %d 0 R /Last %d 0 R /Count 1" % (
                    onums[j + 1],
                    onums[j + 1],
                )
            body += b" >>"
            objs[onums[j]] = body
            str_slots[onums[j]] = [b"sec %d" % j]
        objs[root_num] = (
            b"<< /Type /Outlines /First %d 0 R /Last %d 0 R /Count %d >>"
            % (onums[tops[0]], onums[tops[-1]], len(tops))
        )
        cat_extra += b" /Outlines %d 0 R" % root_num
    if cat_extra:
        objs[1] = b"<< /Type /Catalog /Pages 2 0 R" + cat_extra + b" >>"

    for pi, plines in enumerate(page_lines):
        xobj_entries: list[bytes] = []
        if variant == 13:
            # text splits across THREE content streams: page content,
            # form XObject /FxA (own /Resources, Flate-compressed), and
            # /FxB nested INSIDE A with NO /Resources — B inherits the
            # invoking context's (deprecated §7.8.3, common in real
            # files). Interleaved thirds, so correct output REQUIRES
            # recursing both levels and merging runs by layout.
            order = _layout_order(plines, two_column)
            b_raw = b"\n".join(_plain_ops(order[2::3]))
            b_num = next_num
            next_num += 1
            streams[b_num] = (
                b"<< /Type /XObject /Subtype /Form /BBox [0 0 612 792]"
                b" /Length %d >>" % len(b_raw),
                b_raw,
            )
            a_raw = zlib.compress(
                b"\n".join(_plain_ops(order[1::3]) + [b"/FxB Do"])
            )
            a_num = next_num
            next_num += 1
            streams[a_num] = (
                b"<< /Type /XObject /Subtype /Form /BBox [0 0 612 792]"
                b" /Resources << /Font << /F1 %d 0 R >>"
                b" /XObject << /FxB %d 0 R >> >>"
                b" /Filter /FlateDecode /Length %d >>"
                % (font_num, b_num, len(a_raw)),
                a_raw,
            )
            xobj_entries.append(b"/FxA %d 0 R" % a_num)
            ops = _plain_ops(order[0::3]) + [b"/FxA Do"]
        else:
            ops = _content_ops(plines, variant, two_column, codes, code_width)
        for k in range(n_images):
            if k % 3 == 2:
                # every third image is inline (§8.9.7) — the content-
                # stream path, exercised under compression + encryption
                # because the whole stream wraps it
                ops.append(_inline_image_op(len(text), k))
                continue
            sd, payload = _image_xobject(len(text), k)
            im_num = next_num
            next_num += 1
            streams[im_num] = (sd, payload)
            xobj_entries.append(b"/Im%d %d 0 R" % (k, im_num))
            ops.append(b"/Im%d Do" % k)
        for k in range(n_real_images):
            sd, payload = _real_image_xobject(len(text), k)
            im_num = next_num
            next_num += 1
            streams[im_num] = (sd, payload)
            xobj_entries.append(b"/Rm%d %d 0 R" % (k, im_num))
            ops.append(b"/Rm%d Do" % k)
        if variant == 3 and len(ops) > 4:
            split = len(ops) // 2
            chunks = [b"\n".join(ops[:split]), b"\n".join(ops[split:])]
        else:
            chunks = [b"\n".join(ops)]
        content_refs = []
        for chunk in chunks:
            num = next_num
            next_num += 1
            content_refs.append(b"%d 0 R" % num)
            if variant in (1, 2, 9, 10):
                raw = zlib.compress(chunk)
                if variant == 1:  # indirect /Length
                    len_num = next_num
                    next_num += 1
                    objs[len_num] = b"%d" % len(raw)
                    sd = b"<< /Length %d 0 R /Filter /FlateDecode >>" % len_num
                else:
                    sd = b"<< /Length %d /Filter /FlateDecode >>" % len(raw)
            elif variant == 4:
                raw = lzw_encode(chunk)
                sd = (
                    b"<< /Length %d /Filter /LZWDecode "
                    b"/DecodeParms << /EarlyChange 1 >> >>" % len(raw)
                )
            else:
                raw = chunk
                sd = b"<< /Length %d >>" % len(raw)
            streams[num] = (sd, raw)
        contents = (
            content_refs[0] if len(content_refs) == 1 else b"[" + b" ".join(content_refs) + b"]"
        )
        res = b"<< /Font " + font_res
        if xobj_entries:
            res += b" /XObject << " + b" ".join(xobj_entries) + b" >>"
        res += b" >>"
        objs[3 + pi] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents "
            + contents
            + b" /Resources "
            + res
            + b" >>"
        )

    if variant not in (9, 10):
        _fill_strings(_plain_str)

    if variant == 6:
        # move every non-stream object into one compressed object stream
        items = sorted(objs.items())
        body = bytearray()
        offsets = []
        for num, ser in items:
            offsets.append((num, len(body)))
            body += ser + b"\n"
        header = b" ".join(b"%d %d" % p for p in offsets) + b"\n"
        raw = zlib.compress(bytes(header) + bytes(body))
        objstm_num = next_num
        next_num += 1
        streams[objstm_num] = (
            b"<< /Type /ObjStm /N %d /First %d /Length %d /Filter /FlateDecode >>"
            % (len(items), len(header), len(raw)),
            raw,
        )
        objs = {}

    trailer_extra = b""
    if variant == 10:
        import hashlib  # noqa: PLC0415

        from ..kernel.fastcrypto import (  # noqa: PLC0415
            aes_cbc_encrypt,
            aes_encrypt_block,
        )

        # AES tier: /V 4 /R 4 /AESV2 (AES-128 crypt filters — the
        # overwhelming real-crawl shape); /V 5 /R 6 /AESV3 (AES-256,
        # PDF 2.0) when len(text) % 16 == 1 (~6% of encrypted docs).
        # The R6 Hash-2B is a deliberately-slow password KDF (64+
        # AES-CBC hardening rounds ≈ 1.5 s/doc on CPython), so its
        # synthetic share mirrors its real rarity instead of
        # dominating the corpus render time; the tier itself is fully
        # pinned by tests/test_pdf.py (roundtrips, writer/reader
        # Hash-2B differential, /U tamper rejection)
        aes256 = len(text) % 16 == 1
        p = -44
        id0 = hashlib.md5(b"aes:" + text.encode("utf-8")).digest()

        def enc_stream(okey: bytes, num: int, raw: bytes) -> bytes:
            iv = hashlib.md5(b"iv:%d:" % num + id0).digest()
            return iv + aes_cbc_encrypt(okey, iv, raw)

        info_num = next_num
        next_num += 1
        enc_num = next_num
        next_num += 1
        if not aes256:
            # O/U are computed with the R3 algorithms (R4 reuses them)
            o, u, key = _std_security(b"saxgen-owner", b"", p, id0, 3)
            _fill_strings(
                lambda num, raw: b"<"
                + enc_stream(_enc_obj_key(key, num, aes=True), num, raw)
                .hex()
                .encode()
                + b">"
            )
            for num, (sd, raw) in list(streams.items()):
                ct = enc_stream(_enc_obj_key(key, num, aes=True), num, raw)
                streams[num] = (_relength(sd, len(ct)), ct)
            prod = enc_stream(
                _enc_obj_key(key, info_num, aes=True),
                info_num,
                b"sax-wasm-spark pdfgen (AESV2)",
            )
            objs[enc_num] = (
                b"<< /Filter /Standard /V 4 /R 4 /Length 128"
                b" /CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen"
                b" /Length 16 >> >> /StmF /StdCF /StrF /StdCF"
                b" /O <" + o.hex().encode()
                + b"> /U <" + u.hex().encode()
                + b"> /P %d >>" % p
            )
        else:
            # ISO 32000-2 Algorithms 8/9/10: salts + Hash-2B password
            # digests wrap a random-free deterministic 256-bit file key.
            # Each password side uses ONE salt for both its validation
            # and key slots (any 8-byte values are spec-valid; with an
            # EMPTY user password the distinct-salt indirection protects
            # nothing) so each side costs ONE Hash-2B invocation instead
            # of two — the KDF is a deliberately slow ~0.3 s/call spec
            # hardening loop and was the pdf-roundtrip straggler at
            # 6 calls/doc (VERDICT r6 item 3; now 2 writer + 1 reader).
            file_key = hashlib.sha256(b"fk:" + id0).digest()
            vs = ks = hashlib.md5(b"vs:" + id0).digest()[:8]
            uhash = _hash_2b_w(b"", vs, b"", 6)
            u48 = uhash + vs + ks
            ue = aes_cbc_encrypt(uhash, bytes(16), file_key, pad=False)
            ovs = oks = hashlib.md5(b"ovs:" + id0).digest()[:8]
            ohash = _hash_2b_w(b"saxgen-owner", ovs, u48, 6)
            o48 = ohash + ovs + oks
            oe = aes_cbc_encrypt(ohash, bytes(16), file_key, pad=False)
            perms = aes_encrypt_block(
                file_key,
                (p & 0xFFFFFFFF).to_bytes(4, "little")
                + b"\xff\xff\xff\xffTadbdet0",
            )
            _fill_strings(
                lambda num, raw: b"<"
                + enc_stream(file_key, num, raw).hex().encode()
                + b">"
            )
            for num, (sd, raw) in list(streams.items()):
                ct = enc_stream(file_key, num, raw)
                streams[num] = (_relength(sd, len(ct)), ct)
            prod = enc_stream(
                file_key, info_num, b"sax-wasm-spark pdfgen (AESV3)"
            )
            objs[enc_num] = (
                b"<< /Filter /Standard /V 5 /R 6 /Length 256"
                b" /CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen"
                b" /Length 32 >> >> /StmF /StdCF /StrF /StdCF"
                b" /O <" + o48.hex().encode()
                + b"> /U <" + u48.hex().encode()
                + b"> /OE <" + oe.hex().encode()
                + b"> /UE <" + ue.hex().encode()
                + b"> /Perms <" + perms.hex().encode()
                + b"> /P %d >>" % p
            )
        objs[info_num] = b"<< /Producer <" + prod.hex().encode() + b"> >>"
        idhex = b"<" + id0.hex().encode() + b">"
        trailer_extra = (
            b" /Encrypt %d 0 R /Info %d 0 R /ID [" % (enc_num, info_num)
            + idhex + b" " + idhex + b"]"
        )

    if variant == 9:
        import hashlib  # noqa: PLC0415

        # revision cycles deterministically: R2 (40-bit /V 1) for
        # even-length texts, R3 (128-bit /V 2) for odd
        r = 2 if len(text) % 2 == 0 else 3
        p = -44  # typical print-allowed permission mask
        id0 = hashlib.md5(text.encode("utf-8")).digest()
        o, u, key = _std_security(b"saxgen-owner", b"", p, id0, r)
        _fill_strings(
            lambda num, raw: b"<"
            + _rc4_ks(_enc_obj_key(key, num), raw).hex().encode()
            + b">"
        )
        # streams encrypt AFTER filtering (write order: filter, then
        # encrypt); RC4 preserves length so /Length stays valid
        for num, (sd, raw) in list(streams.items()):
            streams[num] = (sd, _rc4_ks(_enc_obj_key(key, num), raw))
        info_num = next_num
        next_num += 1
        prod = _rc4_ks(
            _enc_obj_key(key, info_num), b"sax-wasm-spark pdfgen (encrypted)"
        )
        objs[info_num] = b"<< /Producer <" + prod.hex().encode() + b"> >>"
        enc_num = next_num
        next_num += 1
        ver = b"/V 1 /R 2 /Length 40" if r == 2 else b"/V 2 /R 3 /Length 128"
        objs[enc_num] = (
            b"<< /Filter /Standard " + ver
            + b" /O <" + o.hex().encode()
            + b"> /U <" + u.hex().encode()
            + b"> /P %d >>" % p
        )
        idhex = b"<" + id0.hex().encode() + b">"
        trailer_extra = (
            b" /Encrypt %d 0 R /Info %d 0 R /ID [" % (enc_num, info_num)
            + idhex + b" " + idhex + b"]"
        )

    # serialize body
    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n" if variant == 6
                    else b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(set(objs) | set(streams)):
        offsets[num] = len(out)
        if num in streams:
            sd, raw = streams[num]
            out += b"%d 0 obj\n" % num + sd + b"\nstream\n" + raw + b"\nendstream\nendobj\n"
        else:
            out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"

    max_num = max(offsets)
    xref_pos = len(out)
    out += b"xref\n0 %d\n" % (max_num + 1)
    out += b"0000000000 65535 f \n"
    for num in range(1, max_num + 1):
        if num in offsets:
            out += b"%010d 00000 n \n" % offsets[num]
        else:
            out += b"0000000000 65535 f \n"
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R" % (max_num + 1)
        + trailer_extra
        + b" >>\nstartxref\n%d\n%%%%EOF\n" % xref_pos
    )

    if variant == 3:
        # incremental update: append a redefinition of an /Info object —
        # both definitions live in the file; readers must take the last.
        info_num = max_num + 1
        out += b"%d 0 obj\n<< /Producer (gen-a) >>\nendobj\n" % info_num
        upd_off = len(out)
        out += b"%d 0 obj\n<< /Producer (gen-b) >>\nendobj\n" % info_num
        out += (
            b"trailer\n<< /Size %d /Root 1 0 R /Prev %d >>\nstartxref\n%d\n%%%%EOF\n"
            % (info_num + 1, xref_pos, upd_off)
        )
    return bytes(out)


# ---------------------------------------------------------------------------
# CCITT Group 4 scan corpus (q82): standalone single-page PDFs whose
# image XObjects carry T.6/MMR-compressed bilevel "scans" — the
# dominant wire format of scanned documents on the crawl. Closed forms
# of (doc_id, j) so a DuckDB oracle reproduces the decoded FILTER
# OUTPUT BITS (post-/BlackIs1 wire semantics) without touching a byte:
#
#   n_scans   = 1 + doc_id % 3
#   width     = 4 * (2 + (doc_id + j) % 5)      in 4x4 blocks bx
#   height    = 4 * (1 + (2*doc_id + j) % 4)    in 4x4 blocks by
#   ink(bx, by) = 1 when (doc_id + 3*j + 7*bx + 13*by) % 5 < 2
#   /BlackIs1 = (doc_id + j) % 2 == 1
#     → output bit = ink when BlackIs1 else 1 - ink
#   /EncodedByteAlign = (j % 2 == 1)
#
# Separate from build_pdf's 14-variant cycle on purpose: the q58/q71
# metadata and DCT-pixel closed forms stay untouched.


def ccitt_scan_shape(doc_id: int, j: int) -> tuple[int, int, bool, bool]:
    """(width, height, black_is_1, encoded_byte_align) of scan ``j``."""
    w = 4 * (2 + (doc_id + j) % 5)
    h = 4 * (1 + (2 * doc_id + j) % 4)
    return w, h, (doc_id + j) % 2 == 1, j % 2 == 1


def ccitt_scan_ink(doc_id: int, j: int):
    """The closed-form ink bitmap ((h, w) uint8, 1 = black)."""
    import numpy as np  # noqa: PLC0415

    w, h, _b1, _al = ccitt_scan_shape(doc_id, j)
    bx = np.arange(w // 4).reshape(1, -1)
    by = np.arange(h // 4).reshape(-1, 1)
    ink = ((doc_id + 3 * j + 7 * bx + 13 * by) % 5 < 2).astype(np.uint8)
    return np.repeat(np.repeat(ink, 4, axis=0), 4, axis=1)


def build_pdf_ccitt(doc_id: int) -> bytes:
    """A single-page PDF with ``1 + doc_id % 3`` CCITTFaxDecode (/K -1,
    pure G4) image XObjects — the q82 writer twin."""
    from ..kernel.ccittcodec import encode_g4  # noqa: PLC0415

    n = 1 + doc_id % 3
    objs: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
    }
    streams: dict[int, tuple[bytes, bytes]] = {}
    xo_refs = []
    next_num = 4
    for j in range(n):
        w, h, black_is_1, align = ccitt_scan_shape(doc_id, j)
        ink = ccitt_scan_ink(doc_id, j)
        payload = encode_g4(ink, encoded_byte_align=align)
        parms = b"<< /K -1 /Columns %d /Rows %d /BlackIs1 %s%s >>" % (
            w, h,
            b"true" if black_is_1 else b"false",
            b" /EncodedByteAlign true" if align else b"",
        )
        sd = (
            b"<< /Type /XObject /Subtype /Image /Width %d /Height %d"
            b" /BitsPerComponent 1 /ColorSpace /DeviceGray"
            b" /Filter /CCITTFaxDecode /DecodeParms " % (w, h)
            + parms
            + b" /Length %d >>" % len(payload)
        )
        streams[next_num] = (sd, payload)
        xo_refs.append((b"/Scan%d" % j, next_num))
        next_num += 1
    content = b"\n".join(
        b"q 100 0 0 60 %d 600 cm %s Do Q" % (60 + 110 * i, name)
        for i, (name, _num) in enumerate(xo_refs)
    )
    streams[next_num] = (b"<< /Length %d >>" % len(content), content)
    xobj_dict = b" ".join(b"%s %d 0 R" % (nm, num) for nm, num in xo_refs)
    objs[2] = b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"
    objs[3] = (
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
        b" /Resources << /XObject << " + xobj_dict + b" >> >>"
        b" /Contents %d 0 R >>" % next_num
    )

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(set(objs) | set(streams)):
        offsets[num] = len(out)
        if num in streams:
            sd, raw = streams[num]
            out += (
                b"%d 0 obj\n" % num + sd
                + b"\nstream\n" + raw + b"\nendstream\nendobj\n"
            )
        else:
            out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    max_num = max(offsets)
    xref_pos = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (max_num + 1)
    for num in range(1, max_num + 1):
        out += b"%010d 00000 n \n" % offsets[num]
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (max_num + 1, xref_pos)
    )
    return bytes(out)


# ---------------------------------------------------------------------------
# XMP metadata corpus (q83): standalone PDFs whose catalog carries an
# ISO 32000-1 §14.3.2 /Metadata stream — an XMP (RDF/XML) packet the
# SAX kernel itself tokenizes, pairing the reference engine's native
# XML ground with the PDF tier. Closed forms of doc_id:
#
#   title        = 'Doc Title <doc_id % 97>'   (dc:title rdf:Alt/rdf:li)
#   create_date  = '2024-MM-DDT0H:00:00Z', MM = 1+d%12, DD = 1+d%28,
#                  H = d%10                    (xmp:CreateDate, simple)
#   creator_tool = 'gen-<d % 5>'               (xmp:CreatorTool, simple)
#   producer     = 'sax-spark <d%7>.<d%3>'     (pdf:Producer, simple)
#
# Odd doc_ids Flate-compress the metadata stream (XMP spec says don't;
# real crawls do it anyway — the reader must apply stream filters).


def xmp_fields(doc_id: int) -> tuple[str, str, str, str]:
    """(title, create_date, creator_tool, producer) closed forms."""
    return (
        "Doc Title %d" % (doc_id % 97),
        "2024-%02d-%02dT0%d:00:00Z"
        % (1 + doc_id % 12, 1 + doc_id % 28, doc_id % 10),
        "gen-%d" % (doc_id % 5),
        "sax-spark %d.%d" % (doc_id % 7, doc_id % 3),
    )


def build_pdf_xmp(doc_id: int) -> bytes:
    """A one-page PDF whose catalog /Metadata carries the closed-form
    XMP packet — the q83 writer twin."""
    import zlib  # noqa: PLC0415

    title, date, tool, producer = xmp_fields(doc_id)
    xmp = (
        '<?xpacket begin="﻿" id="W5M0MpCehiHzreSzNTczkc9d"?>\n'
        '<x:xmpmeta xmlns:x="adobe:ns:meta/">\n'
        ' <rdf:RDF xmlns:rdf='
        '"http://www.w3.org/1999/02/22-rdf-syntax-ns#">\n'
        '  <rdf:Description rdf:about=""'
        ' xmlns:dc="http://purl.org/dc/elements/1.1/"'
        ' xmlns:xmp="http://ns.adobe.com/xap/1.0/"'
        ' xmlns:pdf="http://ns.adobe.com/pdf/1.3/">\n'
        "   <dc:title><rdf:Alt>"
        '<rdf:li xml:lang="x-default">%s</rdf:li>'
        "</rdf:Alt></dc:title>\n"
        "   <xmp:CreateDate>%s</xmp:CreateDate>\n"
        "   <xmp:CreatorTool>%s</xmp:CreatorTool>\n"
        "   <pdf:Producer>%s</pdf:Producer>\n"
        "  </rdf:Description>\n"
        " </rdf:RDF>\n"
        "</x:xmpmeta>\n"
        '<?xpacket end="w"?>'
    ) % (title, date, tool, producer)
    raw = xmp.encode("utf-8")
    if doc_id % 2:
        payload = zlib.compress(raw, 6)
        meta_dict = (
            b"<< /Type /Metadata /Subtype /XML /Filter /FlateDecode"
            b" /Length %d >>" % len(payload)
        )
    else:
        payload = raw
        meta_dict = (
            b"<< /Type /Metadata /Subtype /XML /Length %d >>" % len(payload)
        )

    content = b"BT /F1 12 Tf 72 720 Td (metadata corpus) Tj ET"
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R /Metadata 6 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
            b" /Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>"
        ),
        4: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }
    streams = {
        5: (b"<< /Length %d >>" % len(content), content),
        6: (meta_dict, payload),
    }
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(set(objs) | set(streams)):
        offsets[num] = len(out)
        if num in streams:
            sd, body = streams[num]
            out += (
                b"%d 0 obj\n" % num + sd
                + b"\nstream\n" + body + b"\nendstream\nendobj\n"
            )
        else:
            out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    max_num = max(offsets)
    xref_pos = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (max_num + 1)
    for num in range(1, max_num + 1):
        out += b"%010d 00000 n \n" % offsets[num]
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (max_num + 1, xref_pos)
    )
    return bytes(out)
