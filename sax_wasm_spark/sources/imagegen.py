"""Deterministic JPEG corpus twin for the image-decode oracle (q70).

Same pattern as pdfgen/warc writer twins: every byte is a closed form
of ``(doc_id, k)`` so a DuckDB oracle reproduces the decoded pixel
statistics without touching a single JPEG byte. Three modes cycle per
image index to cover the decoder's main axes:

- ``k % 3 == 0`` — grayscale, 4:4:4 (one component);
- ``k % 3 == 1`` — 3 components, 4:4:4, Adobe APP14 transform=0 (RGB
  passthrough), restart interval 2 (RSTn resync on the wire);
- ``k % 3 == 2`` — 3 components, 4:2:0 subsampled, transform=0.

Pixel values are constant per 8x8 block (16x16 macroblock for 4:2:0),
which with the encoder's all-ones quantization tables round-trips
BIT-EXACTLY (kernel/jpegcodec.py exactness contract) — so the oracle's
block-grid sum IS the decoded pixel sum, not an approximation.

Closed forms (all arithmetic in integers; % is non-negative):

    mode 0/1: width  = 8 * (2 + (doc_id + 7*k) % 5)     in blocks bx
              height = 8 * (1 + (2*doc_id + 11*k) % 5)  in blocks by
    mode 2:   width  = 16 * (1 + (doc_id + 7*k) % 3)    in macroblocks
              height = 16 * (1 + (2*doc_id + 11*k) % 3)
    value(c, bx, by) = (doc_id + 31*k + 7*bx + 13*by + 97*c) % 256

The reference repo has no image surface (sax-wasm is an XML tokenizer,
`/root/reference/src/sax/parser.rs:1`); this corpus serves the
assignment's multimodal tier.
"""

from __future__ import annotations

import numpy as np

from ..kernel.jpegcodec import encode_jpeg


def jpeg_geometry(doc_id: int, k: int) -> tuple[int, int, int, int]:
    """(mode, width, height, n_channels) for image ``k`` of ``doc_id``."""
    mode = k % 3
    if mode == 2:
        w = 16 * (1 + (doc_id + 7 * k) % 3)
        h = 16 * (1 + (2 * doc_id + 11 * k) % 3)
        return mode, w, h, 3
    w = 8 * (2 + (doc_id + 7 * k) % 5)
    h = 8 * (1 + (2 * doc_id + 11 * k) % 5)
    return mode, w, h, 1 if mode == 0 else 3


def jpeg_pixels(doc_id: int, k: int) -> np.ndarray:
    """The closed-form pixel array ((h,w) or (h,w,3) uint8)."""
    mode, w, h, nc = jpeg_geometry(doc_id, k)
    block = 16 if mode == 2 else 8
    wb, hb = w // block, h // block
    bx = np.arange(wb).reshape(1, -1, 1)
    by = np.arange(hb).reshape(-1, 1, 1)
    c = np.arange(nc).reshape(1, 1, -1)
    vals = (doc_id + 31 * k + 7 * bx + 13 * by + 97 * c) % 256
    img = np.repeat(np.repeat(vals, block, axis=0), block, axis=1).astype(np.uint8)
    return img[:, :, 0] if nc == 1 else img


def build_jpeg(doc_id: int, k: int) -> bytes:
    """Encode image ``k`` of ``doc_id`` — the writer twin."""
    mode, _w, _h, nc = jpeg_geometry(doc_id, k)
    px = jpeg_pixels(doc_id, k)
    return encode_jpeg(
        px,
        subsampling="420" if mode == 2 else "444",
        adobe_transform=0 if nc == 3 else None,
        restart_interval=2 if mode == 1 else 0,
    )


# ---------------------------------------------------------------------------
# PNG corpus twin (q72) — lossless, so the closed forms ARE the decoded
# pixels; four modes cycle per image index to cover the decoder's color
# types, and the encoder's row%5 filter cycle covers every unfilter.
#
#   mode = k % 4: 0 grayscale, 1 RGB, 2 palette (256-entry closed-form
#   palette: index i -> (i, 3i%256, 7i%256)), 3 RGBA
#   width  = 8 * (2 + (doc_id + 7*k) % 5)     in 8x8 blocks bx
#   height = 8 * (1 + (2*doc_id + 11*k) % 5)  in 8x8 blocks by
#   value(c, bx, by) = (doc_id + 31*k + 7*bx + 13*by + 97*c) % 256
#   (palette mode indexes with the c=0 value; decoded channels are
#    (v, 3v%256, 7v%256))

from ..kernel.pngcodec import encode_png  # noqa: E402


def png_geometry(doc_id: int, k: int) -> tuple[int, int, int, int]:
    """(mode, width, height, decoded n_channels) for PNG ``k``."""
    mode = k % 4
    w = 8 * (2 + (doc_id + 7 * k) % 5)
    h = 8 * (1 + (2 * doc_id + 11 * k) % 5)
    nc = {0: 1, 1: 3, 2: 3, 3: 4}[mode]
    return mode, w, h, nc


def _png_grid(doc_id: int, k: int, nc: int, w: int, h: int) -> np.ndarray:
    bx = np.arange(w // 8).reshape(1, -1, 1)
    by = np.arange(h // 8).reshape(-1, 1, 1)
    c = np.arange(nc).reshape(1, 1, -1)
    vals = (doc_id + 31 * k + 7 * bx + 13 * by + 97 * c) % 256
    return np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1).astype(np.uint8)


_PNG_PALETTE = np.stack(
    [
        np.arange(256, dtype=np.uint16) % 256,
        (3 * np.arange(256, dtype=np.uint16)) % 256,
        (7 * np.arange(256, dtype=np.uint16)) % 256,
    ],
    axis=1,
).astype(np.uint8)


def png_pixels(doc_id: int, k: int) -> np.ndarray:
    """The closed-form DECODED pixel array ((h,w) or (h,w,nc) uint8)."""
    mode, w, h, nc = png_geometry(doc_id, k)
    if mode == 2:
        idx = _png_grid(doc_id, k, 1, w, h)[:, :, 0]
        return _PNG_PALETTE[idx]
    img = _png_grid(doc_id, k, nc, w, h)
    return img[:, :, 0] if nc == 1 else img


def build_png(doc_id: int, k: int) -> bytes:
    """Encode PNG ``k`` of ``doc_id`` — the writer twin."""
    mode, w, h, _nc = png_geometry(doc_id, k)
    if mode == 2:
        idx = _png_grid(doc_id, k, 1, w, h)[:, :, 0]
        return encode_png(idx, color_type=3, palette=_PNG_PALETTE)
    return encode_png(png_pixels(doc_id, k))


# ---------------------------------------------------------------------------
# GIF corpus twin (q74) — palette-indexed and lossless, multi-frame,
# with every odd frame interlaced so the decoder's four-pass
# deinterlacer is proven in-corpus. Shares the PNG twin's 256-entry
# closed-form palette (index i -> (i, 3i%256, 7i%256)).
#
#   n_frames = 1 + (doc_id + k) % 3
#   width  = 8 * (2 + (doc_id + 7*k) % 5)     in 8x8 blocks bx
#   height = 8 * (1 + (2*doc_id + 11*k) % 5)  in 8x8 blocks by
#   index(f, bx, by) = (doc_id + 31*k + 41*f + 7*bx + 13*by) % 256
#   (decoded RGB channels are (v, 3v%256, 7v%256))

from ..kernel.gifcodec import encode_gif  # noqa: E402


def gif_geometry(doc_id: int, k: int) -> tuple[int, int, int]:
    """(width, height, n_frames) for GIF ``k`` of ``doc_id``."""
    w = 8 * (2 + (doc_id + 7 * k) % 5)
    h = 8 * (1 + (2 * doc_id + 11 * k) % 5)
    return w, h, 1 + (doc_id + k) % 3


def gif_frame_indices(doc_id: int, k: int, f: int) -> np.ndarray:
    """The closed-form palette-index grid for frame ``f``, (h,w) uint8."""
    w, h, _n = gif_geometry(doc_id, k)
    bx = np.arange(w // 8).reshape(1, -1)
    by = np.arange(h // 8).reshape(-1, 1)
    vals = (doc_id + 31 * k + 41 * f + 7 * bx + 13 * by) % 256
    return np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1).astype(np.uint8)


def gif_frame_pixels(doc_id: int, k: int, f: int) -> np.ndarray:
    """Decoded RGB pixels of frame ``f`` ((h,w,3) uint8)."""
    return _PNG_PALETTE[gif_frame_indices(doc_id, k, f)]


def build_gif(doc_id: int, k: int) -> bytes:
    """Encode GIF ``k`` of ``doc_id`` — the writer twin."""
    _w, _h, n = gif_geometry(doc_id, k)
    frames = [gif_frame_indices(doc_id, k, f) for f in range(n)]
    return encode_gif(frames, _PNG_PALETTE, interlace_odd_frames=True)


# ---------------------------------------------------------------------------
# HTML media-page twin (q75) — pages whose <img> tags carry the PNG
# corpus as data: URIs, so the SAX tier (attribute events) chains into
# the codec tier (base64 → decode) with a closed-form oracle. The
# script src and the plain link are DECOYS the query must filter out.


def build_media_page(doc_id: int, n_imgs: int) -> bytes:
    """One HTML page with ``n_imgs`` data-URI PNG images (imagegen
    closed forms) plus non-media src/href decoys."""
    import base64  # noqa: PLC0415

    parts = [
        '<html><head><script src="app.js">var x = 1;</script>'
        "<title>m</title></head><body><nav>"
        '<a href="/about">about</a></nav>'
    ]
    for k in range(n_imgs):
        b64 = base64.b64encode(build_png(doc_id, k)).decode("ascii")
        parts.append(f'<img src="data:image/png;base64,{b64}" alt="i{k}"/>')
    parts.append("<p>media page</p></body></html>")
    return "".join(parts).encode("utf-8")


# ---------------------------------------------------------------------------
# Perceptual-dedup corpus twin (q76) — per document, FOUR renditions of
# the SAME picture that differ only by container format and a per-pixel
# AFFINE transform (the changes a crawl actually shows: re-encode,
# brightness shift, color cast, palette expansion), so the dHash
# (operators/multimodal.dhash_planes) collides across all of them BY
# MATHEMATICAL CONSTRUCTION, and the oracle computes the exact 64-bit
# hash in pure SQL:
#
#   lo32 = (doc_id * 2654435761)       % 2^32     (odd multiplier →
#   hi32 = (doc_id * 40503 + 2739110765) % 2^32    injective, doc-unique)
#   phash = '%08x%08x' % (hi32, lo32)
#
# The picture realizes those bits directly: the 8x9 dHash sample grid
# is materialized as uniform cells (cell_w = 8*(1+(doc_id+r)%3),
# cell_h = 8*(1+(2*doc_id+r)%2) — multiples of 8 so the JPEG rendition
# is 8x8-block-constant and round-trips bit-exactly), and each row's
# nine cell values walk from 128 by ±8 per desired comparison bit
# (bit i = cell > next-cell), staying in [64, 192] so every affine
# rendition fits in uint8 without clipping:
#
#   r=0  PNG  grayscale, v
#   r=1  JPEG grayscale, v + (1 + doc_id % 15)        (brightness)
#   r=2  GIF  gray palette i→(i,i,i), index v         (3x luma scale)
#   r=3  BMP  truecolor (v+a, v+b, v+c), a,b,c = doc_id % 3/5/7 (cast)
#
# Docs with doc_id % 3 == 0 get a DIFFERENT picture as rendition 3
# (all 64 bits flipped → phash = '%08x%08x' % (~hi32, ~lo32)), so the
# cluster structure is: one 4-member (or 3-member) cross-format
# cluster per doc, plus a singleton bmp cluster for every third doc.


def phash_bits(doc_id: int, flip: bool = False) -> list[int]:
    """The 64 dHash comparison bits (bit i = 8*r + c, MSB-first)."""
    lo32 = (doc_id * 2654435761) % (1 << 32)
    hi32 = (doc_id * 40503 + 2739110765) % (1 << 32)
    if flip:
        lo32 ^= 0xFFFFFFFF
        hi32 ^= 0xFFFFFFFF
    word = (hi32 << 32) | lo32
    return [(word >> (63 - i)) & 1 for i in range(64)]


def phash_hex(doc_id: int, flip: bool = False) -> str:
    """The closed-form dHash hex string the oracle computes in SQL."""
    bits = phash_bits(doc_id, flip)
    word = 0
    for d in bits:
        word = (word << 1) | d
    return f"{word:016x}"


def cells_from_word(word: int) -> np.ndarray:
    """(8, 9) uint8 cell values realizing a 64-bit dHash word: each row
    walks from 128, -8 when the comparison bit is 1 else +8. THE
    canonical construction — the q76 image forms AND the q78/q80 video
    forms (sources/videogen) both derive their oracles from it."""
    cells = np.empty((8, 9), dtype=np.uint8)
    for r in range(8):
        v = 128
        cells[r, 0] = v
        for c in range(8):
            bit = (word >> (63 - (8 * r + c))) & 1
            v = v - 8 if bit else v + 8
            cells[r, c + 1] = v
    return cells


def phash_base_cells(doc_id: int, flip: bool = False) -> np.ndarray:
    """(8, 9) cell values realizing ``doc_id``'s bit pattern."""
    word = 0
    for b in phash_bits(doc_id, flip):
        word = (word << 1) | b
    return cells_from_word(word)


def phash_geometry(doc_id: int, r: int) -> tuple[int, int]:
    """(cell_w, cell_h) for rendition ``r`` — multiples of 8 so the
    JPEG rendition stays block-constant (lossless contract)."""
    return 8 * (1 + (doc_id + r) % 3), 8 * (1 + (2 * doc_id + r) % 2)


_PHASH_GRAY_PALETTE = np.repeat(
    np.arange(256, dtype=np.uint8).reshape(-1, 1), 3, axis=1
)


def build_phash_rendition(doc_id: int, r: int) -> bytes:
    """Rendition ``r`` (0..3) of ``doc_id``'s picture — the writer twin."""
    flip = r == 3 and doc_id % 3 == 0
    cells = phash_base_cells(doc_id, flip)
    cw, ch = phash_geometry(doc_id, r)
    base = np.repeat(np.repeat(cells, ch, axis=0), cw, axis=1)
    if r == 0:
        return encode_png(base)
    if r == 1:
        delta = 1 + doc_id % 15
        return encode_jpeg(base + np.uint8(delta), subsampling="444")
    if r == 2:
        return encode_gif([base], _PHASH_GRAY_PALETTE)
    from ..kernel.dibcodec import encode_bmp  # noqa: PLC0415

    a, b, c = doc_id % 3, doc_id % 5, doc_id % 7
    rgb = np.stack(
        [base + np.uint8(a), base + np.uint8(b), base + np.uint8(c)], axis=2
    )
    return encode_bmp(rgb)


# ---------------------------------------------------------------------------
# EXIF corpus (q86): JPEGs carrying an APP1 'Exif' segment — IFD0
# camera fields + the 0x8769 EXIF sub-IFD — the camera metadata real
# pipelines keep alongside images. Closed forms of (doc_id, k):
#
#   make        = 'Cam<doc_id % 7>'
#   model       = 'M-<(doc_id + k) % 13>'
#   orientation = 1 + (doc_id + k) % 8
#   datetime    = '2024:MM:DD HH:00:00', MM=1+d%12, DD=1+(d+k)%28, HH=d%24
#   exposure    = '1/<8 * (1 + (d + k) % 6)>'   (RATIONAL num/den)
#   iso         = 100 * (1 + (d + 2*k) % 8)
#   pixel_x / pixel_y = the carrying JPEG's true dims
#   byte order  = 'MM' big-endian when (doc_id + k) odd, else 'II'


def exif_closed_fields(doc_id: int, k: int) -> dict:
    mode, w, h, _nc = jpeg_geometry(doc_id, k)
    return {
        "make": "Cam%d" % (doc_id % 7),
        "model": "M-%d" % ((doc_id + k) % 13),
        "orientation": 1 + (doc_id + k) % 8,
        "datetime": "2024:%02d:%02d %02d:00:00"
        % (1 + doc_id % 12, 1 + (doc_id + k) % 28, doc_id % 24),
        "exposure": "1/%d" % (8 * (1 + (doc_id + k) % 6)),
        "iso": 100 * (1 + (doc_id + 2 * k) % 8),
        "pixel_x": w,
        "pixel_y": h,
    }


def _exif_tiff_blob(fields: dict, big_endian: bool) -> bytes:
    """Hand-rolled two-IFD TIFF blob (IFD0 + 0x8769 EXIF sub-IFD)."""
    import struct  # noqa: PLC0415

    bo = ">" if big_endian else "<"

    def ifd(entries, ifd_off):
        """entries: [(tag, type, values)] tag-sorted → (bytes, fixups)
        where out-of-line values land right after the IFD."""
        n = len(entries)
        table = bytearray(struct.pack(bo + "H", n))
        tail = bytearray()
        tail_base = ifd_off + 2 + 12 * n + 4
        for tag, ftype, values in entries:
            if ftype == 2:
                raw = values[0].encode("ascii") + b"\x00"
                count = len(raw)
            elif ftype == 5:
                raw = b"".join(struct.pack(bo + "II", a, b) for a, b in values)
                count = len(values)
            elif ftype == 3:
                raw = struct.pack(bo + "H" * len(values), *values)
                count = len(values)
            else:  # LONG
                raw = struct.pack(bo + "I" * len(values), *values)
                count = len(values)
            if len(raw) <= 4:
                inline = raw + b"\x00" * (4 - len(raw))
            else:
                inline = struct.pack(bo + "I", tail_base + len(tail))
                tail += raw + (b"\x00" if len(raw) & 1 else b"")
            table += struct.pack(bo + "HHI", tag, ftype, count) + inline
        table += struct.pack(bo + "I", 0)  # next IFD
        return bytes(table) + bytes(tail)

    num, den = fields["exposure"].split("/")
    sub_entries = [
        (0x829A, 5, ((int(num), int(den)),)),
        (0x8827, 3, (fields["iso"],)),
        (0xA002, 4, (fields["pixel_x"],)),
        (0xA003, 4, (fields["pixel_y"],)),
    ]
    # IFD0 size must be known to place the sub-IFD: 5 entries, two
    # out-of-line ASCII values (model may inline; compute exactly)
    ifd0_entries = [
        (0x010F, 2, (fields["make"],)),
        (0x0110, 2, (fields["model"],)),
        (0x0112, 3, (fields["orientation"],)),
        (0x0132, 2, (fields["datetime"],)),
        (0x8769, 4, (0,)),  # placeholder, patched below
    ]
    ifd0 = ifd(ifd0_entries, 8)
    sub_off = 8 + len(ifd0)
    ifd0_entries[-1] = (0x8769, 4, (sub_off,))
    ifd0 = ifd(ifd0_entries, 8)
    assert 8 + len(ifd0) == sub_off  # pointer patch kept the layout
    import struct as _s  # noqa: PLC0415

    header = (b"MM" if big_endian else b"II") + _s.pack(bo + "HI", 42, 8)
    return header + ifd0 + ifd(sub_entries, sub_off)


def build_jpeg_exif(doc_id: int, k: int) -> bytes:
    """The q70 JPEG of (doc_id, k) with a closed-form EXIF APP1 segment
    spliced after SOI — the q86 writer twin (pixels unchanged, so the
    q70 pixel closed forms still hold for these bytes)."""
    import struct  # noqa: PLC0415

    base = build_jpeg(doc_id, k)
    fields = exif_closed_fields(doc_id, k)
    blob = b"Exif\x00\x00" + _exif_tiff_blob(fields, (doc_id + k) % 2 == 1)
    app1 = b"\xff\xe1" + struct.pack(">H", len(blob) + 2) + blob
    return base[:2] + app1 + base[2:]


# ---------------------------------------------------------------------------
# TIFF corpus twin (q85) — the scanned-image container: four modes
# cycle per image index to cover the decoder's axes (byte order,
# photometric inversion, strip organization, all three compressions):
#
#   mode = (doc_id + k) % 5  (doc-dependent so ALL modes appear in a
#   corpus whose per-doc image count caps at 3):
#     0  gray-8, Compression 1,     II, single strip
#     1  RGB-8,  Compression 1,     MM (big-endian), RowsPerStrip 8
#     2  bilevel, CCITT G4 (4),     II; ink where v % 5 < 2 → pixel 0,
#        else 255 — decoded output is DISPLAY truth
#     3  gray-8, PackBits (32773),  II, photometric 0 (WhiteIsZero:
#        wire bytes inverted), RowsPerStrip 16
#     4  gray-8, LZW (5) + horizontal Predictor 2, II, RowsPerStrip 8
#   width  = 8 * (2 + (doc_id + 7*k) % 5)     in 8x8 blocks bx
#   height = 8 * (1 + (2*doc_id + 11*k) % 5)  in 8x8 blocks by
#   v(c, bx, by) = (doc_id + 31*k + 7*bx + 13*by + 97*c) % 256
#   decoded pixels: modes 0/1/3 → v; mode 2 → 0 if v%5<2 else 255

from ..kernel.tiffcodec import encode_tiff  # noqa: E402


def tiff_geometry(doc_id: int, k: int) -> tuple[int, int, int, int]:
    """(mode, width, height, n_channels) for TIFF ``k`` of ``doc_id``."""
    mode = (doc_id + k) % 5
    w = 8 * (2 + (doc_id + 7 * k) % 5)
    h = 8 * (1 + (2 * doc_id + 11 * k) % 5)
    return mode, w, h, 3 if mode == 1 else 1


def tiff_pixels(doc_id: int, k: int) -> np.ndarray:
    """The closed-form DECODED pixels ((h,w,nc) uint8)."""
    mode, w, h, nc = tiff_geometry(doc_id, k)
    img = _png_grid(doc_id, k, nc, w, h)
    if mode == 2:
        return np.where(img % 5 < 2, 0, 255).astype(np.uint8)
    return img


def build_tiff(doc_id: int, k: int) -> bytes:
    """Encode TIFF ``k`` of ``doc_id`` — the writer twin."""
    mode, _w, _h, _nc = tiff_geometry(doc_id, k)
    px = tiff_pixels(doc_id, k)
    if mode == 0:
        return encode_tiff(px)
    if mode == 1:
        return encode_tiff(px, byte_order=">", rows_per_strip=8)
    if mode == 2:
        return encode_tiff(px, compression=4, photometric=0)
    if mode == 3:
        return encode_tiff(
            px, compression=32773, photometric=0, rows_per_strip=16
        )
    return encode_tiff(px, compression=5, rows_per_strip=8)
