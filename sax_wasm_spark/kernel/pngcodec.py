"""PNG codec (RFC 2083 / ISO 15948) — from-scratch encode + decode on
stdlib zlib + numpy.

This extends the multimodal tier's REAL-decode leg beyond JPEG
(kernel/jpegcodec.py): a full 8-bit-depth PNG decoder — chunk walk with
CRC verification, IHDR validation, IDAT concatenation, bounded zlib
inflate, all five scanline filters (None/Sub/Up/Average/Paeth),
grayscale / truecolor / palette / alpha color types — plus an encoder
twin whose per-row filter choice cycles through all five types, so a
deterministic corpus exercises every decode path. External image
libraries (Pillow/libpng) are absent in this environment; the reference
repo has no image surface at all (sax-wasm is an XML tokenizer,
``/root/reference/src/sax/parser.rs:1``) — this tier belongs to the
assignment's multimodal/training-data scope.

Design constraints, same policy as the JPEG codec:

- **Per-row CPU work, zero shuffle** — operators run it inside
  mapInPandas/mapInArrow batches; nothing here touches Spark.
- **Hostile-input budget**: dimensions are capped BEFORE the inflate
  (``max_pixels``, default 4 MPx — the Average/Paeth unfilters walk
  bytes in Python, so the cap is the straggler bound), the inflate
  itself is bounded to the expected scanline volume (a 100-byte zip
  bomb cannot allocate gigabytes), and every malformed structure
  raises a typed ``PngError`` so poison payloads degrade to
  ``status='error:*'`` rows.
- **Exactness**: PNG is lossless — every decode is bit-exact, so
  closed-form pixel corpora oracle directly (q72), no quantization
  contract needed.

Scope: 8-bit sample depth, no interlacing. Adam7 interlace, 16-bit
depth, and sub-byte gray depths raise typed errors naming the feature —
real-crawl shares of those are small and an error row is the designed
degradation.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass

import numpy as np


class PngError(ValueError):
    """Typed failure for malformed/unsupported PNG payloads — callers
    map it to an ``error:*`` status row, never a crash or straggler."""


PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# IHDR color type → samples per pixel (before palette expansion)
_TYPE_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


@dataclass
class PngImage:
    """Decoded pixels (palette already expanded to RGB) plus the
    stream facts a pipeline routes on."""

    planes: np.ndarray  # uint8 (h, w, ncomp)
    width: int
    height: int
    n_components: int  # after palette expansion
    color_type: int  # the wire's IHDR color type


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Scanline unfilter → (h, stride) uint8 of reconstructed bytes.
    None/Up are fully vectorized; Sub/Average/Paeth carry a sequential
    left-pixel dependency, so they walk the row as plain Python ints
    over lists (several times faster than per-element numpy indexing;
    ``max_pixels`` stays the straggler bound)."""
    out = bytearray(h * stride)
    prev: list[int] = [0] * stride
    pos = 0
    rng_bpp = range(bpp)
    rng_rest = range(bpp, stride)
    for y in range(h):
        ftype = raw[pos]
        row = raw[pos + 1 : pos + 1 + stride]
        pos += 1 + stride
        if ftype == 0:
            rec = list(row)
        elif ftype == 1:  # Sub
            rec = list(row[:bpp])
            ap = rec.append
            for x in rng_rest:
                ap((row[x] + rec[x - bpp]) & 0xFF)
        elif ftype == 2:  # Up
            rec = [(a + b) & 0xFF for a, b in zip(row, prev)]
        elif ftype == 3:  # Average
            rec = [(row[x] + (prev[x] >> 1)) & 0xFF for x in rng_bpp]
            ap = rec.append
            for x in rng_rest:
                ap((row[x] + ((rec[x - bpp] + prev[x]) >> 1)) & 0xFF)
        elif ftype == 4:  # Paeth
            rec = [(row[x] + prev[x]) & 0xFF for x in rng_bpp]
            ap = rec.append
            for x in rng_rest:
                a = rec[x - bpp]
                b = prev[x]
                c = prev[x - bpp]
                p = a + b - c
                pa = p - a if p >= a else a - p
                pb = p - b if p >= b else b - p
                pc = p - c if p >= c else c - p
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                ap((row[x] + pred) & 0xFF)
        else:
            raise PngError(f"unknown filter type {ftype}")
        out[y * stride : (y + 1) * stride] = bytes(rec)
        prev = rec
    return np.frombuffer(bytes(out), dtype=np.uint8).reshape(h, stride)


def decode_png(data: bytes, max_pixels: int = 1 << 22) -> PngImage:
    """Decode an 8-bit-depth PNG to uint8 pixels (palette expanded).

    Supports color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+
    alpha), 6 (RGBA), non-interlaced, 8-bit depth. Raises ``PngError``
    on anything else — Adam7 interlace, 16-bit / sub-byte depths —
    naming the unsupported feature. CRCs are verified on every chunk;
    ``max_pixels`` bounds hostile dimension claims before the inflate
    allocates anything."""
    if not data.startswith(PNG_SIGNATURE):
        raise PngError("not a PNG (missing signature)")
    pos = len(PNG_SIGNATURE)
    n = len(data)
    ihdr = None
    palette: np.ndarray | None = None
    idat = bytearray()
    ended = False
    while pos + 8 <= n:
        length, ctype = struct.unpack(">I4s", data[pos : pos + 8])
        if length > n - pos - 12:
            raise PngError("chunk length exceeds file")
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise PngError(f"CRC mismatch in {ctype.decode('latin-1')}")
        pos += 12 + length
        if ctype == b"IHDR":
            if ihdr is not None:
                raise PngError("duplicate IHDR")
            if length != 13:
                raise PngError("IHDR length")
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            if length % 3 or length == 0 or length > 768:
                raise PngError("PLTE length")
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3).copy()
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            ended = True
            break
        # ancillary chunks (tEXt, pHYs, tRNS, …) are skipped; critical
        # unknown chunks (uppercase first letter) must not be
        elif not (ctype[0] & 0x20):
            raise PngError(f"unknown critical chunk {ctype.decode('latin-1')}")
    if ihdr is None:
        raise PngError("missing IHDR")
    if not ended:
        raise PngError("missing IEND")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise PngError("unknown compression/filter method")
    if interlace != 0:
        raise PngError("Adam7 interlace unsupported")
    if color_type not in _TYPE_CHANNELS:
        raise PngError(f"unknown color type {color_type}")
    if depth != 8:
        raise PngError(f"bit depth {depth} unsupported (8 only)")
    if w == 0 or h == 0:
        raise PngError("zero dimension")
    if w * h > max_pixels:
        raise PngError(f"image {w}x{h} exceeds pixel budget {max_pixels}")
    ch = _TYPE_CHANNELS[color_type]
    stride = w * ch
    expect = h * (1 + stride)
    try:
        d = zlib.decompressobj()
        raw = d.decompress(bytes(idat), expect)
        if d.unconsumed_tail or (d.decompress(b"", 1)):
            raise PngError("IDAT inflates past scanline volume")
        raw += d.flush()
    except zlib.error as e:
        raise PngError(f"IDAT inflate failed: {e}") from e
    if len(raw) != expect:
        raise PngError(f"scanline volume {len(raw)} != expected {expect}")
    rec = _unfilter(raw, h, stride, ch).reshape(h, w, ch)
    if color_type == 3:
        if palette is None:
            raise PngError("palette image without PLTE")
        idx = rec[:, :, 0]
        if int(idx.max()) >= len(palette):
            raise PngError("palette index out of range")
        rec = palette[idx]
        return PngImage(rec, w, h, 3, color_type)
    return PngImage(rec, w, h, ch, color_type)


def encode_png(
    pixels: np.ndarray,
    color_type: int | None = None,
    palette: np.ndarray | None = None,
    level: int = 6,
) -> bytes:
    """Encode uint8 pixels to PNG. ``pixels`` is (h,w) gray, (h,w,3)
    RGB, (h,w,2) gray+alpha, or (h,w,4) RGBA — or, with
    ``color_type=3``, an (h,w) array of palette indices plus a
    ``palette`` of (n,3) RGB entries. The per-row filter type cycles
    ``row % 5`` through None/Sub/Up/Average/Paeth so a corpus written
    by this twin exercises every unfilter path in the decoder."""
    px = np.asarray(pixels, dtype=np.uint8)
    if color_type == 3:
        if px.ndim != 2:
            raise PngError("palette pixels must be (h,w) indices")
        if palette is None or palette.ndim != 2 or palette.shape[1] != 3:
            raise PngError("palette must be (n,3)")
        if len(palette) > 256 or int(px.max(initial=0)) >= len(palette):
            raise PngError("palette index out of range")
        ch = 1
    else:
        if px.ndim == 2:
            ch, color_type = 1, 0
        elif px.ndim == 3 and px.shape[2] in (2, 3, 4):
            ch = px.shape[2]
            color_type = {2: 4, 3: 2, 4: 6}[ch]
        else:
            raise PngError("pixels must be (h,w) or (h,w,{2,3,4})")
    h, w = px.shape[0], px.shape[1]
    if h == 0 or w == 0:
        raise PngError("zero dimension")
    flat = px.reshape(h, w * ch)
    stride = w * ch
    # Every predictor reads only RAW pixels (unlike decode, where the
    # left/up neighbors are reconstructed), so all five filters
    # vectorize over the whole image at once. The per-row filter type
    # still cycles y % 5; the interleaved type byte is column 0.
    sh = np.zeros((h, stride), dtype=np.int16)  # left neighbor
    sh[:, ch:] = flat[:, :-ch]
    up = np.zeros((h, stride), dtype=np.int16)  # up neighbor
    up[1:] = flat[:-1]
    ul = np.zeros((h, stride), dtype=np.int16)  # upper-left neighbor
    ul[1:, ch:] = flat[:-1, :-ch]
    enc = np.empty((h, 1 + stride), dtype=np.uint8)
    enc[:, 0] = (np.arange(h) % 5).astype(np.uint8)
    body = enc[:, 1:]
    # the y % 5 filter cycle means each filter's rows form a stride-5
    # slice — views, not boolean-mask copies (r8: ~2x on small images)
    body[0::5] = flat[0::5]
    body[1::5] = (flat[1::5] - sh[1::5]).astype(np.uint8)
    body[2::5] = (flat[2::5] - up[2::5]).astype(np.uint8)
    body[3::5] = (flat[3::5] - ((sh[3::5] + up[3::5]) >> 1)).astype(np.uint8)
    a, b, c = sh[4::5], up[4::5], ul[4::5]
    if a.size:
        p = a + b - c
        pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
        pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
        body[4::5] = (flat[4::5] - pred).astype(np.uint8)
    lines = enc.tobytes()

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    out = bytearray(PNG_SIGNATURE)
    out += chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
    if color_type == 3:
        out += chunk(b"PLTE", np.asarray(palette, dtype=np.uint8).tobytes())
    out += chunk(b"IDAT", zlib.compress(bytes(lines), level))
    out += chunk(b"IEND", b"")
    return bytes(out)
