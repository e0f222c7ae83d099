"""Deterministic AVI corpus twin for the video-decode oracle (q77).

Same pattern as the image/audio twins: every byte is a closed form of
``(doc_id, k)`` so a DuckDB oracle reproduces the decoded frame
statistics without touching a single AVI byte. Uncompressed BI_RGB is
lossless, and the flat-8x8-block frames survive the T.81 DCT with
all-ones quantization bit-exactly, so the closed forms ARE the decoded
pixels for BOTH wire codecs — clips alternate uncompressed/'MJPG' by
``(doc_id + k) % 2``.

Closed forms (all arithmetic in integers; % is non-negative):

    n_frames = 1 + (doc_id + k) % 3
    width    = 8 * (2 + (doc_id + 7*k) % 5)     in 8x8 blocks bx
    height   = 8 * (1 + (2*doc_id + 11*k) % 5)  in 8x8 blocks by
    value(f, c, bx, by) = (doc_id + 31*k + 41*f + 7*bx + 13*by + 97*c) % 256
    rate = 1000, scale = 40 + 8*((doc_id + k) % 5)
      → frame duration = scale ms exactly, duration_ms = n_frames * scale

The reference repo has no media surface (sax-wasm is an XML tokenizer,
`/root/reference/src/sax/parser.rs:1`); this corpus serves the
assignment's multimodal tier.
"""

from __future__ import annotations

import numpy as np

from ..kernel.avicodec import encode_avi


def avi_geometry(doc_id: int, k: int) -> tuple[int, int, int, int]:
    """(width, height, n_frames, scale) for clip ``k`` of ``doc_id``
    (rate is always 1000, so frame duration in ms == scale)."""
    w = 8 * (2 + (doc_id + 7 * k) % 5)
    h = 8 * (1 + (2 * doc_id + 11 * k) % 5)
    return w, h, 1 + (doc_id + k) % 3, 40 + 8 * ((doc_id + k) % 5)


def avi_frame_pixels(doc_id: int, k: int, f: int) -> np.ndarray:
    """The closed-form decoded RGB pixels of frame ``f`` ((h,w,3) uint8)."""
    w, h, _n, _s = avi_geometry(doc_id, k)
    bx = np.arange(w // 8).reshape(1, -1, 1)
    by = np.arange(h // 8).reshape(-1, 1, 1)
    c = np.arange(3).reshape(1, 1, -1)
    vals = (doc_id + 31 * k + 41 * f + 7 * bx + 13 * by + 97 * c) % 256
    return np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1).astype(np.uint8)


def avi_audio_shape(doc_id: int, k: int) -> tuple[int, int, int]:
    """(sample_rate, n_channels, n_sample_frames) of clip ``k``'s PCM
    audio track (closed forms for the q79 demux oracle)."""
    return (
        8000 + 1000 * ((doc_id + k) % 4),
        1 + (doc_id + k) % 2,
        100 + (doc_id + 3 * k) % 50,
    )


def avi_audio_samples(doc_id: int, k: int) -> np.ndarray:
    """The closed-form int16 PCM samples ((n, ch)):
    sample(s, ch) = ((doc_id*7 + 11*k + 13*s + 29*ch) % 4096) - 2048."""
    _rate, ch, n = avi_audio_shape(doc_id, k)
    s = np.arange(n).reshape(-1, 1)
    c = np.arange(ch).reshape(1, -1)
    return (
        (doc_id * 7 + 11 * k + 13 * s + 29 * c) % 4096 - 2048
    ).astype(np.int16)


def build_avi(doc_id: int, k: int) -> bytes:
    """Encode clip ``k`` of ``doc_id`` — the writer twin. Odd
    ``doc_id + k`` clips ship as Motion-JPEG, even as uncompressed
    BI_RGB: the flat-8x8-block frames round-trip bit-exactly through
    the T.81 codec (all-ones quant, RGB passthrough), so ONE set of
    closed forms oracles both wire codecs — q77 exercises the MJPG
    decode path on half the corpus without a second oracle. Every clip
    also muxes a closed-form PCM 'auds' stream ('01wb' chunks
    interleaved per frame) — the q79 demux oracle's side of the same
    corpus; PCM is lossless so those closed forms ARE the samples."""
    _w, _h, n, scale = avi_geometry(doc_id, k)
    frames = [avi_frame_pixels(doc_id, k, f) for f in range(n)]
    codec = "MJPG" if (doc_id + k) % 2 else "DIB"
    rate_a, _ch, _n = avi_audio_shape(doc_id, k)
    return encode_avi(
        frames, rate=1000, scale=scale, codec=codec,
        audio=(avi_audio_samples(doc_id, k), rate_a),
    )


# ---------------------------------------------------------------------------
# video perceptual-dedup corpus (q78) — the temporal analogue of the
# imagegen phash forms: every document's CLIP ships as four renditions
# that differ by wire codec (DIB vs MJPG), spatial scale, and a
# per-pixel affine transform (brightness shift / channel color cast),
# so the per-frame 64-bit dHash sequence — the video signature —
# collides across all of them BY CONSTRUCTION, while every third doc's
# rendition 3 carries the all-bits-flipped frames (a genuinely
# different video) and lands in its own cluster.
#
#   n_frames = 2 + doc_id % 3            (>=2: see the collision note)
#   per-frame hash words (frame f):
#     lo32 = (doc_id * 2654435761 + f * 2246822519) % 2^32
#     hi32 = (doc_id * 40503 + f * 668265263 + 2739110765) % 2^32
#     flip → xor both with 0xFFFFFFFF
#   signature = concat over f of '%08x%08x' % (hi32, lo32)
#   renditions: 0 DIB gray, 1 MJPG +brightness, 2 DIB color cast,
#               3 MJPG (+2+doc%11 shift; FLIPPED when doc_id % 3 == 0)
#
# With >=2 frames a flipped signature can never equal any unflipped
# one: frame f would need (d2+d)*A ≡ 0xFFFFFFFF - 2*f*B (mod 2^32)
# for every f, and distinct f demand distinct sums. Unflipped ones are
# doc-injective via frame 0 (odd multiplier = bijection mod 2^32).


def n_vframes(doc_id: int) -> int:
    return 2 + doc_id % 3


def vhash_words(doc_id: int, f: int, flip: bool = False) -> tuple[int, int]:
    """(hi32, lo32) of frame ``f``'s closed-form dHash."""
    lo = (doc_id * 2654435761 + f * 2246822519) % (1 << 32)
    hi = (doc_id * 40503 + f * 668265263 + 2739110765) % (1 << 32)
    if flip:
        lo ^= 0xFFFFFFFF
        hi ^= 0xFFFFFFFF
    return hi, lo


def vhash_hex(doc_id: int, flip: bool = False) -> str:
    """The closed-form signature string the oracle computes in SQL."""
    return "".join(
        "%08x%08x" % vhash_words(doc_id, f, flip) for f in range(n_vframes(doc_id))
    )


from .imagegen import cells_from_word  # noqa: E402 — THE canonical walk


def vhash_frame_cells(doc_id: int, f: int, flip: bool = False) -> np.ndarray:
    """(8, 9) cell values realizing frame ``f``'s bit pattern."""
    hi, lo = vhash_words(doc_id, f, flip)
    return cells_from_word((hi << 32) | lo)


def vhash_geometry(doc_id: int, r: int) -> tuple[int, int]:
    """(cell_w, cell_h) for rendition ``r`` — multiples of 8 so the
    MJPG renditions stay block-constant (T.81 exactness contract) and
    the dHash sample windows align to whole cells."""
    return 8 * (1 + (doc_id + r) % 3), 8 * (1 + (2 * doc_id + r) % 2)


def build_vhash_rendition(doc_id: int, r: int) -> bytes:
    """Rendition ``r`` (0..3) of ``doc_id``'s clip — the writer twin."""
    flip = r == 3 and doc_id % 3 == 0
    cw, ch = vhash_geometry(doc_id, r)
    a = b = c = 0
    if r == 1:
        a = b = c = 1 + doc_id % 15
    elif r == 2:
        a, b, c = doc_id % 3, doc_id % 5, doc_id % 7
    elif r == 3 and not flip:
        a = b = c = 2 + doc_id % 11
    frames = []
    for f in range(n_vframes(doc_id)):
        base = vhash_frame_cells(doc_id, f, flip)
        base = np.repeat(np.repeat(base, ch, axis=0), cw, axis=1)
        frames.append(
            np.stack(
                [base + np.uint8(a), base + np.uint8(b), base + np.uint8(c)],
                axis=2,
            )
        )
    codec = "MJPG" if r in (1, 3) else "DIB"
    return encode_avi(frames, rate=1000, scale=40, codec=codec)


# ---------------------------------------------------------------------------
# cross-modal frame↔image corpus (q80): for every doc, each video frame
# has a standalone STILL-IMAGE rendition on the crawl (a brightness-
# shifted grayscale JPEG at its own spatial scale), plus one DECOY
# image whose hash word can provably never collide with any frame:
#
#   decoy words: lo32 = (doc_id * 2654435761 + 3735928559) % 2^32
#                hi32 = (doc_id * 40503 + 2739110765 + 889275714) % 2^32
#
# No-collision proof (checked numerically over the full 2^32 doc
# range): equating any two of {frame word, flipped frame word, decoy
# word} across docs forces a doc delta/sum from the lo32 equation
# whose hi32 equation is then inconsistent for every frame index
# combination — so the q80 join's match set is EXACTLY the designed
# (doc, frame) pairs, with decoys matching nothing.


def vdecoy_words(doc_id: int) -> tuple[int, int]:
    lo = (doc_id * 2654435761 + 3735928559) % (1 << 32)
    hi = (doc_id * 40503 + 2739110765 + 889275714) % (1 << 32)
    return hi, lo


def build_vframe_image(doc_id: int, f: int) -> bytes:
    """The standalone still-image rendition of video frame ``f`` — a
    grayscale JPEG of the same dHash cells at its own scale with a
    brightness shift (channel-SUM luma makes the hash invariant to
    both, so it collides with the 3-channel video frame exactly)."""
    from ..kernel.jpegcodec import encode_jpeg  # noqa: PLC0415

    cw = 8 * (1 + (doc_id + f) % 2)
    ch = 8 * (1 + (2 * doc_id + f) % 3)
    base = vhash_frame_cells(doc_id, f)
    img = np.repeat(np.repeat(base, ch, axis=0), cw, axis=1)
    return encode_jpeg(img + np.uint8(1 + doc_id % 15))


def build_vframe_decoy(doc_id: int) -> bytes:
    """A grayscale JPEG realizing the decoy word — sniffs/decodes fine
    but joins to no video frame."""
    from ..kernel.jpegcodec import encode_jpeg  # noqa: PLC0415

    hi, lo = vdecoy_words(doc_id)
    base = cells_from_word((hi << 32) | lo)
    img = np.repeat(np.repeat(base, 8, axis=0), 8, axis=1)
    return encode_jpeg(img)
