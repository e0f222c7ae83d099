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


def build_avi(doc_id: int, k: int) -> bytes:
    """Encode clip ``k`` of ``doc_id`` — the writer twin. Odd
    ``doc_id + k`` clips ship as Motion-JPEG, even as uncompressed
    BI_RGB: the flat-8x8-block frames round-trip bit-exactly through
    the T.81 codec (all-ones quant, RGB passthrough), so ONE set of
    closed forms oracles both wire codecs — q77 exercises the MJPG
    decode path on half the corpus without a second oracle."""
    _w, _h, n, scale = avi_geometry(doc_id, k)
    frames = [avi_frame_pixels(doc_id, k, f) for f in range(n)]
    codec = "MJPG" if (doc_id + k) % 2 else "DIB"
    return encode_avi(frames, rate=1000, scale=scale, codec=codec)
