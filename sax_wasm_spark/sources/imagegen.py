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
