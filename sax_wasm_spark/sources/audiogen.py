"""Deterministic WAV corpus twin for the audio-decode oracle (q73).

Same pattern as imagegen/pdfgen/warc writer twins: every byte is a
closed form of ``(doc_id, k)`` so a DuckDB oracle reproduces the
decoded sample statistics without touching a WAV byte. Samples are
CONSTANT per 64-frame block (the audio analogue of the image twins'
8x8 pixel blocks), so the oracle enumerates blocks, not frames, and
PCM losslessness makes the block grid the decoded samples exactly.

Modes cycle per clip index to cover the decoder's axes:

- ``k % 3 == 0`` — mono, 16-bit, 8000 Hz;
- ``k % 3 == 1`` — stereo, 16-bit, 16000 Hz;
- ``k % 3 == 2`` — stereo, 8-bit, 11025 Hz (unsigned wire samples,
  re-centered by the decoder).

Closed forms (all arithmetic in integers; % is non-negative):

    n_blocks = 2 + (doc_id + 5*k) % 9        (64 frames per block)
    n_frames = 64 * n_blocks
    value(c, b) = ((doc_id*7 + 31*k + 11*c + 17*b) % 256) - 128
                  [8-bit mode]
    value(c, b) = ((doc_id*7 + 31*k + 11*c + 17*b) % 4096) - 2048
                  [16-bit modes]

The reference repo has no audio surface (sax-wasm is an XML tokenizer,
`/root/reference/src/sax/parser.rs:1`); this corpus serves the
assignment's multimodal tier.
"""

from __future__ import annotations

import numpy as np

from ..kernel.wavcodec import encode_wav

_BLOCK = 64


def wav_geometry(doc_id: int, k: int) -> tuple[int, int, int, int, int]:
    """(mode, n_channels, sample_rate, bits, n_frames) for clip ``k``."""
    mode = k % 3
    n_ch = 1 if mode == 0 else 2
    rate = (8000, 16000, 11025)[mode]
    bits = 8 if mode == 2 else 16
    n_frames = _BLOCK * (2 + (doc_id + 5 * k) % 9)
    return mode, n_ch, rate, bits, n_frames


def wav_samples(doc_id: int, k: int) -> np.ndarray:
    """The closed-form sample array, int32 (n_frames, n_channels)."""
    mode, n_ch, _rate, bits, n_frames = wav_geometry(doc_id, k)
    span = 256 if bits == 8 else 4096
    b = np.arange(n_frames // _BLOCK).reshape(-1, 1)
    c = np.arange(n_ch).reshape(1, -1)
    vals = (doc_id * 7 + 31 * k + 11 * c + 17 * b) % span - span // 2
    return np.repeat(vals, _BLOCK, axis=0).astype(np.int32)


def build_wav(doc_id: int, k: int) -> bytes:
    """Encode clip ``k`` of ``doc_id`` — the writer twin."""
    _mode, _n_ch, rate, bits, _n_frames = wav_geometry(doc_id, k)
    return encode_wav(wav_samples(doc_id, k), rate, bits=bits)
