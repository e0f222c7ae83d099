"""JPEG frame-header (SOF) metadata parse — no pixel decoding.

The image-inventory tier reports the PDF image dict's claims (/Width,
/Height, /BitsPerComponent); for /DCTDecode streams the JPEG payload
itself carries a second, independent copy of those facts in its SOFn
frame header. Real-crawl PDFs routinely disagree between the two (bad
generators, dict edits after the fact), so the inventory exposes the
codec's wire truth alongside the dict's claim and lets the analytics
decide. This is a marker walk per the public ITU-T T.81 §B.2 syntax —
segment lengths are explicit, so no entropy-coded data is ever touched
and no codec is needed.
"""

from __future__ import annotations

# SOFn markers carry a frame header; C4 (DHT), C8 (JPG), CC (DAC) do not.
_SOF = {
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
    0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
}
_PROGRESSIVE = {0xC2, 0xC6, 0xCA, 0xCE}  # progressive DCT, both entropies
_STANDALONE = {0xD8, 0xD9, 0x01} | set(range(0xD0, 0xD8))  # no length field


def jpeg_sof(data: bytes) -> tuple[int, int, int, int] | None:
    """→ (width, height, n_components, progressive 0/1) from the first
    SOFn frame header, or None when the payload is not a parseable
    JPEG. Walks marker segments only (T.81 §B.2: two-byte big-endian
    lengths include themselves), tolerates fill bytes (FF FF…) and
    stops at SOS/EOI — entropy-coded bytes are never scanned."""
    n = len(data)
    if n < 4 or data[0] != 0xFF or data[1] != 0xD8:  # SOI
        return None
    i = 2
    while i + 1 < n:
        if data[i] != 0xFF:
            return None  # desynchronized — not a marker where one is due
        while i + 1 < n and data[i + 1] == 0xFF:
            i += 1  # fill bytes
        if i + 1 >= n:
            return None
        marker = data[i + 1]
        i += 2
        if marker in _STANDALONE:
            if marker == 0xD9:  # EOI before any SOF
                return None
            continue
        if i + 1 >= n:
            return None
        seg_len = (data[i] << 8) | data[i + 1]
        if seg_len < 2 or i + seg_len > n:
            return None
        if marker in _SOF:
            # precision(1) height(2) width(2) ncomp(1)
            if seg_len < 8:
                return None
            h = (data[i + 3] << 8) | data[i + 4]
            w = (data[i + 5] << 8) | data[i + 6]
            nc = data[i + 7]
            return (w, h, nc, 1 if marker in _PROGRESSIVE else 0)
        if marker == 0xDA:  # SOS with no prior SOF — give up
            return None
        i += seg_len
    return None


def synth_jpeg_header(
    width: int, height: int, n_components: int, progressive: bool,
    entropy: bytes,
) -> bytes:
    """A minimal well-formed JPEG byte stream (SOI + SOFn + SOS +
    entropy + EOI) for deterministic test corpora: ``jpeg_sof`` and any
    spec-conforming header reader recover exactly (width, height,
    n_components, progressive). Total length is the closed form
    ``22 + 5*n_components + len(entropy)``."""
    sof_marker = 0xC2 if progressive else 0xC0
    comps = b"".join(
        bytes((cid + 1, 0x11, 0)) for cid in range(n_components)
    )
    sof = bytes((0xFF, sof_marker)) + (8 + 3 * n_components).to_bytes(2, "big") + bytes(
        (8,)
    ) + height.to_bytes(2, "big") + width.to_bytes(2, "big") + bytes(
        (n_components,)
    ) + comps
    scomps = b"".join(bytes((cid + 1, 0)) for cid in range(n_components))
    sos = bytes((0xFF, 0xDA)) + (6 + 2 * n_components).to_bytes(2, "big") + bytes(
        (n_components,)
    ) + scomps + bytes((0, 63, 0))
    return b"\xff\xd8" + sof + sos + entropy + b"\xff\xd9"
