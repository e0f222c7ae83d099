"""Baseline JPEG codec (kernel/jpegcodec.py) — round-trip exactness,
wire-format details (stuffing, restarts, 16-bit DQT, EXTEND), typed
failure modes, and agreement with the SOF metadata walk (jpegmeta.py).

No Spark session here — the codec is pure numpy, the operator layer is
covered in test_spark_operators.py / the q70/q71 oracles.
"""

from __future__ import annotations

import numpy as np
import pytest

from sax_wasm_spark.kernel.jpegcodec import (
    JpegError,
    decode_jpeg,
    decode_jpeg_rgb,
    encode_jpeg,
    rgb_to_ycbcr,
    ycbcr_to_rgb,
)
from sax_wasm_spark.kernel.jpegmeta import jpeg_sof, synth_jpeg_header


def _flat_blocks(h: int, w: int, nc: int, f, block: int = 8) -> np.ndarray:
    """Image whose value is constant per (block x block) tile: f(c,bx,by)."""
    img = np.zeros((h, w, nc), dtype=np.uint8)
    for c in range(nc):
        for by in range((h + block - 1) // block):
            for bx in range((w + block - 1) // block):
                img[by * block : (by + 1) * block, bx * block : (bx + 1) * block, c] = f(
                    c, bx, by
                )
    return img[:, :, 0] if nc == 1 else img


class TestRoundTrip:
    def test_flat_gray_exact(self):
        img = _flat_blocks(24, 40, 1, lambda c, bx, by: (7 * bx + 13 * by + 5) % 256)
        out = decode_jpeg(encode_jpeg(img))
        assert (out.width, out.height, out.n_components) == (40, 24, 1)
        assert np.array_equal(out.planes[:, :, 0], img)

    def test_flat_gray_partial_blocks_exact(self):
        # non-multiple-of-8 dims: edge blocks pad by replication, so a
        # per-block-constant image still round-trips exactly after crop
        img = _flat_blocks(19, 27, 1, lambda c, bx, by: (11 * bx + 3 * by) % 256)
        out = decode_jpeg(encode_jpeg(img))
        assert np.array_equal(out.planes[:, :, 0], img)

    def test_flat_3ch_444_exact(self):
        img = _flat_blocks(
            19, 27, 3, lambda c, bx, by: (7 * bx + 13 * by + 97 * c + 11) % 256
        )
        out = decode_jpeg(encode_jpeg(img, adobe_transform=0))
        assert out.adobe_transform == 0
        assert np.array_equal(out.planes, img)

    def test_flat_3ch_420_exact(self):
        img = _flat_blocks(
            32, 48, 3, lambda c, bx, by: (3 * bx + 19 * by + 41 * c + 2) % 256,
            block=16,
        )
        out = decode_jpeg(encode_jpeg(img, subsampling="420", adobe_transform=0))
        assert np.array_equal(out.planes, img)

    def test_random_gray_tolerance(self):
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (33, 41), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img))
        assert np.abs(out.planes[:, :, 0].astype(int) - img.astype(int)).max() <= 2

    def test_random_3ch_444_tolerance(self):
        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, adobe_transform=0))
        assert np.abs(out.planes.astype(int) - img.astype(int)).max() <= 2

    def test_single_pixel(self):
        img = np.array([[173]], dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img))
        assert out.planes[0, 0, 0] == 173

    def test_extreme_values(self):
        img = _flat_blocks(16, 16, 1, lambda c, bx, by: 255 * ((bx + by) % 2))
        out = decode_jpeg(encode_jpeg(img))
        assert np.array_equal(out.planes[:, :, 0], img)

    def test_quantized_lossy_but_close(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (24, 24), dtype=np.uint8)
        q = np.full(64, 16, dtype=np.int64)
        out = decode_jpeg(encode_jpeg(img, quant=q))
        # heavy quantization: bounded by sum of per-coefficient errors
        assert np.abs(out.planes[:, :, 0].astype(int) - img.astype(int)).max() <= 64


class TestWireFormat:
    def test_restart_markers_resync(self):
        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, (40, 40), dtype=np.uint8)
        data = encode_jpeg(img, restart_interval=2)
        assert b"\xff\xd0" in data  # RST0 present
        out = decode_jpeg(data)
        assert out.restart_interval == 2
        assert np.abs(out.planes[:, :, 0].astype(int) - img.astype(int)).max() <= 2

    def test_byte_stuffing_round_trip(self):
        # hunt a payload that actually produced a stuffed FF00 pair
        for seed in range(40):
            rng = np.random.default_rng(seed)
            img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
            data = encode_jpeg(img)
            sos = data.index(b"\xff\xda")
            if b"\xff\x00" in data[sos:]:
                out = decode_jpeg(data)
                assert (
                    np.abs(out.planes[:, :, 0].astype(int) - img.astype(int)).max()
                    <= 2
                )
                return
        pytest.fail("no stuffed byte produced in 40 seeds")

    def test_16bit_dqt_decodes(self):
        img = _flat_blocks(16, 16, 1, lambda c, bx, by: (50 * bx + 90 * by) % 256)
        data = bytearray(encode_jpeg(img))
        # rewrite the 8-bit DQT segment (Pq=0) as 16-bit (Pq=1)
        i = data.index(b"\xff\xdb")
        seg_len = (data[i + 2] << 8) | data[i + 3]
        assert seg_len == 2 + 1 + 64
        qvals = bytes(data[i + 5 : i + 5 + 64])
        wide = b"".join(bytes((0, v)) for v in qvals)
        new_seg = b"\xff\xdb" + (2 + 1 + 128).to_bytes(2, "big") + bytes(
            (0x10,)
        ) + wide
        out_bytes = bytes(data[:i]) + new_seg + bytes(data[i + 2 + seg_len :])
        out = decode_jpeg(out_bytes)
        assert np.array_equal(out.planes[:, :, 0], img)

    def test_negative_dc_diffs(self):
        # strictly decreasing block means exercise EXTEND's negative leg
        img = _flat_blocks(8, 64, 1, lambda c, bx, by: 250 - 30 * bx)
        out = decode_jpeg(encode_jpeg(img))
        assert np.array_equal(out.planes[:, :, 0], img)

    def test_fill_bytes_tolerated(self):
        img = _flat_blocks(8, 8, 1, lambda c, bx, by: 100)
        data = encode_jpeg(img)
        # insert an FF fill byte before the DQT marker (B.1.1.2)
        i = data.index(b"\xff\xdb")
        padded = data[:i] + b"\xff" + data[i:]
        out = decode_jpeg(padded)
        assert np.array_equal(out.planes[:, :, 0], img)

    def test_sof_metadata_walk_agrees(self):
        img = _flat_blocks(24, 16, 3, lambda c, bx, by: (c * 40 + bx) % 256)
        data = encode_jpeg(img, adobe_transform=0)
        sof = jpeg_sof(data)
        assert sof == (16, 24, 3, 0)


class TestColor:
    def test_rgb_ycbcr_inverse_pair(self):
        rng = np.random.default_rng(13)
        rgb = rng.integers(0, 256, (9, 9, 3), dtype=np.uint8)
        back = ycbcr_to_rgb(rgb_to_ycbcr(rgb))
        assert np.abs(back.astype(int) - rgb.astype(int)).max() <= 2

    def test_decode_rgb_transform0_passthrough(self):
        img = _flat_blocks(8, 8, 3, lambda c, bx, by: 20 + 60 * c)
        out = decode_jpeg_rgb(encode_jpeg(img, adobe_transform=0))
        assert np.array_equal(out.planes, img)

    def test_decode_rgb_default_converts(self):
        rgb = _flat_blocks(8, 8, 3, lambda c, bx, by: (30, 120, 200)[c])
        ycc = rgb_to_ycbcr(rgb)
        out = decode_jpeg_rgb(encode_jpeg(ycc))  # no APP14 → YCbCr assumed
        assert np.abs(out.planes.astype(int) - rgb.astype(int)).max() <= 3

    def test_gray_passthrough(self):
        img = _flat_blocks(8, 8, 1, lambda c, bx, by: 77)
        out = decode_jpeg_rgb(encode_jpeg(img))
        assert np.array_equal(out.planes[:, :, 0], img)


class TestErrors:
    def test_not_jpeg(self):
        for bad in (b"", b"PK\x03\x04", b"\xff\xd9"):
            with pytest.raises(JpegError):
                decode_jpeg(bad)

    def test_truncated_entropy(self):
        img = _flat_blocks(64, 64, 1, lambda c, bx, by: (bx * by * 37) % 256)
        data = encode_jpeg(img)
        with pytest.raises(JpegError):
            decode_jpeg(data[: len(data) // 2])

    def test_progressive_typed_rejection(self):
        # jpegmeta's synthetic header is SOF2 when progressive=True
        data = synth_jpeg_header(32, 32, 1, True, b"\x00" * 8)
        with pytest.raises(JpegError, match="progressive"):
            decode_jpeg(data)

    def test_header_only_synth_rejected(self):
        # the q58 inventory payloads carry no DQT/DHT — decode must
        # fail typed, never crash
        data = synth_jpeg_header(32, 32, 1, False, b"\xa5" * 16)
        with pytest.raises(JpegError):
            decode_jpeg(data)

    def test_pixel_budget(self):
        img = _flat_blocks(8, 8, 1, lambda c, bx, by: 1)
        data = bytearray(encode_jpeg(img))
        i = data.index(b"\xff\xc0")
        data[i + 5 : i + 7] = (30000).to_bytes(2, "big")  # claim h=30000
        data[i + 7 : i + 9] = (30000).to_bytes(2, "big")  # claim w=30000
        with pytest.raises(JpegError, match="budget"):
            decode_jpeg(bytes(data), max_pixels=1 << 24)

    def test_missing_tables(self):
        img = _flat_blocks(8, 8, 1, lambda c, bx, by: 1)
        data = encode_jpeg(img)
        i = data.index(b"\xff\xdb")
        seg_len = (data[i + 2] << 8) | data[i + 3]
        stripped = data[:i] + data[i + 2 + seg_len :]
        with pytest.raises(JpegError, match="DQT"):
            decode_jpeg(stripped)

    def test_encoder_rejects_bad_shapes(self):
        with pytest.raises(JpegError):
            encode_jpeg(np.zeros((4, 4, 2), dtype=np.uint8))
        with pytest.raises(JpegError):
            encode_jpeg(np.zeros((0, 4), dtype=np.uint8))
        with pytest.raises(JpegError):
            encode_jpeg(np.zeros((4, 4), dtype=np.uint8), quant=np.zeros(64))
