"""AVI codec (kernel/avicodec.py): uncompressed BI_RGB roundtrips,
RIFF chunk-walk robustness, typed rejections, hostile-claim budgets,
and the videogen corpus twin's closed forms. Spark plumbing is covered
by the q77 oracle and test_spark_operators.py."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sax_wasm_spark.kernel.avicodec import AviError, decode_avi, encode_avi
from sax_wasm_spark.sources.videogen import (
    avi_frame_pixels,
    avi_geometry,
    build_avi,
)


def _rng():
    return np.random.RandomState(7)


def _frames(n, h, w):
    r = _rng()
    return [r.randint(0, 256, size=(h, w, 3)).astype(np.uint8) for _ in range(n)]


class TestRoundtrip:
    @pytest.mark.parametrize("n,h,w", [(1, 1, 1), (3, 5, 7), (2, 8, 32), (4, 33, 3)])
    def test_lossless(self, n, h, w):
        frames = _frames(n, h, w)
        clip = decode_avi(encode_avi(frames, rate=1000, scale=40))
        assert clip.n_frames == n and (clip.width, clip.height) == (w, h)
        for got, want in zip(clip.frames, frames):
            assert np.array_equal(got, want)

    def test_duration_ms(self):
        clip = decode_avi(encode_avi(_frames(3, 2, 2), rate=1000, scale=40))
        assert (clip.rate, clip.scale) == (1000, 40)
        assert clip.duration_ms == 120  # 3 frames * 40 ms
        clip = decode_avi(encode_avi(_frames(2, 2, 2), rate=30000, scale=1001))
        assert clip.duration_ms == 2 * 1000 * 1001 // 30000  # NTSC floor

    def test_odd_row_stride_padded(self):
        """w=3 → 9-byte rows pad to 12; decode must honor the stride."""
        frames = _frames(2, 4, 3)
        data = encode_avi(frames)
        clip = decode_avi(data)
        for got, want in zip(clip.frames, frames):
            assert np.array_equal(got, want)

    def test_unknown_chunks_skipped(self):
        """A JUNK chunk between hdrl and movi is skipped per RIFF."""
        frames = _frames(1, 2, 2)
        base = encode_avi(frames)
        movi_at = base.index(b"LIST", 12 + 8)  # first LIST is hdrl
        movi_at = base.index(b"LIST", movi_at + 4)
        junk = b"JUNK" + struct.pack("<I", 6) + b"abcdef"
        data = bytearray(base[:movi_at] + junk + base[movi_at:])
        data[4:8] = struct.pack("<I", len(data) - 8)
        clip = decode_avi(bytes(data))
        assert np.array_equal(clip.frames[0], frames[0])

    def test_00dc_fourcc_accepted(self):
        """'00dc' (compressed-slot fourcc carrying BI_RGB) decodes too."""
        data = bytearray(encode_avi(_frames(1, 2, 2)))
        at = data.index(b"00db")
        data[at : at + 4] = b"00dc"
        assert decode_avi(bytes(data)).n_frames == 1


class TestNegatives:
    def test_not_avi(self):
        with pytest.raises(AviError, match="RIFF"):
            decode_avi(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)
        with pytest.raises(AviError, match="RIFF"):
            decode_avi(b"RIFF" + struct.pack("<I", 4) + b"WAVE")

    def test_truncated_frame(self):
        good = encode_avi(_frames(1, 4, 4))
        with pytest.raises(AviError):
            decode_avi(good[:-8])

    def test_compressed_rejected_typed(self):
        data = bytearray(encode_avi(_frames(1, 2, 2)))
        # BITMAPINFOHEADER biCompression sits 16 bytes into strf body
        at = data.index(b"strf") + 8 + 16
        data[at : at + 4] = b"MJPG"
        with pytest.raises(AviError, match="MJPG"):
            decode_avi(bytes(data))

    def test_bit_depth_rejected(self):
        data = bytearray(encode_avi(_frames(1, 2, 2)))
        at = data.index(b"strf") + 8 + 14  # biBitCount
        struct.pack_into("<H", data, at, 32)
        with pytest.raises(AviError, match="bit depth 32"):
            decode_avi(bytes(data))

    def test_hostile_dimensions_budget(self):
        """Claimed 1e9-pixel geometry must fail BEFORE allocation."""
        data = bytearray(encode_avi(_frames(1, 2, 2)))
        at = data.index(b"strf") + 8 + 4
        struct.pack_into("<ii", data, at, 40_000, 25_000)
        with pytest.raises(AviError, match="max_pixels"):
            decode_avi(bytes(data))

    def test_max_frames_budget(self):
        data = encode_avi(_frames(5, 2, 2))
        with pytest.raises(AviError, match="max_frames"):
            decode_avi(data, max_frames=4)

    def test_frame_count_mismatch(self):
        """avih dwTotalFrames disagreeing with movi is a typed error."""
        data = bytearray(encode_avi(_frames(2, 2, 2)))
        at = data.index(b"avih") + 8 + 16  # dwTotalFrames
        struct.pack_into("<I", data, at, 9)
        with pytest.raises(AviError, match="declares 9"):
            decode_avi(bytes(data))

    def test_missing_movi(self):
        data = encode_avi(_frames(1, 2, 2))
        at = data.index(b"movi")
        cut = bytearray(data[: at - 8])
        cut[4:8] = struct.pack("<I", len(cut) - 8)
        with pytest.raises(AviError, match="movi"):
            decode_avi(bytes(cut))

    def test_chunk_overrun(self):
        data = bytearray(encode_avi(_frames(1, 2, 2)))
        at = data.index(b"00db") + 4
        struct.pack_into("<I", data, at, 1 << 30)
        with pytest.raises(AviError, match="overruns"):
            decode_avi(bytes(data))

    def test_encode_geometry_mismatch(self):
        with pytest.raises(AviError, match="geometry"):
            encode_avi([np.zeros((2, 2, 3), np.uint8), np.zeros((2, 3, 3), np.uint8)])

    def test_encode_empty(self):
        with pytest.raises(AviError, match="at least one"):
            encode_avi([])


class TestVideogenTwin:
    """The closed forms ARE the decoded output — pinned here so the
    q77 oracle SQL and the writer can never drift apart silently."""

    @pytest.mark.parametrize("doc_id,k", [(0, 0), (1, 0), (7, 2), (123, 1), (9999, 2)])
    def test_decode_matches_closed_forms(self, doc_id, k):
        w, h, n, scale = avi_geometry(doc_id, k)
        clip = decode_avi(build_avi(doc_id, k))
        assert (clip.width, clip.height, clip.n_frames) == (w, h, n)
        assert (clip.rate, clip.scale) == (1000, scale)
        assert clip.duration_ms == n * scale
        for f in range(n):
            assert np.array_equal(clip.frames[f], avi_frame_pixels(doc_id, k, f))

    def test_q77_sql_closed_forms(self):
        """pixel_sum = 64 * sum(block values) — each 8x8 block repeats
        one value 64 times; min/max over blocks == min/max over pixels."""
        doc_id, k = 42, 1
        w, h, n, scale = avi_geometry(doc_id, k)
        clip = decode_avi(build_avi(doc_id, k))
        px_sum = sum(int(f.astype(np.int64).sum()) for f in clip.frames)
        vals = [
            (doc_id + 31 * k + 41 * f + 7 * bx + 13 * by + 97 * c) % 256
            for f in range(n)
            for bx in range(w // 8)
            for by in range(h // 8)
            for c in range(3)
        ]
        assert px_sum == 64 * sum(vals)
        assert min(int(f.min()) for f in clip.frames) == min(vals)
        assert max(int(f.max()) for f in clip.frames) == max(vals)


class TestFrameSampler:
    def test_real_sampler_roundtrip(self):
        from sax_wasm_spark.kernel.pngcodec import decode_png
        from sax_wasm_spark.operators.multimodal import avi_frame_sampler

        doc_id, k = 4, 1  # n_frames = 1 + (4+1)%3 = 3
        w, h, n, scale = avi_geometry(doc_id, k)
        assert n == 3
        picks = avi_frame_sampler(build_avi(doc_id, k), 2)
        assert [ms for ms, _ in picks] == [0, 2 * scale]
        for (_, png), f in zip(picks, (0, 2)):
            assert np.array_equal(
                decode_png(png).planes, avi_frame_pixels(doc_id, k, f)
            )

    def test_single_frame_pick(self):
        from sax_wasm_spark.operators.multimodal import avi_frame_sampler

        picks = avi_frame_sampler(build_avi(0, 0), 1)
        assert len(picks) == 1 and picks[0][0] == 0
