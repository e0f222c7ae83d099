"""GIF codec (kernel/gifcodec.py): LZW roundtrips (incl. 12-bit table
overflow and the KwKwK case), interlace, multi-frame, typed rejections,
and the imagegen GIF twin's closed forms."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sax_wasm_spark.kernel.gifcodec import (
    GifError,
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)


def _rng():
    return np.random.RandomState(5)


def _pal(n=256):
    return _rng().randint(0, 256, size=(n, 3)).astype(np.uint8)


class TestLzw:
    def test_roundtrip_random(self):
        data = bytes(_rng().randint(0, 256, size=5000).astype(np.uint8))
        assert _lzw_decode(8, _lzw_encode(8, data), len(data)) == data

    def test_roundtrip_repetitive_overflows_table(self):
        """>4096 distinct phrases force the encoder's clear/reset path
        and the decoder's width growth to 12 bits."""
        data = (b"abcd" * 40 + bytes(range(256))) * 60
        assert _lzw_decode(8, _lzw_encode(8, data), len(data)) == data

    def test_kwkwk_case(self):
        """'aaaa...' immediately emits a code equal to next_code."""
        data = b"\x01" * 100
        assert _lzw_decode(2, _lzw_encode(2, data), len(data)) == data

    def test_truncation_typed(self):
        blob = _lzw_encode(8, b"hello world")
        with pytest.raises(GifError):
            _lzw_decode(8, blob[:2], 11)

    def test_output_bound(self):
        blob = _lzw_encode(8, b"x" * 100)
        with pytest.raises(GifError, match="exceeds frame"):
            _lzw_decode(8, blob, 50)


class TestRoundtrip:
    @pytest.mark.parametrize("psz", [2, 4, 16, 256])
    def test_palette_sizes(self, psz):
        pal = _pal(psz)
        frame = _rng().randint(0, psz, size=(13, 9)).astype(np.uint8)
        img = decode_gif(encode_gif([frame], pal))
        assert np.array_equal(img.frames[0].planes, pal[frame])

    def test_multiframe_with_interlace(self):
        pal = _pal()
        frames = [
            _rng().randint(0, 256, size=(21, 17)).astype(np.uint8) for _ in range(4)
        ]
        img = decode_gif(encode_gif(frames, pal, interlace_odd_frames=True))
        assert img.n_frames == 4
        assert [f.interlaced for f in img.frames] == [False, True, False, True]
        for want, got in zip(frames, img.frames):
            assert np.array_equal(got.planes, pal[want])

    def test_extensions_skipped(self):
        """A graphic-control extension (89a's animation metadata) between
        frames must be skipped."""
        pal = _pal(4)
        base = encode_gif([np.zeros((4, 4), np.uint8)], pal)
        # splice a GCE right after the global palette (13 + 12 bytes)
        gce = b"\x21\xf9\x04\x00\x0a\x00\x00\x00"
        cut = 13 + 12
        img = decode_gif(base[:cut] + gce + base[cut:])
        assert img.n_frames == 1

    def test_large_forces_wide_codes(self):
        pal = _pal()
        frame = _rng().randint(0, 256, size=(150, 200)).astype(np.uint8)
        img = decode_gif(encode_gif([frame], pal))
        assert np.array_equal(img.frames[0].planes, pal[frame])


class TestNegatives:
    def test_not_gif(self):
        with pytest.raises(GifError, match="GIF87a"):
            decode_gif(b"\x89PNG\r\n\x1a\n")

    def test_missing_trailer(self):
        data = encode_gif([np.zeros((4, 4), np.uint8)], _pal(4))
        with pytest.raises(GifError, match="trailer"):
            decode_gif(data[:-1])

    def test_pixel_budget_spans_frames(self):
        frames = [np.zeros((10, 10), np.uint8)] * 3
        data = encode_gif(frames, _pal(4))
        with pytest.raises(GifError, match="budget"):
            decode_gif(data, max_pixels=250)  # 2 frames fit, 3rd doesn't

    def test_palette_index_out_of_range(self):
        data = bytearray(encode_gif([np.zeros((4, 4), np.uint8)], _pal(2)))
        # grow the index beyond the 2-entry palette by rewriting the
        # frame with a 4-entry palette but claiming 2 in the header
        good = encode_gif([np.full((4, 4), 3, np.uint8)], _pal(4))
        hacked = bytearray(good)
        hacked[10] = (hacked[10] & 0xF8) | 0x00  # global table size -> 2
        # remove 6 palette entries (4->2): bytes 13+6 .. 13+12
        del hacked[13 + 6 : 13 + 12]
        with pytest.raises(GifError):
            decode_gif(bytes(hacked))

    def test_encoder_rejects(self):
        with pytest.raises(GifError, match="power of two"):
            encode_gif([np.zeros((2, 2), np.uint8)], _pal(3))
        with pytest.raises(GifError, match="at least one"):
            encode_gif([], _pal(4))
        with pytest.raises(GifError, match="out of range"):
            encode_gif([np.full((2, 2), 9, np.uint8)], _pal(4))


class TestCorpusTwin:
    def test_closed_forms_roundtrip(self):
        from sax_wasm_spark.sources.imagegen import (
            build_gif,
            gif_frame_pixels,
            gif_geometry,
        )

        for did in (0, 2, 11, 300):
            for k in range(3):
                img = decode_gif(build_gif(did, k))
                w, h, n = gif_geometry(did, k)
                assert (img.width, img.height, img.n_frames) == (w, h, n)
                for f in range(n):
                    assert np.array_equal(
                        img.frames[f].planes, gif_frame_pixels(did, k, f)
                    ), (did, k, f)
