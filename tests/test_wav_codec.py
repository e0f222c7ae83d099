"""WAV codec (kernel/wavcodec.py): PCM roundtrips, chunk-walk
robustness, typed rejections, and the audiogen corpus twin's closed
forms. Spark plumbing is covered by the q73 oracle and
test_spark_operators.py."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sax_wasm_spark.kernel.wavcodec import WavError, decode_wav, encode_wav


def _rng():
    return np.random.RandomState(11)


class TestRoundtrip:
    @pytest.mark.parametrize("n_ch,bits", [(1, 16), (2, 16), (1, 8), (3, 8)])
    def test_lossless(self, n_ch, bits):
        lo, hi = (-128, 128) if bits == 8 else (-32768, 32768)
        s = _rng().randint(lo, hi, size=(777, n_ch)).astype(np.int32)
        clip = decode_wav(encode_wav(s, 44100, bits=bits))
        assert np.array_equal(clip.samples, s)
        assert (clip.n_channels, clip.sample_rate, clip.bits, clip.n_frames) == (
            n_ch, 44100, bits, 777,
        )

    def test_mono_1d_input(self):
        s = np.arange(-50, 50, dtype=np.int32)
        clip = decode_wav(encode_wav(s, 8000))
        assert clip.n_channels == 1 and np.array_equal(clip.samples[:, 0], s)

    def test_duration_ms(self):
        clip = decode_wav(encode_wav(np.zeros((11025, 1), np.int32), 11025))
        assert clip.duration_ms == 1000
        clip = decode_wav(encode_wav(np.zeros((5512, 1), np.int32), 11025))
        assert clip.duration_ms == 499  # floor, not round

    def test_odd_data_chunk_padded(self):
        """8-bit mono with odd frame count → odd data size → RIFF pad
        byte; a chunk after data must still parse (walk continues)."""
        s = np.arange(-3, 4, dtype=np.int32)  # 7 samples, odd payload
        data = encode_wav(s, 8000, bits=8)
        assert len(data) % 2 == 0
        clip = decode_wav(data)
        assert np.array_equal(clip.samples[:, 0], s)

    def test_unknown_chunks_skipped(self):
        """LIST metadata between fmt and data is skipped per spec."""
        base = encode_wav(np.arange(4, dtype=np.int32), 8000)
        # splice a LIST chunk after fmt (ends at 12+8+16=36)
        extra = b"LIST" + struct.pack("<I", 6) + b"INFOxy"
        data = bytearray(base[:36] + extra + base[36:])
        data[4:8] = struct.pack("<I", len(data) - 8)
        clip = decode_wav(bytes(data))
        assert clip.n_frames == 4


class TestNegatives:
    def test_not_riff(self):
        with pytest.raises(WavError, match="RIFF"):
            decode_wav(b"\x89PNG\r\n\x1a\n")

    def test_truncated(self):
        good = encode_wav(np.zeros((16, 1), np.int32), 8000)
        with pytest.raises(WavError):
            decode_wav(good[:20])

    def test_missing_data_chunk(self):
        good = encode_wav(np.zeros((4, 1), np.int32), 8000)
        with pytest.raises(WavError, match="data"):
            decode_wav(good[:36])  # RIFF+WAVE+fmt only... length fixed below

    def test_float_format_typed(self):
        fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
        body = (
            b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 4) + b"\x00" * 4
        )
        with pytest.raises(WavError, match="format 3"):
            decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)

    def test_frame_budget(self):
        data = encode_wav(np.zeros((100, 1), np.int32), 8000)
        with pytest.raises(WavError, match="budget"):
            decode_wav(data, max_frames=10)

    def test_chunk_length_overrun(self):
        data = bytearray(encode_wav(np.zeros((4, 1), np.int32), 8000))
        data[16:20] = struct.pack("<I", 10_000)  # fmt claims past EOF
        with pytest.raises(WavError, match="exceeds"):
            decode_wav(bytes(data))

    def test_encoder_rejects(self):
        with pytest.raises(WavError):
            encode_wav(np.zeros((0, 1), np.int32), 8000)
        with pytest.raises(WavError):
            encode_wav(np.zeros((4, 1), np.int32), 0)
        with pytest.raises(WavError):
            encode_wav(np.zeros((4, 1), np.int32), 8000, bits=24)


class TestCorpusTwin:
    def test_closed_forms_roundtrip(self):
        from sax_wasm_spark.sources.audiogen import (
            build_wav,
            wav_geometry,
            wav_samples,
        )

        for did in (0, 1, 9, 255, 5000):
            for k in range(3):
                clip = decode_wav(build_wav(did, k))
                _, nc, rate, bits, nf = wav_geometry(did, k)
                assert (clip.n_channels, clip.sample_rate, clip.bits, clip.n_frames) == (
                    nc, rate, bits, nf,
                )
                assert np.array_equal(clip.samples, wav_samples(did, k))
