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


class TestMjpg:
    def test_flat_block_roundtrip_bit_exact(self):
        """8x8-flat frames survive the T.81 path exactly — the property
        the videogen closed forms rely on."""
        frames = [avi_frame_pixels(3, 1, f) for f in range(3)]
        data = encode_avi(frames, rate=1000, scale=48, codec="MJPG")
        assert b"MJPG" in data[:120]  # strh handler fourcc on the wire
        clip = decode_avi(data)
        assert clip.n_frames == 3
        for got, want in zip(clip.frames, frames):
            assert np.array_equal(got, want)

    def test_photographic_lossy_but_decodes(self):
        frames = _frames(2, 16, 24)
        clip = decode_avi(encode_avi(frames, codec="MJPG"))
        assert (clip.width, clip.height, clip.n_frames) == (24, 16, 2)
        assert clip.frames[0].shape == (16, 24, 3)

    def test_frame_geometry_mismatch_typed(self):
        """An MJPG frame whose SOF dims disagree with strf is a typed
        structural error, not silent skew."""
        from sax_wasm_spark.kernel.jpegcodec import encode_jpeg

        data = bytearray(encode_avi(_frames(1, 8, 8), codec="MJPG"))
        wrong = encode_jpeg(np.zeros((8, 16, 3), np.uint8), adobe_transform=0)
        at = data.index(b"00dc")
        (old_size,) = struct.unpack_from("<I", data, at + 4)
        rebuilt = (
            bytes(data[:at])
            + b"00dc"
            + struct.pack("<I", len(wrong))
            + wrong
            + (b"\x00" if len(wrong) & 1 else b"")
            + bytes(data[at + 8 + old_size + (old_size & 1) :])
        )
        out = bytearray(rebuilt)
        out[4:8] = struct.pack("<I", len(out) - 8)
        # fix the enclosing movi LIST size too
        movi_at = out.index(b"LIST", out.index(b"movi") - 8)
        struct.pack_into(
            "<I", out, movi_at + 4, len(out) - movi_at - 8
        )
        with pytest.raises(AviError, match="strf declares"):
            decode_avi(bytes(out))

    def test_poison_jpeg_payload_typed(self):
        data = bytearray(encode_avi(_frames(1, 8, 8), codec="MJPG"))
        at = data.index(b"00dc") + 8
        data[at : at + 2] = b"\x00\x00"  # destroy SOI
        with pytest.raises(AviError, match="frame 0"):
            decode_avi(bytes(data))

    def test_bad_codec_name(self):
        with pytest.raises(AviError, match="encode codec"):
            encode_avi(_frames(1, 2, 2), codec="H264")

    def test_twin_codec_parity_gate(self):
        """Odd doc_id+k ships MJPG, even ships DIB — and both decode to
        the same closed forms."""
        even, odd = build_avi(2, 0), build_avi(2, 1)
        assert b"MJPG" not in even and b"MJPG" in odd
        for doc_id, k in ((2, 0), (2, 1)):
            clip = decode_avi(build_avi(doc_id, k))
            for f in range(clip.n_frames):
                assert np.array_equal(
                    clip.frames[f], avi_frame_pixels(doc_id, k, f)
                )


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
        data[at : at + 4] = b"H264"
        with pytest.raises(AviError, match="H264"):
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


class TestVhashTwin:
    """q78's video perceptual-dedup closed forms: the per-frame dHash
    of every rendition must realize the (doc_id, f) bit words exactly,
    across wire codec, scale, and affine renditions."""

    @pytest.mark.parametrize("doc_id", [0, 1, 2, 5, 30, 1234])
    def test_renditions_collide_flip_splits(self, doc_id):
        from sax_wasm_spark.operators.multimodal import dhash_planes
        from sax_wasm_spark.sources.videogen import (
            build_vhash_rendition,
            n_vframes,
            vhash_hex,
        )

        want = vhash_hex(doc_id)
        for r in range(4):
            clip = decode_avi(build_vhash_rendition(doc_id, r))
            sig = "".join(f"{dhash_planes(fr):016x}" for fr in clip.frames)
            assert clip.codec == ("mjpg" if r in (1, 3) else "dib")
            assert clip.n_frames == n_vframes(doc_id)
            if r == 3 and doc_id % 3 == 0:
                assert sig == vhash_hex(doc_id, flip=True) != want
            else:
                assert sig == want

    def test_signatures_doc_injective(self):
        from sax_wasm_spark.sources.videogen import vhash_hex

        sigs = [vhash_hex(d) for d in range(200)]
        sigs += [vhash_hex(d, flip=True) for d in range(0, 200, 3)]
        assert len(set(sigs)) == len(sigs)

    def test_operator_error_rows(self, spark):
        from sax_wasm_spark.operators.multimodal import perceptual_hash_videos

        rows = [(0, 0, build_avi(0, 0)), (1, 0, b"RIFF\x04\x00\x00\x00AVI ")]
        df = spark.createDataFrame(rows, "doc_id long, img_idx int, avi binary")
        got = {r.doc_id: r for r in perceptual_hash_videos(df).collect()}
        assert got[0].status == "ok" and len(got[0].vhash) == 16 * got[0].n_frames
        assert got[1].status.startswith("error:") and got[1].vhash is None


class TestAudioDemux:
    """The 'auds' PCM stream: mux/demux roundtrips, interleave
    reassembly across chunk boundaries, typed rejections, and the
    videogen audio closed forms behind q79."""

    @pytest.mark.parametrize("n_ch", [1, 2])
    def test_pcm_roundtrip(self, n_ch):
        s = _rng().randint(-2048, 2048, size=(487, n_ch)).astype(np.int16)
        clip = decode_avi(encode_avi(_frames(3, 4, 4), audio=(s, 8000)))
        assert (clip.audio_rate, clip.audio_channels) == (8000, n_ch)
        assert np.array_equal(clip.audio_samples, s)

    def test_mono_1d_input(self):
        s = np.arange(-50, 50, dtype=np.int16)
        clip = decode_avi(encode_avi(_frames(2, 2, 2), audio=(s, 11025)))
        assert np.array_equal(clip.audio_samples[:, 0], s)

    def test_interleave_reassembles_across_chunks(self):
        """7 video frames split the stream into 7 '01wb' chunks at
        sample-frame boundaries that don't align to chunk counts."""
        s = _rng().randint(-99, 99, size=(101, 2)).astype(np.int16)
        data = encode_avi(_frames(7, 2, 2), audio=(s, 16000))
        assert data.count(b"01wb") == 7
        clip = decode_avi(data)
        assert np.array_equal(clip.audio_samples, s)

    def test_no_audio_is_none(self):
        clip = decode_avi(encode_avi(_frames(1, 2, 2)))
        assert clip.audio_samples is None
        assert (clip.audio_rate, clip.audio_channels) == (0, 0)

    def test_mjpg_with_audio(self):
        s = np.zeros(64, np.int16)
        clip = decode_avi(encode_avi(_frames(2, 8, 8), codec="MJPG", audio=(s, 8000)))
        assert clip.codec == "mjpg" and len(clip.audio_samples) == 64

    def test_non_pcm_rejected_typed(self):
        data = bytearray(
            encode_avi(_frames(1, 2, 2), audio=(np.zeros(8, np.int16), 8000))
        )
        # audio strf follows the 'auds' strh; wFormatTag is its first u16
        at = data.index(b"auds") - 8  # strh chunk header
        at = data.index(b"strf", at) + 8
        struct.pack_into("<H", data, at, 2)  # ADPCM
        with pytest.raises(AviError, match="format tag 2"):
            decode_avi(bytes(data))

    def test_orphan_audio_chunk_typed(self):
        """A '01wb' chunk without any auds stream header is a typed
        structural error."""
        base = bytearray(encode_avi(_frames(1, 2, 2)))
        at = base.index(b"00db")
        extra = b"01wb" + struct.pack("<I", 4) + b"\x01\x02\x03\x04"
        out = bytearray(base[:at] + extra + base[at:])
        out[4:8] = struct.pack("<I", len(out) - 8)
        movi_at = out.index(b"LIST", out.index(b"movi") - 8)
        struct.pack_into("<I", out, movi_at + 4, len(out) - movi_at - 8)
        with pytest.raises(AviError, match="without an auds"):
            decode_avi(bytes(out))

    def test_max_samples_budget(self):
        s = np.zeros(4096, np.int16)
        data = encode_avi(_frames(1, 2, 2), audio=(s, 8000))
        with pytest.raises(AviError, match="max_samples"):
            decode_avi(data, max_samples=1024)

    def test_ragged_audio_length_typed(self):
        data = bytearray(
            encode_avi(_frames(1, 2, 2), audio=(np.zeros(8, np.int16), 8000))
        )
        at = data.index(b"01wb") + 4
        (sz,) = struct.unpack_from("<I", data, at)
        # shrink the chunk by one byte: 15 bytes is not a sample multiple
        struct.pack_into("<I", data, at, sz - 1)
        cut = bytearray(data[: at + 4 + sz - 1] + data[at + 4 + sz :])
        cut[4:8] = struct.pack("<I", len(cut) - 8)
        movi_at = cut.index(b"LIST", cut.index(b"movi") - 8)
        struct.pack_into("<I", cut, movi_at + 4, len(cut) - movi_at - 8)
        with pytest.raises(AviError, match="sample frame"):
            decode_avi(bytes(cut))

    @pytest.mark.parametrize("doc_id,k", [(0, 0), (1, 0), (7, 2), (123, 1)])
    def test_videogen_audio_closed_forms(self, doc_id, k):
        from sax_wasm_spark.sources.videogen import (
            avi_audio_samples,
            avi_audio_shape,
        )

        rate, ch, n = avi_audio_shape(doc_id, k)
        clip = decode_avi(build_avi(doc_id, k))
        assert (clip.audio_rate, clip.audio_channels) == (rate, ch)
        assert len(clip.audio_samples) == n
        assert np.array_equal(clip.audio_samples, avi_audio_samples(doc_id, k))


class TestFrameImageTwin:
    """q80's cross-modal corpus: still-image renditions collide with
    their video frame's hash exactly; decoys never do."""

    @pytest.mark.parametrize("doc_id", [0, 3, 7, 42, 1001])
    def test_image_hash_matches_frame_word(self, doc_id):
        from sax_wasm_spark.kernel.jpegcodec import decode_jpeg
        from sax_wasm_spark.operators.multimodal import dhash_planes
        from sax_wasm_spark.sources.videogen import (
            build_vframe_decoy,
            build_vframe_image,
            n_vframes,
            vdecoy_words,
            vhash_words,
        )

        frame_words = set()
        for f in range(n_vframes(doc_id)):
            hi, lo = vhash_words(doc_id, f)
            want = (hi << 32) | lo
            frame_words.add(want)
            got = dhash_planes(decode_jpeg(build_vframe_image(doc_id, f)).planes)
            assert got == want
        hi, lo = vdecoy_words(doc_id)
        decoy = dhash_planes(decode_jpeg(build_vframe_decoy(doc_id)).planes)
        assert decoy == (hi << 32) | lo and decoy not in frame_words

    def test_no_collision_proof_holds(self):
        """Re-run the number-theoretic check the corpus docstring
        cites: equating any two word families forces a doc delta/sum
        whose hi32 equation is inconsistent — for EVERY frame combo."""
        A, B, Ah, Bh = 2654435761, 2246822519, 40503, 668265263
        Ch, Cd, Cdh = 2739110765, 3735928559, 889275714
        M = 1 << 32
        inv_a = pow(A, -1, M)
        for df in range(-4, 5):  # frame-vs-frame, cross-doc
            if df:
                dd = (-df * B * inv_a) % M
                assert (dd * Ah + df * Bh) % M != 0
        for fs in range(9):  # flipped-vs-unflipped
            s = ((M - 1 - fs * B) * inv_a) % M
            assert (s * Ah) % M != (M - 1 - 2 * Ch - fs * Bh) % M
        for f in range(5):  # decoy-vs-frame and decoy-vs-flipped
            dd = ((Cd - f * B) * inv_a) % M
            assert (dd * Ah + f * Bh - Cdh) % M != 0
            s = ((M - 1 - f * B - Cd) * inv_a) % M
            assert (s * Ah) % M != (M - 1 - 2 * Ch - f * Bh - Cdh) % M


class TestReviewFixes:
    """Round-7 review findings on the video tier, pinned."""

    def test_top_down_dib_flips_back(self):
        """Negative biHeight = top-down rows: frames must come back in
        natural orientation, not mirrored."""
        frames = [np.arange(48, dtype=np.uint8).reshape(4, 4, 3)]
        data = bytearray(encode_avi(frames))
        at = data.index(b"strf") + 8 + 8  # biHeight
        struct.pack_into("<i", data, at, -4)
        clip = decode_avi(bytes(data))
        assert np.array_equal(clip.frames[0], frames[0][::-1])
        # and the writer's bottom-up default still round-trips
        assert np.array_equal(decode_avi(encode_avi(frames)).frames[0], frames[0])

    def test_total_pixel_budget(self):
        """max_total_pixels bounds the SUM of decoded frames — a small
        MJPG wire payload cannot expand to gigabytes."""
        frames = [np.zeros((32, 32, 3), np.uint8)] * 8
        data = encode_avi(frames, codec="MJPG")
        with pytest.raises(AviError, match="max_total_pixels"):
            decode_avi(data, max_total_pixels=4 * 32 * 32)

    def test_second_vids_strh_ignored(self):
        """A duplicate vids strh must not overwrite the first stream's
        timing (first stream wins)."""
        base = encode_avi(_frames(2, 2, 2), rate=1000, scale=40)
        at = base.index(b"strh")
        dup = bytearray(base[at : at + 8 + 56])
        struct.pack_into("<II", dup, 8 + 20, 999, 1)  # hostile scale/rate
        strl = b"LIST" + struct.pack("<I", 4 + len(dup)) + b"strl" + bytes(dup)
        hdrl_end = base.index(b"LIST", base.index(b"movi") - 8)
        out = bytearray(base[:hdrl_end] + strl + base[hdrl_end:])
        out[4:8] = struct.pack("<I", len(out) - 8)
        hdrl_at = out.index(b"LIST")
        struct.pack_into(
            "<I", out, hdrl_at + 4,
            struct.unpack_from("<I", out, hdrl_at + 4)[0] + len(strl),
        )
        clip = decode_avi(bytes(out))
        assert (clip.rate, clip.scale) == (1000, 40)

    def test_skip_frames_audio_only(self):
        s = np.arange(-30, 34, dtype=np.int16)
        data = encode_avi(_frames(2, 8, 8), codec="MJPG", audio=(s, 8000))
        clip = decode_avi(data, skip_frames=True)
        assert clip.frames == [] and np.array_equal(clip.audio_samples[:, 0], s)

    def test_sampler_exact_rational_timestamps(self):
        from sax_wasm_spark.operators.multimodal import avi_frame_sampler

        frames = [np.zeros((8, 8, 3), np.uint8)] * 5
        data = encode_avi(frames, rate=30, scale=1)  # 30 fps
        picks = avi_frame_sampler(data, 5)
        # frame p at p*1000*scale//rate, NOT p*(1000*scale//rate)
        assert [ms for ms, _ in picks] == [p * 1000 // 30 for p in range(5)]
        assert avi_frame_sampler(data, 0) == []
