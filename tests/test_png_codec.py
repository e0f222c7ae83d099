"""PNG codec (kernel/pngcodec.py): encode/decode roundtrips across all
color types and filter paths, negatives for every typed rejection, and
the imagegen PNG corpus twin's closed forms. Spark-side plumbing is
covered in test_spark_operators.py / the q72 oracle."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from sax_wasm_spark.kernel.pngcodec import (
    PNG_SIGNATURE,
    PngError,
    decode_png,
    encode_png,
)


def _rng():
    return np.random.RandomState(42)


class TestRoundtrip:
    @pytest.mark.parametrize(
        "shape",
        [(7, 5), (9, 3, 2), (11, 13, 3), (6, 8, 4), (1, 1), (5, 1, 3), (2, 257, 4), (12, 1)],
    )
    def test_lossless_all_color_types(self, shape):
        """>=5-row shapes exercise the encoder's full row%5 filter
        cycle (None/Sub/Up/Average/Paeth) against the decoder."""
        px = _rng().randint(0, 256, size=shape).astype(np.uint8)
        img = decode_png(encode_png(px))
        dec = img.planes[:, :, 0] if px.ndim == 2 else img.planes
        assert np.array_equal(dec, px)
        assert (img.height, img.width) == shape[:2]
        assert img.n_components == (shape[2] if len(shape) == 3 else 1)

    def test_palette_expansion(self):
        idx = _rng().randint(0, 16, size=(10, 7)).astype(np.uint8)
        pal = _rng().randint(0, 256, size=(16, 3)).astype(np.uint8)
        img = decode_png(encode_png(idx, color_type=3, palette=pal))
        assert img.color_type == 3 and img.n_components == 3
        assert np.array_equal(img.planes, pal[idx])

    def test_extreme_values(self):
        px = np.zeros((8, 8, 3), np.uint8)
        px[::2] = 255
        assert np.array_equal(decode_png(encode_png(px)).planes, px)

    def test_every_filter_type_appears_on_wire(self):
        """The twin's determinism contract: rows 0..4 carry filter
        types 0..4 literally in the decompressed stream."""
        px = _rng().randint(0, 256, size=(5, 4, 3)).astype(np.uint8)
        data = encode_png(px)
        # find IDAT body
        pos = len(PNG_SIGNATURE)
        body = None
        while pos < len(data):
            ln, ct = struct.unpack(">I4s", data[pos : pos + 8])
            if ct == b"IDAT":
                body = data[pos + 8 : pos + 8 + ln]
                break
            pos += 12 + ln
        raw = zlib.decompress(body)
        stride = 4 * 3
        assert [raw[i * (1 + stride)] for i in range(5)] == [0, 1, 2, 3, 4]


class TestNegatives:
    def test_not_png(self):
        with pytest.raises(PngError, match="signature"):
            decode_png(b"\xff\xd8\xff junk")

    def test_truncated(self):
        good = encode_png(np.zeros((4, 4), np.uint8))
        with pytest.raises(PngError):
            decode_png(good[:40])

    def test_crc_corruption(self):
        good = bytearray(encode_png(np.zeros((4, 4), np.uint8)))
        good[20] ^= 0xFF
        with pytest.raises(PngError, match="CRC"):
            decode_png(bytes(good))

    def test_pixel_budget(self):
        data = encode_png(np.zeros((8, 8), np.uint8))
        with pytest.raises(PngError, match="budget"):
            decode_png(data, max_pixels=4)

    def test_interlace_rejected_typed(self):
        data = bytearray(encode_png(np.zeros((4, 4), np.uint8)))
        # IHDR body starts at 16; interlace byte is its 13th byte
        data[16 + 12] = 1
        body = bytes(data[12:29])
        crc = zlib.crc32(body) & 0xFFFFFFFF
        data[29:33] = struct.pack(">I", crc)
        with pytest.raises(PngError, match="interlace"):
            decode_png(bytes(data))

    def test_zip_bomb_bounded(self):
        """IDAT inflating past the scanline volume is rejected without
        allocating the bomb's full output."""
        w = h = 4
        stride = w
        legit = bytes(h * (1 + stride))
        bomb = zlib.compress(legit + b"\x00" * 10_000_000)

        def chunk(ctype, body):
            return (
                struct.pack(">I", len(body))
                + ctype
                + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
            )

        data = (
            PNG_SIGNATURE
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
            + chunk(b"IDAT", bomb)
            + chunk(b"IEND", b"")
        )
        with pytest.raises(PngError):
            decode_png(data)

    def test_unknown_critical_chunk(self):
        def chunk(ctype, body):
            return (
                struct.pack(">I", len(body))
                + ctype
                + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
            )

        data = (
            PNG_SIGNATURE
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0))
            + chunk(b"CrIT", b"x")
            + chunk(b"IDAT", zlib.compress(b"\x00\x00"))
            + chunk(b"IEND", b"")
        )
        with pytest.raises(PngError, match="critical"):
            decode_png(data)

    def test_ancillary_chunk_skipped(self):
        def chunk(ctype, body):
            return (
                struct.pack(">I", len(body))
                + ctype
                + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
            )

        data = (
            PNG_SIGNATURE
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0))
            + chunk(b"tEXt", b"k\x00v")
            + chunk(b"IDAT", zlib.compress(b"\x00\x07"))
            + chunk(b"IEND", b"")
        )
        img = decode_png(data)
        assert img.planes[0, 0, 0] == 7

    def test_16bit_depth_typed(self):
        data = bytearray(encode_png(np.zeros((2, 2), np.uint8)))
        data[16 + 8] = 16  # depth byte
        body = bytes(data[12:29])
        data[29:33] = struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        with pytest.raises(PngError, match="depth"):
            decode_png(bytes(data))

    def test_encoder_rejects_bad_shapes(self):
        with pytest.raises(PngError):
            encode_png(np.zeros((2, 2, 5), np.uint8))
        with pytest.raises(PngError):
            encode_png(np.zeros((0, 4), np.uint8))
        with pytest.raises(PngError):
            encode_png(np.zeros((2, 2), np.uint8), color_type=3, palette=None)


class TestCorpusTwin:
    def test_closed_forms_roundtrip(self):
        from sax_wasm_spark.sources.imagegen import (
            build_png,
            png_geometry,
            png_pixels,
        )

        for did in (0, 1, 7, 123, 4096):
            for k in range(4):
                img = decode_png(build_png(did, k))
                _, w, h, nc = png_geometry(did, k)
                px = png_pixels(did, k)
                assert (img.width, img.height, img.n_components) == (w, h, nc)
                dec = img.planes[:, :, 0] if px.ndim == 2 else img.planes
                assert np.array_equal(dec, px), (did, k)
