"""BMP/DIB codec (kernel/dibcodec.py) and the perceptual-hash dedup
tier (operators/multimodal.dhash_planes / perceptual_hash_images +
the imagegen phash corpus twin behind q76): codec roundtrips and typed
negatives, the dHash's affine-invariance contract on arbitrary images
(not just the corpus), the closed-form hash pin, and the four-format
cross-collision that makes q76's clusters."""

from __future__ import annotations

import numpy as np
import pytest

from sax_wasm_spark.kernel.dibcodec import (
    BmpError,
    decode_bmp,
    dib_row_stride,
    encode_bmp,
    pack_dib_rows,
    unpack_dib_rows,
)
from sax_wasm_spark.operators.multimodal import dhash_planes


def _rng():
    return np.random.RandomState(7)


class TestBmpCodec:
    @pytest.mark.parametrize("shape", [(3, 5), (8, 16), (1, 1), (7, 33), (5, 2)])
    def test_truecolor_roundtrip(self, shape):
        px = _rng().randint(0, 256, size=(*shape, 3)).astype(np.uint8)
        img = decode_bmp(encode_bmp(px))
        assert (img.height, img.width, img.bits) == (*shape, 24)
        assert np.array_equal(img.planes, px)

    def test_palette_roundtrip(self):
        idx = _rng().randint(0, 256, size=(6, 9)).astype(np.uint8)
        pal = _rng().randint(0, 256, size=(256, 3)).astype(np.uint8)
        img = decode_bmp(encode_bmp(idx, palette=pal))
        assert img.bits == 8 and img.n_components == 3
        assert np.array_equal(img.planes, pal[idx])

    def test_row_padding_exact(self):
        # width 5 at 24bpp = 15 bytes → stride 16; the padded byte must
        # be invisible to the roundtrip
        assert dib_row_stride(5, 24) == 16
        px = _rng().randint(0, 256, size=(2, 5, 3)).astype(np.uint8)
        assert np.array_equal(unpack_dib_rows(pack_dib_rows(px), 5, 2), px)

    def test_negatives_typed(self):
        px = _rng().randint(0, 256, size=(4, 4, 3)).astype(np.uint8)
        good = encode_bmp(px)
        for bad in (b"", b"XX" + good[2:], good[:30], good[:40]):
            with pytest.raises(BmpError):
                decode_bmp(bad)

    def test_truncated_pixels(self):
        px = _rng().randint(0, 256, size=(8, 8, 3)).astype(np.uint8)
        good = encode_bmp(px)
        with pytest.raises(BmpError, match="truncated"):
            decode_bmp(good[:-10])

    def test_pixel_budget(self):
        px = _rng().randint(0, 256, size=(64, 64, 3)).astype(np.uint8)
        with pytest.raises(BmpError, match="max_pixels"):
            decode_bmp(encode_bmp(px), max_pixels=1000)

    def test_compression_and_depth_rejected(self):
        import struct

        px = _rng().randint(0, 256, size=(4, 4, 3)).astype(np.uint8)
        good = bytearray(encode_bmp(px))
        rle = bytearray(good)
        struct.pack_into("<I", rle, 14 + 16, 1)  # biCompression = BI_RLE8
        with pytest.raises(BmpError, match="compression"):
            decode_bmp(bytes(rle))
        deep = bytearray(good)
        struct.pack_into("<H", deep, 14 + 14, 32)  # biBitCount = 32
        with pytest.raises(BmpError, match="bit depth"):
            decode_bmp(bytes(deep))
        topdown = bytearray(good)
        struct.pack_into("<i", topdown, 14 + 8, -4)  # negative height
        with pytest.raises(BmpError, match="top-down"):
            decode_bmp(bytes(topdown))


class TestDhash:
    def test_affine_invariance_arbitrary_image(self):
        """dHash is invariant to ANY per-pixel affine transform with
        positive scale — brightness shift, contrast scale, color cast,
        gray->RGB replication — on arbitrary pixels (ties permitting;
        this fixture has none at the sample grid)."""
        base = _rng().randint(30, 200, size=(40, 50)).astype(np.uint8)
        h0 = dhash_planes(base)
        assert h0 == dhash_planes(base + np.uint8(17))  # brightness
        assert h0 == dhash_planes(base.astype(np.uint16) * 2)  # contrast
        rgb = np.stack([base, base + np.uint8(2), base + np.uint8(5)], axis=2)
        assert h0 == dhash_planes(rgb)  # color cast, channel-sum luma
        gray3 = np.repeat(base[:, :, None], 3, axis=2)
        assert h0 == dhash_planes(gray3)  # palette-style 3x expansion

    def test_distinct_images_distinct_hash(self):
        base = _rng().randint(30, 200, size=(40, 50)).astype(np.uint8)
        assert dhash_planes(base) != dhash_planes(base.T.copy())

    def test_tiny_image_no_crash(self):
        assert isinstance(dhash_planes(np.zeros((1, 1), np.uint8)), int)
        assert isinstance(dhash_planes(np.zeros((3, 4, 3), np.uint8)), int)

    def test_closed_form_pin(self):
        """The corpus twin's bit construction IS the hash: every
        rendition of every doc decodes to the oracle's closed form."""
        from sax_wasm_spark.kernel.gifcodec import decode_gif
        from sax_wasm_spark.kernel.jpegcodec import decode_jpeg
        from sax_wasm_spark.kernel.pngcodec import decode_png
        from sax_wasm_spark.sources.imagegen import (
            build_phash_rendition,
            phash_hex,
        )

        decoders = {
            0: lambda b: decode_png(b).planes,
            1: lambda b: decode_jpeg(b).planes,
            2: lambda b: decode_gif(b).frames[0].planes,
            3: lambda b: decode_bmp(b).planes,
        }
        for doc in (0, 1, 2, 3, 6, 14, 123456):
            for r, dec in decoders.items():
                flip = r == 3 and doc % 3 == 0
                got = f"{dhash_planes(dec(build_phash_rendition(doc, r))):016x}"
                assert got == phash_hex(doc, flip), (doc, r)

    def test_golden_value(self):
        # pins the bit-packing order (MSB-first, i = 8*r + c) forever
        from sax_wasm_spark.sources.imagegen import phash_hex

        assert phash_hex(7) == "a347d6ee538453d7"
        assert phash_hex(7, flip=True) == "5cb82911ac7bac28"


def test_perceptual_hash_images_spark(spark):
    """The Spark operator sniffs all four formats, hashes, and the
    downstream groupBy clusters renditions exactly as q76's oracle
    predicts; poison bytes degrade to error rows."""
    import pyspark.sql.functions as F

    from sax_wasm_spark.operators.multimodal import perceptual_hash_images
    from sax_wasm_spark.sources.imagegen import build_phash_rendition, phash_hex

    rows = []
    for d in (4, 6):
        for r in range(4):
            rows.append((d, r, build_phash_rendition(d, r)))
    rows.append((99, 0, b"not an image"))
    df = spark.createDataFrame(rows, "doc_id long, rend_idx int, img binary")
    out = perceptual_hash_images(df, media_col="img", id_cols=("doc_id", "rend_idx"))
    got = out.collect()
    by_key = {(r.doc_id, r.rend_idx): r for r in got}
    assert by_key[(99, 0)].status.startswith("error:")
    assert by_key[(99, 0)].phash is None
    for r in range(4):
        assert by_key[(4, r)].phash == phash_hex(4)
    assert by_key[(6, 3)].phash == phash_hex(6, flip=True)  # 6 % 3 == 0
    assert {by_key[(4, r)].format for r in range(4)} == {"png", "jpeg", "gif", "bmp"}
    clusters = (
        out.where(F.col("status") == "ok")
        .groupBy("phash")
        .count()
        .collect()
    )
    sizes = sorted(r["count"] for r in clusters)
    assert sizes == [1, 3, 4]  # doc6 split (flip), doc4 whole


def test_decode_image_stats_bmp_in_mix(spark):
    """BMP joins the sniffing decoder: a four-format binary column
    decodes in one pass with exact pixel stats."""
    from sax_wasm_spark.operators.multimodal import decode_image_stats

    px = _rng().randint(0, 256, size=(6, 7, 3)).astype(np.uint8)
    df = spark.createDataFrame(
        [(1, 0, encode_bmp(px))], "doc_id long, img_idx int, img binary"
    )
    r = decode_image_stats(df).collect()[0]
    assert (r.format, r.n_frames, r.width, r.height, r.n_channels) == (
        "bmp", 1, 7, 6, 3,
    )
    assert r.pixel_sum == int(px.astype(np.int64).sum())
    assert r.status == "ok"
