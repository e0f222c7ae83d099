"""CCITT Group 4 codec (kernel/ccittcodec.py): T.6 wire vectors,
mode/run-table coverage, typed rejections, hostile budgets, the PDF
/CCITTFaxDecode wire semantics (BlackIs1, EncodedByteAlign, Rows
fallback), and the q82 pdfgen corpus twin."""

from __future__ import annotations

import numpy as np
import pytest

from sax_wasm_spark.kernel.ccittcodec import (
    _BLACK_DEC,
    _WHITE_DEC,
    CcittError,
    decode_g4,
    encode_g4,
)
from sax_wasm_spark.sources.pdfgen import (
    build_pdf_ccitt,
    ccitt_scan_ink,
    ccitt_scan_shape,
)


def _rng():
    return np.random.RandomState(13)


class TestWireVectors:
    """Absolute bit-level truth — not just self-consistency."""

    def test_all_white_rows_are_v0(self):
        # each all-white row codes as a single V0 bit '1', then EOFB
        data = encode_g4(np.zeros((2, 8), np.uint8))
        bits = "".join(f"{b:08b}" for b in data)
        assert bits.startswith("11" + "000000000001" * 2)

    def test_black_row_horizontal_codes(self):
        # H (001) + white-0 (00110101) + black-8 (000101)
        data = encode_g4(np.ones((1, 8), np.uint8))
        bits = "".join(f"{b:08b}" for b in data)
        assert bits.startswith("00100110101000101")

    def test_tables_are_prefix_free(self):
        for table in (_WHITE_DEC, _BLACK_DEC):
            codes = sorted(table, key=len)
            for i, a in enumerate(codes):
                for b in codes[i + 1 :]:
                    assert not b.startswith(a), (a, b)

    def test_second_row_vertical(self):
        # identical rows: row 2 of a black-left pattern is pure V0s
        img = np.zeros((2, 16), np.uint8)
        img[:, :5] = 1
        enc = encode_g4(img)
        dec = decode_g4(enc, 16)
        assert np.array_equal(dec, img)


class TestRoundtrip:
    @pytest.mark.parametrize(
        "h,w", [(1, 1), (3, 5), (8, 8), (16, 64), (5, 1728), (64, 17)]
    )
    def test_random(self, h, w):
        img = (_rng().rand(h, w) < 0.5).astype(np.uint8)
        assert np.array_equal(decode_g4(encode_g4(img), w), img)

    @pytest.mark.parametrize("density", [0.001, 0.05, 0.95, 0.999])
    def test_long_runs_makeup_codes(self, density):
        img = (_rng().rand(20, 3000) < density).astype(np.uint8)
        assert np.array_equal(decode_g4(encode_g4(img), 3000), img)

    def test_exhaustive_tiny(self):
        for m in range(1 << 9):
            img = np.array(
                [(m >> i) & 1 for i in range(9)], np.uint8
            ).reshape(3, 3)
            assert np.array_equal(decode_g4(encode_g4(img), 3), img), m

    @pytest.mark.parametrize("align", [False, True])
    def test_byte_align(self, align):
        img = (_rng().rand(7, 23) < 0.4).astype(np.uint8)
        enc = encode_g4(img, encoded_byte_align=align)
        assert np.array_equal(
            decode_g4(enc, 23, encoded_byte_align=align), img
        )

    def test_rows_cap_stops_early(self):
        img = (_rng().rand(6, 10) < 0.5).astype(np.uint8)
        dec = decode_g4(encode_g4(img), 10, rows=4)
        assert np.array_equal(dec, img[:4])

    def test_structured_edges(self):
        for img in (
            np.eye(12, dtype=np.uint8),
            np.tri(9, 15, dtype=np.uint8),
            np.tile([1, 0], (4, 20)).astype(np.uint8),
        ):
            w = img.shape[1]
            assert np.array_equal(decode_g4(encode_g4(img), w), img)


class TestNegatives:
    def test_truncated_stream(self):
        img = (_rng().rand(8, 40) < 0.5).astype(np.uint8)
        enc = encode_g4(img)
        with pytest.raises(CcittError):
            decode_g4(enc[: len(enc) // 3], 40, rows=8)

    def test_garbage_run_code(self):
        # 14+ zero bits inside a row is no valid code
        with pytest.raises(CcittError):
            decode_g4(b"\x20\x00\x00\x00", 64, rows=1)  # 001 then zeros

    def test_hostile_columns(self):
        with pytest.raises(CcittError, match="column"):
            decode_g4(b"\x80", 1 << 24)
        with pytest.raises(CcittError, match="column"):
            decode_g4(b"\x80", 0)

    def test_max_pixels_budget(self):
        img = np.zeros((4, 64), np.uint8)
        enc = encode_g4(img)
        with pytest.raises(CcittError, match="max_pixels"):
            decode_g4(enc, 64, rows=4, max_pixels=128)
        with pytest.raises(CcittError, match="max_pixels"):
            decode_g4(enc, 64, max_pixels=128)  # rowless path too

    def test_horizontal_overrun(self):
        # H + white-63 + black-8 on a 16-wide row overruns
        bits = "001" + "00110100" + "000101"
        bits += "0" * (-len(bits) % 8)
        data = bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
        with pytest.raises(CcittError, match="overrun"):
            decode_g4(data, 16, rows=1)

    def test_encode_empty(self):
        with pytest.raises(CcittError):
            encode_g4(np.zeros((0, 4), np.uint8))


class TestPdfTwin:
    """q82's corpus: the G4 scans round-trip through the real PDF
    container with /BlackIs1 and /EncodedByteAlign wire semantics."""

    @pytest.mark.parametrize("doc_id", [0, 1, 2, 5, 103, 9999])
    def test_closed_forms(self, doc_id):
        from sax_wasm_spark.kernel.pdftext import pdf_decode_image_stats

        rows = pdf_decode_image_stats(build_pdf_ccitt(doc_id))
        assert len(rows) == 1 + doc_id % 3
        for j, r in enumerate(sorted(rows, key=lambda r: r[1])):
            w, h, b1, _al = ccitt_scan_shape(doc_id, j)
            ink = ccitt_scan_ink(doc_id, j).astype(np.int64)
            bits = ink if b1 else 1 - ink
            assert r == (
                0, f"Scan{j}", w, h, 1,
                int(bits.sum()), int(bits.min()), int(bits.max()), "ok",
            )

    def test_g3_rejected_typed(self):
        """/K >= 0 (G3) degrades to an error row, never a crash."""
        from sax_wasm_spark.kernel.pdftext import pdf_decode_image_stats

        data = build_pdf_ccitt(3).replace(b"/K -1", b"/K 0", 1)
        rows = pdf_decode_image_stats(data)
        errs = [r for r in rows if r[-1].startswith("error:")]
        assert errs and "G3" in errs[0][-1]

    def test_dct_corpus_unaffected(self):
        """The DCT decode path still works after the CCITT branch."""
        from sax_wasm_spark.kernel.pdftext import pdf_decode_image_stats
        from sax_wasm_spark.sources.pdfgen import build_pdf

        rows = pdf_decode_image_stats(build_pdf("hello world", n_real_images=2))
        assert [r[-1] for r in rows] == ["ok", "ok"]
