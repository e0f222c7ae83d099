"""Driver bench-capture contract (VERDICT r4 item 1, third redesign).

The driver records only a ~2000-char TAIL of bench.py's stdout; rounds
3 and 4 both landed ``parsed: null`` because the single JSON line was
~4 KB and its head (the opening brace) fell outside the window. The
fix: stdout carries one COMPACT summary line; the full detail goes to
BENCH_DETAIL.json. This test pins the compact line's size with a
worst-case-realistic full result so the contract cannot silently
regress as metrics are added.
"""

from __future__ import annotations

import io
import json

import bench
from bench import HEADLINE, compact_result, emit_result

# A full-detail result at least as large as a real run's (longest
# observed values, every optional block present).
_FULL = {
    "metric": "headline query wall-clock + extraction docs/sec scaling",
    "unit": "sec",
    "sf": "/root/testdata/sf0.1",
    "queries": {name: 123.4567 for name in HEADLINE},
    "calibration_sec": 12.3456,
    "queries_normalized": {name: 123.456 for name in HEADLINE},
    "recall": {
        "n_queries": 20,
        "k": 10,
        "ann_lsh_recall_at_10": 0.4444,
        "ann_lsh_tuned_recall_at_10": 0.9055,
        "ann_int_lsh_recall_at_10": 0.4333,
        "ivf_probe4_recall_at_10": 0.8944,
        "ivf_probe8_recall_at_10": 0.9555,
    },
    "kernel": {
        "fixture_mb": 3.12,
        "masks": {
            "0x141": {"np": 14.91, "fast": 9.8, "ref": 31.2, "np_vs_ref": 0.4777},
            "0x381": {"np": 13.95, "fast": 9.1, "ref": 29.6, "np_vs_ref": 0.4711},
        },
    },
    "skew": {
        "n_docs": 20033,
        "hot_frac": 0.5,
        "cores": 8,
        "partitions": 32,
        "unsalted_sec": 5.095,
        "salted_sec": 2.126,
        "salting_speedup": 2.39,
    },
    "warc": {
        "cores": 8,
        "n_shards": 6000,
        "input_mb": 123.45,
        "wall_sec": 12.345,
        "shards_per_sec": 1234.5,
        "mb_per_sec": 123.45,
    },
    "refresh": {
        "cores": 8,
        "n_pages": 20000,
        "avg_page_kb": 40.1,
        "churn_frac": 0.05,
        "stage_scratch_sec": 123.456,
        "stage_incremental_sec": 12.345,
        "refresh_stage_speedup": 12.34,
        "e2e_scratch_sec": 123.456,
        "e2e_incremental_sec": 112.345,
        "refresh_e2e_speedup": 1.23,
        "n_reused": 19000,
    },
    "extract_docs_per_sec_2c": 3180.12,
    "extract_mb_per_sec_2c": 55.12,
    "extract_wall_2c_sec": 123.456,
    "extract_docs_per_sec_8c": 12118.12,
    "extract_mb_per_sec_8c": 207.5,
    "extract_wall_8c_sec": 33.456,
    "extract_docs_per_sec_N": 3180.12,
    "extract_docs_per_sec_4N": 12118.12,
    "scaling_efficiency": 0.9246,
    "scaling_efficiency_2to8": 0.9246,
    "scaling_rounds": 8,
    "scaling_efficiency_per_round": [
        0.9131, 0.9155, 0.9012, 0.9246, 0.7712, 1.0123, 0.7344, 0.9955,
    ],
    "note": "x" * 430,
    "value": 512.345,
}


def test_compact_line_fits_driver_tail_window():
    compact = compact_result(_FULL)
    line = json.dumps(compact)
    # The driver window is 2000 chars; require clear headroom so a few
    # added scalars can't push the line back over the cliff.
    assert len(line) < 1800, f"compact stdout line too long: {len(line)}"
    assert "\n" not in line


def test_compact_keeps_driver_contract_fields():
    compact = compact_result(_FULL)
    for key in ("metric", "value", "unit", "sf", "queries"):
        assert key in compact, key
    assert set(compact["queries"]) == set(HEADLINE)
    # the judge-facing headline scalars survive compaction
    assert compact["scaling_efficiency"] == 0.9246
    assert compact["np_vs_ref_0x141"] == 0.4777
    assert compact["salting_speedup"] == 2.39
    assert compact["recall_tuned"] == 0.9055
    assert compact["warc_mb_per_sec"] == 123.45
    assert compact["refresh_stage_speedup"] == 12.34
    assert compact["refresh_e2e_speedup"] == 1.23


def test_compact_line_is_last_across_merged_streams(tmp_path, monkeypatch):
    """Round-5 regression (VERDICT r5 item 1): the driver tails the
    MERGED stdout+stderr stream, so the compact line must be the final
    line main() emits on EITHER stream. Simulate the merge by pointing
    both streams at one buffer and assert the last line parses as the
    compact result."""
    merged = io.StringIO()
    monkeypatch.setattr(bench.sys, "stdout", merged)
    monkeypatch.setattr(bench.sys, "stderr", merged)
    # print() without file= resolves sys.stdout from the real sys module
    import sys as real_sys

    monkeypatch.setattr(real_sys, "stdout", merged)
    monkeypatch.setattr(real_sys, "stderr", merged)
    emit_result(_FULL, detail_path=str(tmp_path / "BENCH_DETAIL.json"))
    lines = [ln for ln in merged.getvalue().splitlines() if ln.strip()]
    last = json.loads(lines[-1])
    assert last == compact_result(_FULL)
    assert len(lines[-1]) < 1800
    # the detail file carries the full dict
    with open(tmp_path / "BENCH_DETAIL.json") as f:
        assert json.load(f) == _FULL


def test_compact_line_is_last_even_when_detail_write_fails(tmp_path, monkeypatch):
    merged = io.StringIO()
    import sys as real_sys

    monkeypatch.setattr(real_sys, "stdout", merged)
    monkeypatch.setattr(real_sys, "stderr", merged)
    emit_result(_FULL, detail_path=str(tmp_path / "nodir" / "BENCH_DETAIL.json"))
    lines = [ln for ln in merged.getvalue().splitlines() if ln.strip()]
    assert json.loads(lines[-1]) == compact_result(_FULL)


def test_compact_tolerates_missing_optional_blocks():
    minimal = {
        "metric": _FULL["metric"],
        "unit": "sec",
        "sf": "/root/testdata/sf0.1",
        "queries": {"q01_pricing_summary": 0.5},
        "value": 1.0,
    }
    compact = compact_result(minimal)
    assert compact["value"] == 1.0
    assert "np_vs_ref_0x141" not in compact


def test_aesv3_share_is_pinned_per_sf():
    """VERDICT r6 item 8: the AESV3 gate (pdf variant 10 with
    len(text) % 16 == 1) makes the number of Hash-2B-paying docs a
    silent function of the corpus — a future testdata tweak could turn
    pdf_extract_roundtrip into a KDF benchmark unnoticed. Pin the
    expected count per sf so any shift is a visible test failure, not
    a mystery bench regression."""
    import os

    import duckdb
    import pytest

    expected = {"sf0.001": 1, "sf0.01": 2, "sf0.1": 17}
    for sf, want in expected.items():
        path = f"/root/testdata/{sf}/documents.parquet"
        if not os.path.exists(path):
            pytest.skip(f"{path} absent")
        got = duckdb.sql(
            f"SELECT count(*) FROM '{path}' "
            "WHERE doc_id % 15 = 10 AND length(text) % 16 = 1"
        ).fetchone()[0]
        assert got == want, (
            f"{sf}: AESV3-gated doc count moved {want} -> {got}; "
            "re-budget pdf_extract_roundtrip (each doc pays ~3 Hash-2B "
            "KDF calls, ~0.3 s each) or adjust the gate"
        )
