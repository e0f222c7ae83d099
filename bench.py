"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line:
    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

It also measures the north-rule extraction throughput (docs/sec over a
deterministic synthetic pages corpus) at two parallelism levels —
local[8] vs local[32] as the sandbox stand-in for N vs 4N executors —
and reports the scaling efficiency. Set SPARK_GRAFT_BENCH_SCALING=0 to
skip the second (N-core) measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_SMALL = int(os.environ.get("SPARK_GRAFT_BENCH_SMALL_CPUS", "8"))
N_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "8000"))
DO_SCALING = os.environ.get("SPARK_GRAFT_BENCH_SCALING", "1") != "0"

HEADLINE = [
    "q01_pricing_summary",
    "q02_revenue_by_nation",
    "q03_latest_order_per_customer",
    "q10_events_window",
    "q12_token_explode",
    "q15_dedup_exact",
    "q16_minhash_signature",
    "q17_simhash16",
    "q18_knn_cosine",
    "sax_text_events",
    "sax_extract_roundtrip",
]


def _fresh_spark(cores: int, app: str):
    from sax_wasm_spark.session import get_spark

    return get_spark(app_name=app, cores=cores, shuffle_partitions=max(2 * cores, 16))


def run_queries(spark) -> dict[str, float]:
    from sax_wasm_spark.plans.queries import QUERIES

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 4)
        _ = n
    return timings


def extraction_throughput(cores: int) -> tuple[float, float]:
    """Docs/sec for the full tokenize+extract pipeline over the synthetic
    pages corpus (identical input at any parallelism — deterministic)."""
    from sax_wasm_spark.operators.extract import extract_main_content
    from sax_wasm_spark.sources.pages import synthesize_pages

    spark = _fresh_spark(cores, f"bench-extract-{cores}")
    try:
        pages = synthesize_pages(spark, N_PAGES, partitions=4 * cores)
        pages = pages.persist()
        n_docs = pages.count()  # materialize input outside the timed region
        t0 = time.perf_counter()
        ex = extract_main_content(pages)
        out = ex.selectExpr(
            "count(*) AS n", "sum(length(text)) AS chars", "sum(n_events) AS ev"
        ).collect()[0]
        dt = time.perf_counter() - t0
        assert out["n"] == n_docs
        return n_docs / dt, dt
    finally:
        spark.stop()


def main():
    t_all = time.perf_counter()

    spark = _fresh_spark(CPUS, "bench-queries")
    try:
        timings = run_queries(spark)
    finally:
        spark.stop()

    result = {
        "metric": "headline query wall-clock + extraction docs/sec scaling",
        "unit": "sec",
        "sf": SF_DIR,
        "queries": timings,
    }

    tput_4n, dt_4n = extraction_throughput(CPUS)
    result["extract_docs_per_sec_4N"] = round(tput_4n, 2)
    result["extract_wall_4N_sec"] = round(dt_4n, 3)
    result["extract_cores_4N"] = CPUS

    if DO_SCALING:
        tput_n, dt_n = extraction_throughput(N_SMALL)
        result["extract_docs_per_sec_N"] = round(tput_n, 2)
        result["extract_wall_N_sec"] = round(dt_n, 3)
        result["extract_cores_N"] = N_SMALL
        ratio = CPUS / N_SMALL
        result["scaling_efficiency"] = round((tput_4n / tput_n) / ratio, 4)

    result["value"] = round(time.perf_counter() - t_all, 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
