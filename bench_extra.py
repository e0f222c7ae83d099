"""Ad-hoc measurement harness for the optimization rounds (guide §1).

NOT part of the driver contract — bench.py stays frozen. This script
exists so individual queries can be isolated, repeated, and explained
without paying for the whole bench:

    python bench_extra.py --sf /root/testdata/sf1.0 q44_host_politeness q02_revenue_by_nation
    python bench_extra.py --sf /root/testdata/sf1.0 --repeats 3 --explain plans/r08 --suffix _before q44_host_politeness
    python bench_extra.py --sf /root/testdata/sf1.0 --all   # every bench.py headline query

Methodology matches bench.py run_queries exactly (one untimed warm-up
pass, then timed ``.count()`` passes) so numbers are comparable with
BENCH_r07; ``--noop`` switches the action to the noop sink (guide §1.4)
which computes every column instead of letting count() prune.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

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
    "q36_repetition_stats",
    "q38_boilerplate_lines",
    "q44_host_politeness",
    "q45_sequence_pack",
    "q63_paragraph_dedup",
    "q64_extract_non_utf8",
    "q75_html_media_decode",
    "q77_video_decode_stats",
    "q82_ccitt_scan_decode",
    "sax_text_events",
    "sax_extract_roundtrip",
    "pdf_extract_roundtrip",
    "warc_roundtrip",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query names (see plans/queries.QUERIES)")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeats", type=int, default=1, help="timed passes per query (min reported)")
    ap.add_argument("--all", action="store_true", help="run every bench.py headline query")
    ap.add_argument("--noop", action="store_true", help="time a noop-sink write instead of count()")
    ap.add_argument("--explain", default=None, help="directory to write <name><suffix>.txt explain dumps")
    ap.add_argument("--suffix", default="", help="suffix for explain dumps, e.g. _before/_after")
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()

    names = list(args.names)
    if args.all:
        names = HEADLINE + [n for n in names if n not in HEADLINE]
    if not names:
        ap.error("no queries given (use --all or list names)")

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from sax_wasm_spark.session import get_spark
    from sax_wasm_spark.plans.queries import QUERIES

    spark = get_spark(app_name="bench-extra", cores=cpus,
                      shuffle_partitions=max(2 * cpus, 16))

    def run(df):
        if args.noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()

    out: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    try:
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            for name in names:
                df = QUERIES[name](spark, args.sf)
                with open(os.path.join(args.explain, f"{name}{args.suffix}.txt"), "w") as f:
                    f.write(df._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        if not args.no_warmup:
            for name in names:
                spark.sparkContext.setJobDescription(f"warmup {name}")
                run(QUERIES[name](spark, args.sf))
        for name in names:
            vals = []
            for i in range(args.repeats):
                spark.sparkContext.setJobDescription(f"timed {name} #{i}")
                t0 = time.perf_counter()
                run(QUERIES[name](spark, args.sf))
                vals.append(round(time.perf_counter() - t0, 4))
            out[name] = min(vals)
            samples[name] = vals
    finally:
        spark.stop()
    print(json.dumps({"sf": args.sf, "action": "noop" if args.noop else "count",
                      "queries": out, "samples": samples, "total": round(sum(out.values()), 2)}))


if __name__ == "__main__":
    main()
