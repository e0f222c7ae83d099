"""Production dedup job — the full "which rows do I drop" pipeline.

Composes the dedup family end-to-end over a documents table:

  1. exact pass: md5(content) groupBy — exact duplicates collapse to
     their min-id representative without any pair machinery;
  2. near-dup candidates: in-row shingle/minhash signatures → band
     buckets → bucket self-join (operators/dedup.minhash_lsh_pairs);
  3. verification: exact n-gram Jaccard on candidates only, filtered
     at --jaccard (kills LSH false positives);
  4. cluster resolution: verified pairs → connected components →
     (doc_id, rep_id, keep) (operators/clusters.resolve_clusters);
  5. survivors: documents anti-joined against the drop list
     (near-dup non-representatives ∪ exact-dup non-representatives).

Usage (cluster):
    zip -r sax_wasm_spark.zip sax_wasm_spark
    spark-submit --py-files sax_wasm_spark.zip jobs/dedup_job.py \\
        --input <documents parquet> --output <root> --jaccard 0.8

Usage (sandbox):
    python jobs/dedup_job.py --input /root/testdata/sf0.01/documents.parquet \\
        --output /tmp/dedup_out

Scale notes: stages 1-3 shuffle only on hash/bucket/id keys (never on
raw text); stage 4's loop runs over the pair list (orders of magnitude
smaller than the corpus); stage 5 is one broadcast-able anti-join. The
drop list, keep table, and verified-pair table are all persisted for
audit.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_dedup(
    spark,
    docs,
    out_path: str,
    jaccard: float = 0.8,
    n_hashes: int = 8,
    band_size: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int | None = 10_000,
) -> dict:
    from pyspark.sql import functions as F  # noqa: PLC0415

    from sax_wasm_spark.operators.clusters import resolve_clusters  # noqa: PLC0415
    from sax_wasm_spark.operators.dedup import (  # noqa: PLC0415
        exact_dedup,
        minhash_lsh_pairs,
        ngram_jaccard,
    )

    # 1. exact duplicates (content-hash groupBy; no pairs needed)
    exact = exact_dedup(docs, id_col, text_col)
    exact_drops = (
        docs.select(id_col, F.md5(F.col(text_col)).alias("content_hash"))
        .join(exact.where(F.col("n_copies") > 1), "content_hash")
        .where(F.col(id_col) != F.col("rep_doc_id"))
        .select(F.col(id_col).alias("drop_id"), F.lit("exact").alias("reason"))
    )

    # 2-3. near-dup candidates, verified by exact Jaccard. The hot-
    # bucket guard caps the bucket self-join's worst key: a degenerate
    # bucket (mass-duplicated boilerplate) is dropped WITH a logged
    # count — its members are exact duplicates of each other in
    # practice and stage 1 already collapsed those.
    pairs = minhash_lsh_pairs(
        docs, n_hashes, band_size, id_col, text_col, max_bucket=max_bucket
    )
    verified = ngram_jaccard(docs, pairs, id_col, text_col).where(
        F.col("jaccard") >= jaccard
    )
    verified.write.mode("overwrite").parquet(f"{out_path}/pairs")
    cached = getattr(pairs, "_sax_persisted", None)
    if cached is not None:  # free the armed hot-bucket guard's cache
        cached.unpersist()
    verified = spark.read.parquet(f"{out_path}/pairs")

    # 4. components → representatives
    clusters = resolve_clusters(verified)
    clusters.write.mode("overwrite").parquet(f"{out_path}/clusters")
    cached = getattr(clusters, "_sax_persisted", None)
    if cached is not None:  # free the final checkpoint's blocks
        cached.unpersist()
    clusters = spark.read.parquet(f"{out_path}/clusters")
    near_drops = clusters.where(~F.col("keep")).select(
        F.col("doc_id").alias("drop_id"), F.lit("near").alias("reason")
    )

    # 5. survivors = docs minus the union-ed drop list
    drops = exact_drops.unionByName(near_drops).groupBy("drop_id").agg(
        F.min("reason").alias("reason")
    )
    drops.write.mode("overwrite").parquet(f"{out_path}/drops")
    drops = spark.read.parquet(f"{out_path}/drops")
    kept = docs.join(
        drops.withColumnRenamed("drop_id", id_col), id_col, "left_anti"
    )
    kept.write.mode("overwrite").parquet(f"{out_path}/kept")

    n_docs = docs.count()
    n_drop = drops.count()
    return {
        "n_docs": n_docs,
        "n_pairs_verified": verified.count(),
        "n_clusters": clusters.where(F.col("keep")).count(),
        "n_dropped": n_drop,
        "n_kept": n_docs - n_drop,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet (doc_id, text, ...)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--jaccard", type=float, default=0.8)
    ap.add_argument(
        "--max-bucket",
        type=int,
        default=10_000,
        help="drop LSH buckets larger than this before the self-join (0 disables)",
    )
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from sax_wasm_spark.session import get_spark  # noqa: PLC0415

    spark = get_spark(app_name="sax-dedup-job", cores=args.cores)
    try:
        docs = spark.read.parquet(args.input)
        stats = run_dedup(
            spark,
            docs,
            args.output,
            jaccard=args.jaccard,
            max_bucket=args.max_bucket or None,
        )
        print(json.dumps(stats))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
