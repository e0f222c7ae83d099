"""Host-skew handling (VERDICT r3 item 4): a mega-host corpus must be
spreadable across partitions by deterministic salting. The wall-clock
demonstration (salted beats unsalted at local[32] on a 50 %-hot corpus)
lives in bench.py's ``skew`` block; these tests pin the mechanics."""

from __future__ import annotations

from pyspark.sql import functions as F

from sax_wasm_spark.plans.lineage import repartition_by_host

HOT = "https://mega-host.example.com/p/"


def _skewed_pages(spark, n=2000, hot_frac_mod=2):
    """Deterministic corpus where 1/hot_frac_mod of pages share a host."""
    d = spark.range(n).withColumnRenamed("id", "doc_id")
    return d.select(
        F.when(
            F.col("doc_id") % hot_frac_mod == 0,
            F.concat(F.lit(HOT), F.col("doc_id").cast("string")),
        )
        .otherwise(
            F.concat(
                F.lit("https://host"),
                (F.col("doc_id") % 97).cast("string"),
                F.lit(".example.com/p/"),
                F.col("doc_id").cast("string"),
            )
        )
        .alias("url"),
        F.lit(b"<p>x</p>").alias("html"),
    )


def test_unsalted_hot_host_lands_in_one_partition(spark):
    pages = _skewed_pages(spark)
    parts = (
        repartition_by_host(pages, 32)
        .where(F.col("host") == "mega-host.example.com")
        .select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    assert parts == 1  # the bottleneck being demonstrated


def test_salted_hot_host_spreads_over_k_partitions(spark):
    buckets = 16
    pages = _skewed_pages(spark)
    parts = (
        repartition_by_host(pages, 64, salt_buckets=buckets)
        .where(F.col("host") == "mega-host.example.com")
        .select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    # every salt bucket is a distinct shuffle key; with 64 partitions and
    # 16 buckets, ≥ half must land on distinct partitions even allowing
    # for hash collisions between buckets
    assert parts >= buckets // 2, parts


def test_salting_is_deterministic_and_lossless(spark):
    pages = _skewed_pages(spark, n=500)
    a = repartition_by_host(pages, 16, salt_buckets=8)
    b = repartition_by_host(pages, 16, salt_buckets=8)
    assert a.count() == 500
    assert {r.url for r in a.collect()} == {r.url for r in b.collect()}
    # salt must NOT leak into the output columns
    assert "salted_key" not in a.columns and "host" in a.columns
