"""SparkSession factory with scale-appropriate defaults.

Tuned for the engine's workload: Arrow-batched Python UDFs over a
binary-heavy pages table, AQE on for runtime re-planning / skew joins,
bounded Arrow batches so per-task memory stays fixed no matter how large
the html payloads are (the Spark analogue of the reference's fixed
640 KB → 9.6 MB WASM memory, saxWasm.ts:794).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "sax-wasm-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cores, 32)

    b = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # r8 (guide §3.1): let AQE rewrite sort-merge to shuffled-hash
        # when the RUNTIME post-shuffle partition size is under the
        # threshold — skips both sort passes. Scale-adaptive by
        # construction: the decision is per-partition from actual map
        # output sizes, so a 100-TB join whose partitions exceed the
        # threshold keeps sort-merge; with sanely sized shuffle
        # partitions (~128 MB, §2.2) the build side fits by definition.
        # Measured 10-15% on the join queries (q02/q04/q05) at sf1.0.
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "128m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bound per-batch memory: html payloads can be MBs each
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # progress bars interleave with stdout and can clobber the one
        # machine-readable JSON line contracts like bench.py must emit
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
