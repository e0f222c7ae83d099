"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (SAX-tokenize the corpus
documents and histogram the event stream); ``queries()`` /
``oracle_sql()`` expose the full operator battery defined in
``sax_wasm_spark.plans.queries`` — relational operators, training-data
operators (dedup / minhash / simhash / kNN / quality), and parser-backed
queries whose oracles are closed-form SQL over the fixed HTML wrapper.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sax_wasm_spark.plans.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: tokenize the sf0.001 corpus documents (wrapped as pages)
    and return the per-event-type histogram."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    from sax_wasm_spark.plans.queries import _wrapped_docs  # noqa: PLC0415
    from sax_wasm_spark.operators.tokenize import tokenize_events  # noqa: PLC0415

    sf_dir = os.environ.get("SPARK_GRAFT_ENTRY_SF", "/root/testdata/sf0.001")
    pages = _wrapped_docs(spark, sf_dir)
    # histogram reads no position columns → positions-off kernel
    ev = tokenize_events(pages, id_cols=("doc_id",), positions=False)
    return (
        ev.groupBy("event")
        .agg(F.count("*").alias("n_events"), F.countDistinct("doc_id").alias("n_docs"))
        .orderBy("event")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
