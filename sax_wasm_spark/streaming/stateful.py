"""Custom stateful streaming operator via applyInPandasWithState —
the SURVEY.md §2.4 "custom stateful operators" row.

``running_host_totals`` keeps one state row per host (cumulative page
and byte counters) across micro-batches and emits the updated totals
every batch — the live ingestion-monitoring rollup of the extraction
pipeline. State is bounded by the host cardinality, not the stream.

No `from __future__ import annotations` (pandas type resolution).
"""

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "host string, total_pages long, total_bytes long, batch_pages long"
STATE_SCHEMA = "total_pages long, total_bytes long"


def _update(key, pdfs, state: GroupState):
    total_pages, total_bytes = state.get if state.exists else (0, 0)
    batch_pages = 0
    batch_bytes = 0
    for pdf in pdfs:
        batch_pages += len(pdf)
        batch_bytes += int(pdf["n_bytes"].sum()) if len(pdf) else 0
    total_pages += batch_pages
    total_bytes += batch_bytes
    state.update((total_pages, total_bytes))
    yield pd.DataFrame(
        {
            "host": [key[0]],
            "total_pages": [total_pages],
            "total_bytes": [total_bytes],
            "batch_pages": [batch_pages],
        }
    )


def running_host_totals(pages_stream: DataFrame) -> DataFrame:
    """Streaming DataFrame of per-host cumulative counters."""
    hosted = pages_stream.select(
        F.regexp_extract("url", r"^https?://([^/]+)/", 1).alias("host"),
        F.length("html").alias("n_bytes"),
    )
    return hosted.groupBy("host").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
