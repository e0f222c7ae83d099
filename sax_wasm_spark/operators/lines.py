"""Cross-corpus boilerplate-line removal (the C4/RefinedWeb step).

Extraction heuristics act within one document; lines repeated across
MANY documents (cookie banners, nav crumbs, footers the DOM classifier
could not prove boilerplate) are only visible corpus-wide. This
operator removes every line whose document frequency reaches
``min_df``, preserving the order of surviving lines per document.

Scale shape (the part that matters at 10^12 docs):

1. line-DF aggregation — explode is map-side, the groupBy(line) shuffle
   carries ~1 row per distinct (line, partition) after partial
   aggregation;
2. the hot set (df ≥ min_df) is collected into ONE row and broadcast —
   by definition high-DF lines are few relative to the corpus (set
   ``min_df`` high enough that this holds: at min_df = 0.001 % of a
   10^12 corpus the set is ≤ 10^5 entries per 10^8 distinct lines); if
   a corpus ever produced a huge hot set, swap step 3 for a left-anti
   join on exploded lines — same semantics, one more shuffle;
3. removal is an IN-ROW array filter against the broadcast set joined
   on a constant key. Catalyst folds the constant key, so the plan
   shows a BroadcastNestedLoopJoin — over EXACTLY ONE build-side row
   (a global aggregate), i.e. a broadcast variable in join clothing,
   not a blow-up. No per-document shuffle; row count unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def remove_boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 2,
    out_col: str = "clean_text",
) -> DataFrame:
    """Drop every line occurring in ≥ ``min_df`` documents from every
    document. Output = input columns + ``out_col`` (surviving lines
    re-joined with \\n; empty string when nothing survives)."""
    lines = F.split(F.col(text_col), "\n")
    line_df = (
        df.select(F.col(id_col), F.explode(F.array_distinct(lines)).alias("line"))
        .groupBy("line")
        .agg(F.count("*").alias("df"))
    )
    hot = (
        line_df.where(F.col("df") >= min_df)
        .agg(F.collect_set("line").alias("_hot"))
        .withColumn("_k", F.lit(1))
    )
    return (
        df.withColumn("_k", F.lit(1))
        .join(F.broadcast(hot), "_k")
        .withColumn(
            out_col,
            F.array_join(
                F.filter(lines, lambda l: ~F.array_contains(F.col("_hot"), l)), "\n"
            ),
        )
        .drop("_k", "_hot")
    )
