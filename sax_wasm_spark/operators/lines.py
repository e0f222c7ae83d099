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
2. removal strategy, two implemented paths with identical semantics
   (differentially tested in tests/test_lines_fallback.py):

   * ``broadcast`` — the hot set (df ≥ min_df) is collected into ONE
     row and broadcast; removal is an IN-ROW array filter against the
     broadcast set joined on a constant key. Catalyst folds the
     constant key, so the plan shows a BroadcastNestedLoopJoin — over
     EXACTLY ONE build-side row (a global aggregate), i.e. a broadcast
     variable in join clothing, not a blow-up. No per-document
     shuffle; row count unchanged. Right when high-DF lines are few
     (at min_df = 0.001 % of a 10^12 corpus the set is ≤ 10^5 entries
     per 10^8 distinct lines).
   * ``anti_join`` — the escape hatch for corpora where the hot set is
     too large to collect on the driver (low ``min_df``, adversarial
     corpora where most lines are hot): posexplode every line with its
     position, LEFT ANTI join against the hot-line frame (a plain
     shuffled join — no driver materialization anywhere), then rebuild
     each document's text from the surviving (pos, line) pairs and
     left-join back so documents that lost every line still appear
     with ``out_col = ''``. Costs two extra shuffles (the anti join on
     line and the re-group by id), which is the correct trade once the
     hot set cannot fit in driver/executor memory.
   * ``auto`` — counts the hot set (one cheap aggregate job on the
     already-reduced line-DF frame, persisted so the decision does not
     recompute the aggregation) and picks ``broadcast`` iff
     hot-count ≤ ``broadcast_limit``.
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
    strategy: str = "broadcast",
    broadcast_limit: int = 1_000_000,
) -> DataFrame:
    """Drop every line occurring in ≥ ``min_df`` documents from every
    document. Output = input columns + ``out_col`` (surviving lines
    re-joined with \\n; empty string when nothing survives).

    ``strategy``: ``broadcast`` (default; hot set collected to one row),
    ``anti_join`` (no driver materialization — scale escape hatch), or
    ``auto`` (count the hot set, pick ``broadcast`` iff it is ≤
    ``broadcast_limit``). All paths produce identical output; the
    ``anti_join`` path additionally requires ``id_col`` to be unique
    (it reassembles documents by that key).
    """
    if strategy not in ("broadcast", "anti_join", "auto"):
        raise ValueError(f"unknown strategy {strategy!r}")
    persisted = None
    lines = F.split(F.col(text_col), "\n")
    line_df = (
        df.select(F.col(id_col), F.explode(F.array_distinct(lines)).alias("line"))
        .groupBy("line")
        .agg(F.count("*").alias("df"))
    )
    hot_lines = line_df.where(F.col("df") >= min_df).select("line")

    if strategy == "auto":
        # persist the reduced hot frame so the sizing count and the
        # chosen path share one aggregation of the corpus. The cache is
        # still needed when the returned (lazy) frame executes, so it
        # cannot be unpersisted here — it is exposed on the result as
        # ``_sax_persisted`` and callers that materialize the output
        # (e.g. prepare_corpus_job, which writes it to parquet
        # immediately) unpersist it afterwards.
        hot_lines = persisted = hot_lines.persist()
        strategy = "broadcast" if hot_lines.count() <= broadcast_limit else "anti_join"

    if strategy == "broadcast":
        hot = hot_lines.agg(F.collect_set("line").alias("_hot")).withColumn(
            "_k", F.lit(1)
        )
        out = (
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
        out._sax_persisted = persisted
        return out

    # anti_join path: (id, pos, line) rows survive the anti join, then are
    # reassembled in original order; docs whose every line was hot come
    # back via the left join with an empty string.
    exploded = df.select(
        F.col(id_col), F.posexplode(lines).alias("_pos", "_line")
    )
    survivors = (
        exploded.join(hot_lines, exploded["_line"] == hot_lines["line"], "left_anti")
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                    lambda s: s["_line"],
                ),
                "\n",
            ).alias(out_col)
        )
    )
    out = (
        df.join(survivors, id_col, "left")
        # NULL-text rows produce no exploded lines, so they miss the
        # survivors frame; the broadcast path yields NULL for them
        # (filter/array_join of NULL), so keep NULL here too — both
        # strategies must stay byte-identical (differential tests)
        .withColumn(
            out_col,
            F.when(F.col(text_col).isNull(), F.lit(None).cast("string")).otherwise(
                F.coalesce(F.col(out_col), F.lit(""))
            ),
        )
        # restore the broadcast path's column order (join moves the key first)
        .select(*df.columns, out_col)
    )
    out._sax_persisted = persisted
    return out
