"""Benchmark decontamination — drop training documents that share an
n-gram with an evaluation set.

The standard LLM-curation step (GPT-3 §B / PaLM / Llama all use a
10-13-token overlap rule): any training document containing an n-gram
that also appears in an eval benchmark is removed so downstream eval
scores measure generalization, not memorization.

Scale shape, two implemented paths with identical semantics
(differentially tested in tests/test_lines_fallback.py):

* ``broadcast`` — the EVAL side is small by nature (benchmarks are
  thousands of documents, not billions): its distinct n-gram set is
  aggregated to ONE row and broadcast; the corpus side builds its
  n-grams IN-ROW (transform over a sequence of slices, zero shuffle)
  and keeps a document iff none of its grams hits the broadcast set.
  One scan over the corpus, no join on the corpus side's exploded
  grams.
* ``anti_join`` — the escape hatch when the eval gram set is too large
  to collect on the driver (a very large eval suite, or a small ``n``
  over long benchmarks): explode each corpus document's DISTINCT grams
  with its id, LEFT SEMI join against the eval-gram frame to find
  contaminated ids, then LEFT ANTI join the corpus against those ids.
  Only (id, gram) pairs shuffle — never document text. Requires an
  ``id_col``; costs two shuffles, the correct trade once the gram set
  cannot fit in memory.
* ``auto`` — counts the distinct eval grams (cheap: the eval side is
  the small one) and picks ``broadcast`` iff count ≤
  ``broadcast_limit``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ngrams(col: Column | str, n: int) -> Column:
    """Adjacent word n-grams as 'w1 … wn' strings, built in-row; empty
    array for documents shorter than n tokens."""
    toks = F.split(col, " ")
    k = F.size(toks) - F.lit(n - 1)
    return F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    n: int = 13,
    text_col: str = "text",
    eval_text_col: str = "text",
    strategy: str = "broadcast",
    broadcast_limit: int = 5_000_000,
    id_col: str | None = None,
) -> DataFrame:
    """Rows of ``corpus`` whose text shares NO word n-gram with any row
    of ``eval_df``. Column set of ``corpus`` is preserved.

    ``strategy``: ``broadcast`` (default), ``anti_join`` (scale escape
    hatch; requires a unique ``id_col`` on ``corpus``), or ``auto``
    (count distinct eval grams, broadcast iff ≤ ``broadcast_limit``).
    All paths produce identical output.
    """
    if strategy not in ("broadcast", "anti_join", "auto"):
        raise ValueError(f"unknown strategy {strategy!r}")
    eval_gram_df = eval_df.select(
        F.explode(ngrams(eval_text_col, n)).alias("_g")
    ).distinct()

    persisted = None
    if strategy == "auto":
        # cache survives until the returned frame executes; exposed as
        # ``_sax_persisted`` for callers to unpersist after materializing
        eval_gram_df = persisted = eval_gram_df.persist()
        strategy = (
            "broadcast" if eval_gram_df.count() <= broadcast_limit else "anti_join"
        )

    if strategy == "broadcast":
        eval_grams = eval_gram_df.agg(
            F.collect_set("_g").alias("_eval_grams")
        ).withColumn("_k", F.lit(1))
        out = (
            corpus.withColumn("_k", F.lit(1))
            .join(F.broadcast(eval_grams), "_k")
            .where(
                ~F.exists(
                    ngrams(text_col, n),
                    lambda g: F.array_contains(F.col("_eval_grams"), g),
                )
            )
            .drop("_k", "_eval_grams")
        )
        out._sax_persisted = persisted
        return out

    if id_col is None:
        raise ValueError("strategy='anti_join' requires id_col")
    contaminated = (
        corpus.select(
            F.col(id_col),
            F.explode(F.array_distinct(ngrams(text_col, n))).alias("_g"),
        )
        .join(eval_gram_df, "_g", "left_semi")
        .select(id_col)
        .distinct()
    )
    out = corpus.join(contaminated, id_col, "left_anti")
    out._sax_persisted = persisted
    return out
