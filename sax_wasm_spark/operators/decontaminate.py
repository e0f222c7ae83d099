"""Benchmark decontamination — drop training documents that share an
n-gram with an evaluation set.

The standard LLM-curation step (GPT-3 §B / PaLM / Llama all use a
10-13-token overlap rule): any training document containing an n-gram
that also appears in an eval benchmark is removed so downstream eval
scores measure generalization, not memorization.

Scale shape: the EVAL side is small by nature (benchmarks are thousands
of documents, not billions) — its distinct n-gram set is aggregated to
ONE row and broadcast; the corpus side builds its n-grams IN-ROW
(transform over a sequence of slices, zero shuffle) and keeps a document
iff none of its grams hits the broadcast set. One scan over the corpus,
no join on the corpus side's exploded grams. If an eval set were ever
too large to broadcast, swap the exists-filter for a left-anti join on
exploded gram hashes — same semantics, one extra shuffle.
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
) -> DataFrame:
    """Rows of ``corpus`` whose text shares NO word n-gram with any row
    of ``eval_df``. Column set of ``corpus`` is preserved."""
    eval_grams = (
        eval_df.select(F.explode(ngrams(eval_text_col, n)).alias("g"))
        .agg(F.collect_set("g").alias("_eval_grams"))
        .withColumn("_k", F.lit(1))
    )
    return (
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
