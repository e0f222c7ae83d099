"""Deduplication operators over document corpora.

Five tiers, each exposed as an oracle-checked query in plans/queries.py:

- exact:      md5(content) groupBy                    (q15)
- minhash:    per-doc min-shingle-hash signature      (q16)
- simhash:    16-bit majority-of-nibble-bits          (q17)
- minhash+LSH pairs: k hash functions → bands →
  bucket join → candidate pairs                       (q23)
- n-gram Jaccard: exact shingle-set similarity for
  LSH candidate pairs                                 (q24)
- embedding near-dup: cosine >= τ pairs               (q25)

Everything is built-in Spark SQL expressions (hash = md5 with a salt
prefix, shared with the DuckDB oracle), so the plans stay in whole-stage
codegen and shuffle only on shingle/bucket keys. At corpus scale the
LSH bucket join replaces the quadratic pair space with per-bucket
blow-up only — the standard web-dedup layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3) -> DataFrame:
    """k-word shingles per document (positional window over the tokens)."""
    w = Window.partitionBy(id_col).orderBy("pos")
    out = df.select(id_col, F.posexplode(F.split(text_col, " ")).alias("pos", "w"))
    cols = [F.col("w")]
    for i in range(1, k):
        out = out.withColumn(f"w{i}", F.lead("w", i).over(w))
        cols.append(F.col(f"w{i}"))
    return out.where(cols[-1].isNotNull()).select(
        id_col, F.concat_ws(" ", *cols).alias("shingle")
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return (
        df.select(id_col, F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("rep_doc_id"), F.count("*").alias("n_copies"))
    )


def minhash_signatures(
    sh: DataFrame, n_hashes: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """k independent minhashes: h_i(s) = md5(i || ':' || s); signature
    column per hash. One aggregation over the shingle table."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"mh{i}")
        for i in range(n_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    n_hashes: int = 8,
    band_size: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 3,
) -> DataFrame:
    """Near-dup candidate pairs: docs agreeing on ALL hashes of at least
    one band. bands = n_hashes / band_size; bucket key = band index +
    concatenated band minhashes; pairs (a < b) deduplicated."""
    sigs = minhash_signatures(shingles(df, id_col, text_col, k_shingle), n_hashes, id_col)
    n_bands = n_hashes // band_size
    bands = []
    for b in range(n_bands):
        cols = [F.col(f"mh{i}") for i in range(b * band_size, (b + 1) * band_size)]
        bands.append(
            sigs.select(
                F.col(id_col),
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("|", *cols)).alias("bucket"),
            )
        )
    buckets = bands[0]
    for x in bands[1:]:
        buckets = buckets.unionByName(x)
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .distinct()
    )


def ngram_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 3,
) -> DataFrame:
    """Exact Jaccard similarity over distinct k-shingle sets for the
    given candidate pairs (doc_a, doc_b)."""
    sh = shingles(df, id_col, text_col, k_shingle).distinct()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = sh.withColumnRenamed(id_col, "doc_a")
    b = sh.withColumnRenamed(id_col, "doc_b")
    inter = (
        pairs.join(a, "doc_a")
        .join(b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed(id_col, "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed(id_col, "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter") / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")), 6
            ).alias("jaccard"),
        )
    )


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact cosine near-dup pairs (a < b, cosine >= threshold). The
    normalized self-join is exact; at scale, pre-block with
    similarity.add_lsh_signature and join on bucket before the exact
    re-check (same output, far fewer pairs)."""
    d = emb.select(
        F.col(id_col),
        F.transform(emb_col, lambda x: x.cast("double")).alias("e"),
    )
    norm = F.sqrt(F.aggregate(F.transform("e", lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
    d = d.withColumn("nrm", norm)
    a = d.select(F.col(id_col).alias("id_a"), F.col("e").alias("ea"), F.col("nrm").alias("na"))
    b = d.select(F.col(id_col).alias("id_b"), F.col("e").alias("eb"), F.col("nrm").alias("nb"))
    dot = F.aggregate(F.zip_with("ea", "eb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", dot / (F.col("na") * F.col("nb")))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )
