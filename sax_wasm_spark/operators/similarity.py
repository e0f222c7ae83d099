"""Similarity search over embedding columns.

Two tiers (the training-data pipeline contract):

- ``knn_bruteforce``: exact cosine top-k. The query vector is broadcast;
  the dot product / norms run in whole-stage codegen via
  zip_with/aggregate — no Python in the hot path. This is the oracle
  baseline and is fine up to ~10^7 vectors per query.
- ``ann_lsh``: random-hyperplane (SimHash) LSH. Each vector gets a
  ``n_planes``-bit signature from a deterministic (seeded, hash-derived)
  plane matrix; candidates = vectors whose signature matches the query
  bucket in at least one of ``n_bands`` bands; candidates are re-ranked
  exactly. At 100 TB the signature pass is a single projection scan, the
  bucket join is a broadcast of the (tiny) query buckets, and re-ranking
  touches only candidates — the classic scale path.

Signatures are computed in a vectorized pandas UDF (one numpy matmul
per Arrow batch); planes are derived from blake2b so the index is
reproducible with no RNG state.
"""

# NOTE: no `from __future__ import annotations` here — the pandas_udf
# type-hint resolver needs real (non-string) pd.Series annotations.
import hashlib
import struct

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


def _plane_matrix(dim: int, n_planes: int, seed: int):
    """Deterministic pseudo-random hyperplanes: N(0,1)-ish via hashed
    uniforms (Box-Muller-free: sum of 4 centered uniforms is fine for
    LSH purposes and fully reproducible)."""
    import numpy as np  # noqa: PLC0415

    out = np.empty((n_planes, dim), dtype=np.float64)
    for p in range(n_planes):
        h = hashlib.blake2b(struct.pack("<qqq", seed, p, dim), digest_size=32).digest()
        # expand deterministically to dim values
        vals = []
        counter = 0
        while len(vals) < dim:
            hh = hashlib.blake2b(h + struct.pack("<q", counter), digest_size=64).digest()
            for i in range(0, 64, 8):
                (u,) = struct.unpack("<Q", hh[i : i + 8])
                vals.append((u / 2**64) - 0.5)
            counter += 1
        out[p] = np.array(vals[:dim])
    return out


def with_cosine(df: DataFrame, query, emb_col: str = "embedding") -> DataFrame:
    """Adds a ``cosine`` column against ``query`` using JVM-side
    zip_with/aggregate expressions (no UDF)."""
    qlit = F.array(*[F.lit(float(x)) for x in query])
    emb = F.transform(F.col(emb_col), lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(emb, qlit, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x)
    n1 = F.sqrt(F.aggregate(F.transform(emb, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    qn = sum(float(x) * float(x) for x in query) ** 0.5
    return df.withColumn("cosine", dot / (n1 * F.lit(qn)))


def knn_bruteforce(
    df: DataFrame,
    query,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k (deterministic tiebreak on id)."""
    return (
        with_cosine(df, query, emb_col)
        .select(id_col, F.round("cosine", 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def add_lsh_signature(
    df: DataFrame,
    dim: int,
    n_planes: int = 16,
    seed: int = 42,
    emb_col: str = "embedding",
    out_col: str = "lsh_sig",
) -> DataFrame:
    """Vectorized signature pass: one numpy matmul per Arrow batch."""
    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    @pandas_udf(LongType())
    def sig(embs: pd.Series) -> pd.Series:
        import numpy as np  # noqa: PLC0415

        planes = _plane_matrix(dim, n_planes, seed)
        mat = np.stack([np.asarray(e, dtype=np.float64) for e in embs])
        bits = (mat @ planes.T) > 0  # (rows, n_planes)
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series((bits * weights).sum(axis=1).astype(np.int64))

    return df.withColumn(out_col, sig(F.col(emb_col)))


def _sig_of(query, dim: int, n_planes: int, seed: int) -> int:
    import numpy as np  # noqa: PLC0415

    planes = _plane_matrix(dim, n_planes, seed)
    bits = (planes @ np.asarray(query, dtype=np.float64)) > 0
    return int(sum(1 << i for i, b in enumerate(bits) if b))


def ann_lsh(
    df: DataFrame,
    query,
    k: int = 10,
    n_planes: int = 16,
    n_bands: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed ANN: candidate = signature matches the query in at
    least one band of ``n_planes // n_bands`` contiguous bits; candidates
    re-ranked by exact cosine. Recall grows with n_bands (multi-probe)."""
    dim = len(query)
    band_bits = n_planes // n_bands
    mask = (1 << band_bits) - 1
    qsig = _sig_of(query, dim, n_planes, seed)

    signed = add_lsh_signature(df, dim, n_planes, seed, emb_col)
    cond = None
    for b in range(n_bands):
        qband = (qsig >> (b * band_bits)) & mask
        band_expr = F.shiftright(F.col("lsh_sig"), b * band_bits).bitwiseAND(F.lit(mask)) == F.lit(qband)
        cond = band_expr if cond is None else (cond | band_expr)
    candidates = signed.where(cond)
    return (
        with_cosine(candidates, query, emb_col)
        .select(id_col, F.round("cosine", 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )
