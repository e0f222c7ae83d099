"""Duplicate-cluster resolution: candidate pairs → connected
components → one kept representative per cluster.

The missing last step of the dedup family (VERDICT r1, What's missing
item 1): LSH produces candidate PAIRS; a real pipeline must decide
which rows to drop. Components are computed with iterative min-label
propagation expressed entirely in DataFrame ops:

- each node starts labeled with its own id;
- each round, a node's label becomes the min of its own and its
  neighbors' labels (an id-keyed join + groupBy-min);
- a pointer-jumping step (label := label's label) follows, which
  collapses chains exponentially — convergence in O(log diameter)
  rounds instead of O(diameter);
- iterate until a round changes nothing.

The driver-side loop per round is one count() (the convergence
check) and a localCheckpoint() to truncate lineage — no data is ever
collected. At web scale the same loop runs with
``spark.sparkContext.setCheckpointDir`` + ``checkpoint()`` so each
round's shuffle output is the recovery point; the edge table is the
LSH pair list (tiny relative to the corpus), so every join here is
orders of magnitude smaller than the extraction scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tracked_local_checkpoint(df: DataFrame):
    """localCheckpoint + the set of block-manager RDD ids it created,
    so the caller can free exactly those blocks later (ADVICE r2:
    without this, every round's checkpoint blocks live until the
    session dies — linear executor-storage growth on slow-converging
    graphs). Only ids that appear across THIS call are tracked — other
    persisted RDDs in the session are never touched."""
    sc = df.sparkSession.sparkContext
    jmap = sc._jsc.getPersistentRDDs()
    before = {int(k) for k in jmap.keySet()}
    out = df.localCheckpoint()
    jmap = sc._jsc.getPersistentRDDs()
    created = {int(k) for k in jmap.keySet()} - before
    return out, created


def _unpersist_ids(df: DataFrame, ids) -> None:
    sc = df.sparkSession.sparkContext
    jmap = sc._jsc.getPersistentRDDs()
    for rid in ids:
        jrdd = jmap.get(rid) if hasattr(jmap, "get") else None
        if jrdd is not None:
            jrdd.unpersist(False)


class _CheckpointHandle:
    """Release handle for the FINAL round's checkpoint blocks, which
    back the returned labels frame and therefore cannot be freed inside
    resolve_clusters itself. Exposed as ``_sax_persisted`` (the same
    convention as lines.py/dedup.py) so callers free it after
    materializing — round-5 review: the blocks outlived the job
    otherwise."""

    def __init__(self, df: DataFrame, ids):
        self._df, self._ids = df, ids

    def unpersist(self, blocking: bool = False):  # noqa: ARG002
        _unpersist_ids(self._df, self._ids)


def resolve_clusters(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(doc_id, rep_id, keep) for every node in ``pairs``: rep_id is the
    minimum id of the node's connected component; keep is true for the
    one representative per cluster. Raises if not converged within
    ``max_iter`` rounds (25 pointer-jumped rounds covers components of
    diameter ~2^25 — unreachable in practice)."""
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst")).union(
        pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    )
    labels, labels_blocks = _tracked_local_checkpoint(
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("rep", F.col("id"))
    )
    edges, _edges_blocks = _tracked_local_checkpoint(edges)

    for _ in range(max_iter):
        # neighbor-min: each node receives its neighbors' current labels
        msgs = edges.join(labels, edges.src == labels.id).select(
            F.col("dst").alias("id"), F.col("rep")
        )
        new = (
            labels.select("id", "rep")
            .union(msgs)
            .groupBy("id")
            .agg(F.min("rep").alias("rep"))
        )
        # pointer jumping: rep := rep's rep (reps are node ids, so the
        # self-join always matches)
        j = new.select(F.col("id").alias("jid"), F.col("rep").alias("jrep"))
        new, new_blocks = _tracked_local_checkpoint(
            new.join(j, new.rep == j.jid).select(new.id, F.col("jrep").alias("rep"))
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.rep") != F.col("o.rep"))
            .count()
        )
        # the convergence count above was the last reader of the
        # previous round's checkpoint — free its blocks now (ADVICE r2)
        _unpersist_ids(new, labels_blocks)
        labels, labels_blocks = new, new_blocks
        if changed == 0:
            _unpersist_ids(edges, _edges_blocks)
            out = labels.select(
                F.col("id").alias("doc_id"),
                F.col("rep").alias("rep_id"),
                (F.col("id") == F.col("rep")).alias("keep"),
            )
            out._sax_persisted = _CheckpointHandle(labels, labels_blocks)
            return out
    raise RuntimeError(f"resolve_clusters did not converge in {max_iter} rounds")
