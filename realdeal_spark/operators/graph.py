"""Distributed connected components — duplicate-cluster closure.

The dedup family (operators.dedup) emits near-duplicate PAIRS; a
curation pipeline needs CLUSTERS — the transitive closure of the pair
graph — so each duplicate group keeps exactly one representative
(pairs alone under-delete: a~b and b~c does not emit a~c).

Implementation is the alternating large-star / small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14), expressed as DataFrame equi-joins:

- large-star: every node ``v`` in ``N(u)`` with ``v > u`` re-attaches
  to ``m(u) = min(N(u) ∪ {u})``;
- small-star: every ``v ≤ u`` (and ``u`` itself) attaches to ``m(u)``.

Both steps are groupBy-min + equi-join — no ``collect_list`` of
neighborhoods, so a hub node with 10^8 neighbors never materializes a
single giant row; skew on the hub key is ordinary aggregation skew
(partial-agg reduces it map-side).  Converges in O(log n) rounds
(vs O(diameter) for naive label propagation — a 10^6-long chain of
near-dup shingles finishes in ~20 rounds, not 10^6).

Per round the edge set is ``localCheckpoint``-ed: iterative
self-joins otherwise stack an unbounded lineage that re-executes
from round 0 and overflows the planner at scale.  The convergence
check is one small count per round (driver-side by necessity —
it gates the loop).

Reference analogue: none — the reference dedups by primary key only
(mongo upsert in pipelines.py:24-31); cluster closure is part of the
driver-mandated training-data dedup family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Return ``(id, component)`` for every node of ``edges``, where
    ``component`` is the smallest node id in its connected component.

    ``edges`` is undirected (each pair listed once in either order);
    self-loops and duplicate edges are tolerated.  Node ids may be any
    orderable atomic type (long, string).

    Raises ``RuntimeError`` if not converged within ``max_iter``
    rounds (each round at least halves tree heights; 25 rounds covers
    components of ~2^25 chained nodes).
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select("a").union(e.select("b")).distinct()
        .select(F.col("a").alias("id"))
        .localCheckpoint(eager=True)
    )

    n_prev = e.count()
    for _ in range(max_iter):
        e2 = _small_star(_large_star(e)).localCheckpoint(eager=True)
        # stability check on distinct sets: equal cardinality plus
        # e2 ⊆ e ⇒ equal — one count + one short-circuit anti scan
        # per round, both over checkpointed inputs
        n2 = e2.count()
        changed = n2 != n_prev or e2.exceptAll(e).limit(1).count() > 0
        old = e
        e, n_prev = e2, n2
        if not changed:
            break
        old.unpersist()
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")

    # e is now a star forest: (child, root).  Roots have no outgoing
    # edge — pick them up from the node set with component = self.
    comp = e.groupBy(F.col("a").alias("id")).agg(
        F.min("b").alias("component")
    )
    return (
        nodes.join(comp, "id", "left")
        .select(
            "id", F.coalesce("component", F.col("id")).alias("component")
        )
    )


def _sym(e: DataFrame) -> DataFrame:
    """Symmetric neighbor list (u, v): each edge in both directions."""
    return e.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
        e.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )


def _mins(nb: DataFrame) -> DataFrame:
    """m(u) = min over N(u) ∪ {u} — one partial-aggregated groupBy."""
    return (
        nb.groupBy("u")
        .agg(F.min("v").alias("_mv"))
        .select("u", F.least("u", "_mv").alias("m"))
    )


def _large_star(e: DataFrame) -> DataFrame:
    nb = _sym(e)
    out = (
        nb.join(_mins(nb), "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("a"), F.col("m").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    return out


def _small_star(e: DataFrame) -> DataFrame:
    nb = _sym(e)
    withm = nb.join(_mins(nb), "u")
    attach_nbrs = withm.where(F.col("v") <= F.col("u")).select(
        F.col("v").alias("a"), F.col("m").alias("b")
    )
    attach_self = withm.select(F.col("u").alias("a"), F.col("m").alias("b"))
    return (
        attach_nbrs.union(attach_self)
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def duplicate_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Cluster near-duplicate PAIRS into groups: returns
    ``(id, cluster_id, cluster_size)`` for every id that appears in at
    least one pair, where ``cluster_id`` is the smallest id of the
    group (the canonical representative to KEEP; delete the rest).
    """
    comp = connected_components(pairs, id_a, id_b)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return comp.join(sizes, "component").select(
        F.col("id"),
        F.col("component").alias("cluster_id"),
        "cluster_size",
    )


def keep_best_representatives(
    clusters: DataFrame,
    scores: DataFrame,
    id_col: str = "id",
    score_col: str = "quality",
) -> DataFrame:
    """Pick each cluster's representative by SCORE, not by id.

    ``clusters`` is :func:`duplicate_clusters` output
    (id, cluster_id, cluster_size); ``scores`` maps ``id_col`` →
    ``score_col``.  Returns one row per cluster:
    (cluster_id, keep_id, cluster_size, <score_col>), the member with
    the highest score (id ascending breaks ties deterministically).
    Curation keeps the best copy of a duplicate group — smallest-id
    representatives are only a stable label, not a quality choice.

    One equi-join plus one per-cluster window; clusters are near-dup
    groups (tiny), so the window partitions are inherently small —
    no skew concern."""
    from pyspark.sql import Window

    j = clusters.join(scores, on=id_col)
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    return (
        j.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            "cluster_id",
            F.col(id_col).alias("keep_id"),
            "cluster_size",
            score_col,
        )
    )
