"""Incremental clustering — fold a delta of match edges into an existing
cluster assignment without re-clustering the corpus.

The reference is a batch pipeline (re-run preprocessing end-to-end on a
new dump [R: SURVEY.md §3.2]); at the north_rule's 10^12-document scale a
daily crawl delta is ~0.1% of the corpus and a full re-cluster is the
single most expensive thing the engine could do. This module gives the
merge an exact algebraic form:

    cc(old_edges ∪ delta_edges)
      == cc(star(old_assign restricted to touched clusters) ∪ delta_edges)
         ∪ (old_assign restricted to untouched clusters)

where star(assign) = {(member, cluster_id)} reconstructs each old
cluster's connectivity at diameter 2 (cluster_id is itself a member —
CC2 canonicalizes to the min member id), and a cluster is "touched" iff
it contains an endpoint of a delta edge. Everything outside the touched
subgraph is provably unchanged, so the iterative CC runs on a frontier
proportional to |delta| × avg-cluster-size, not |corpus|.

Scale posture: the delta endpoint set is broadcast-small relative to the
corpus (AQE plans both semi/anti joins as broadcasts when it is); the
only shuffles over the full assignment table are the two semi/anti joins
on cluster_id, and those columns prune to exactly (mention_id,
cluster_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cluster import connected_components


def _endpoints(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").alias("mention_id"))
        .unionByName(edges.select(F.col("dst").alias("mention_id")))
        .distinct()
    )


def merge_components(
    old_assign: DataFrame,
    delta_edges: DataFrame,
    n_edges: int | None = None,
) -> DataFrame:
    """(mention_id, cluster_id) × EDGES(src, dst) -> (mention_id, cluster_id).

    Exactly equal (same rows, same canonical min-id cluster ids) to
    ``connected_components`` over the union of the old edge set and
    ``delta_edges`` — see module docstring for the identity; the
    equivalence is property-tested in tests/test_incremental.py and
    value-checked by the driver via the ``incr_cc_merge`` oracle.

    Endpoints of ``delta_edges`` absent from ``old_assign`` are new
    nodes; they join whichever component the delta connects them to.
    Isolated new nodes (no edge at all) are the caller's concern, same
    convention as ``cluster.assign_clusters``.

    ``n_edges`` (optional): an estimate/upper bound of the touched
    subgraph's edge count (|affected assignments| + |delta edges| is a
    safe bound from manifests), threaded into the CC frontier sizing —
    without it the frontier width falls back to the session's shuffle
    width (see cluster._plan_frontier_partitions).
    """
    old_assign = old_assign.select("mention_id", "cluster_id")
    touched = (
        old_assign.join(_endpoints(delta_edges), "mention_id", "semi")
        .select("cluster_id")
        .distinct()
    )
    affected = old_assign.join(touched, "cluster_id", "semi")
    star = affected.select(
        F.col("mention_id").alias("src"), F.col("cluster_id").alias("dst")
    )
    sub_edges = star.unionByName(delta_edges.select("src", "dst")).filter(
        F.col("src") != F.col("dst")
    )
    merged = connected_components(sub_edges, n_edges=n_edges)
    untouched = old_assign.join(touched, "cluster_id", "anti")
    return untouched.unionByName(merged)
