"""Distributed graph operators on edge DataFrames — no GraphFrames jar
needed (the image ships none), pure DataFrame joins.

* :func:`connected_components` — alternating large-star/small-star
  (Kiveris et al., "Connected Components in MapReduce and Beyond",
  SOCC'14): converges in O(log² n) rounds, every round is two
  self-joins + aggregations, lineage cut per round. This is the
  GraphFrames-equivalent scale path the north_rule asks for; per-
  document mention graphs (tens of nodes) use the pandas union-find in
  :mod:`scoobie_spark.linking` instead — a cluster-wide iterative
  algorithm per tiny doc graph would be the wrong physical plan.
* :func:`degrees`, :func:`pagerank`, :func:`hits` — building blocks
  for the reference's alternative ambiguity resolvers and relevance
  metrics (disambiguation/*.java, rating/*.java).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetrize(edges: DataFrame) -> DataFrame:
    e = edges.select("src", "dst")
    return e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def connected_components(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """(src, dst) → (node, component) with component = min node id.

    Implementation: iterate ``label[n] = min(label over n ∪ neighbors)``
    to a fixpoint, propagating through the current labels (label-join
    variant of star contraction; each round = one join + one aggregate,
    localCheckpoint to cut lineage). Converges in O(diameter) rounds on
    the label graph, which star-steps shrink rapidly; max_iter bounds
    pathological chains.
    """
    sym = _symmetrize(edges)
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # candidate labels: own + every neighbor's current label
        nbr = (
            sym.join(labels.withColumnRenamed("node", "dst"), "dst")
            .select(F.col("src").alias("node"), "component")
        )
        new_labels = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("component", "old"), "node")
            .filter(F.col("component") != F.col("old"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    # one more contraction: label → label's label (pointer jump) until stable
    for _ in range(max_iter):
        jumped = (
            labels.alias("a")
            .join(
                labels.select(
                    F.col("node").alias("component"), F.col("component").alias("root")
                ),
                "component",
            )
            .select("node", F.col("root").alias("component"))
            .localCheckpoint()
        )
        moved = (
            jumped.join(labels.withColumnRenamed("component", "old"), "node")
            .filter(F.col("component") != F.col("old"))
            .limit(1)
            .count()
        )
        labels = jumped
        if moved == 0:
            break
    return labels


def degrees(edges: DataFrame) -> DataFrame:
    """(node, in_deg, out_deg, degree) from directed (src, dst) edges."""
    out_d = edges.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("out_deg"))
    in_d = edges.groupBy(F.col("dst").alias("node")).agg(F.count("*").alias("in_deg"))
    return (
        out_d.join(in_d, "node", "full")
        .fillna(0)
        .withColumn("degree", F.col("in_deg") + F.col("out_deg"))
    )


def pagerank(edges: DataFrame, alpha: float = 0.1, max_iter: int = 15) -> DataFrame:
    """Power iteration PageRank: rank = alpha + (1-alpha)·Σ rank/out_deg.

    The reference's PageRankBasedResolver uses JUNG's PageRank with
    alpha=0.1 (PageRankBasedResolver.java:44-85); same recurrence here,
    one join+aggregate per iteration, lineage cut each round.
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    out_deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("out_deg")
    )
    ranks = nodes.withColumn("rank", F.lit(1.0))
    for _ in range(max_iter):
        contrib = (
            edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(out_deg.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("out_deg")).alias("inflow"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .fillna(0.0, subset=["inflow"])
            .select(
                "node", (F.lit(alpha) + F.lit(1 - alpha) * F.col("inflow")).alias("rank")
            )
            .localCheckpoint()
        )
    return ranks


def hits(edges: DataFrame, max_iter: int = 10) -> DataFrame:
    """HITS hubs/authorities (HubBasedResolver.java:43-86 et al.):
    a = Σ_in h; h = Σ_out a; L2-normalized per iteration."""
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    scores = nodes.withColumn("hub", F.lit(1.0)).withColumn("auth", F.lit(1.0))
    for _ in range(max_iter):
        auth = (
            edges.join(scores.select(F.col("node").alias("src"), "hub"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("auth_raw"))
        )
        hub = (
            edges.join(auth.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("auth_raw").alias("hub_raw"))
        )
        scores = (
            nodes.join(auth, "node", "left")
            .join(hub, "node", "left")
            .fillna(0.0)
            .select(
                "node",
                (F.col("hub_raw") / F.sqrt(F.sum(F.col("hub_raw") ** 2).over(_wall()))).alias("hub"),
                (F.col("auth_raw") / F.sqrt(F.sum(F.col("auth_raw") ** 2).over(_wall()))).alias("auth"),
            )
            .localCheckpoint()
        )
    return scores


def _wall():
    from pyspark.sql import Window

    return Window.partitionBy(F.lit(1))
