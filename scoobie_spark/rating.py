"""Relevance rating — SURVEY.md §2 B23.

Reference (``transducer/RelevanceRating.java:52-86`` + metrics in
``transducer/model/rating/*.java``): score each resolved subject with N
metrics, min-max normalize each metric per document
(DoubleMatrix.normalize:380-399), fuse selected columns by product
(fuseRatings:844-867). Default production config uses capacity only
(Scoobie.java:102-105).

Spark re-expression: one long scores DataFrame
``(doc_id, subject, metric, score)``; normalization is a window over
(doc_id, metric); fusion is a pivot + product. Graph metrics come from
edge aggregates, positional/tf metrics from the mentions table, idf
from a corpus-level countDistinct.
"""

from __future__ import annotations

from functools import reduce
from itertools import combinations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .facts import known_facts
from .kb.model import KB
from .linking import literal_edges

# the reference experiment's metric array, in index order
# (RelevanceRatingExperiment.java:188-200)
ALL_METRICS = [
    "authority", "hub", "pagerank", "degree", "capacity",
    "random", "position", "tf", "idf",
]


def _doc_edges(resolved: DataFrame, kb: KB) -> DataFrame:
    """The per-doc rating graph (literal edges + known-fact edges) —
    shared by the degree/capacity aggregates and the HITS/PageRank
    pass so metric_table builds the KB join once, not per family."""
    lit_e = literal_edges(resolved).select("doc_id", "src", "dst")
    fact_e = known_facts(resolved, kb).select(
        "doc_id", F.col("s").alias("src"), F.col("o").alias("dst")
    )
    return lit_e.unionByName(fact_e)


def graph_metric_scores(
    resolved: DataFrame, kb: KB, edges: DataFrame | None = None
) -> DataFrame:
    """capacity = min(in,out), degree = in+out over the doc graph
    (literal edges + known-fact edges) — CapacityBasedRating /
    DegreeBasedRating re-expressed as per-doc edge aggregates."""
    if edges is None:
        edges = _doc_edges(resolved, kb)
    in_d = edges.groupBy("doc_id", F.col("dst").alias("subject")).agg(
        F.count("*").alias("in_deg")
    )
    out_d = edges.groupBy("doc_id", F.col("src").alias("subject")).agg(
        F.count("*").alias("out_deg")
    )
    deg = (
        in_d.join(out_d, ["doc_id", "subject"], "full")
        .fillna(0)
        .filter(F.col("subject") >= 0)
    )
    return deg.select(
        "doc_id",
        "subject",
        F.least("in_deg", "out_deg").cast("double").alias("capacity"),
        (F.col("in_deg") + F.col("out_deg")).cast("double").alias("degree"),
    )


def positional_scores(resolved: DataFrame, docs_with_id: DataFrame) -> DataFrame:
    """position = doc_length − first occurrence start
    (PositionBasedRating.java); tf = mention char mass / doc length
    (TermFrequencyBasedRating.java uses token counts; char mass is the
    equivalent signal without re-shipping the tokens table)."""
    lens = docs_with_id.select("doc_id", F.length("content").alias("doc_len"))
    agg = resolved.groupBy("doc_id", "subject").agg(
        F.min("begin").alias("first_begin"),
        F.sum(F.col("end") - F.col("begin")).alias("char_mass"),
    )
    return agg.join(lens, "doc_id").select(
        "doc_id",
        "subject",
        (F.col("doc_len") - F.col("first_begin")).cast("double").alias("position"),
        (F.col("char_mass") / F.col("doc_len")).alias("tf"),
    )


def idf_scores(resolved: DataFrame) -> DataFrame:
    """idf = log(N / (df+1)) per subject over the corpus
    (InverseDocumentFrequencyBasedRating.java:42-90, Lucene index →
    countDistinct(doc))."""
    n_docs = resolved.select("doc_id").distinct().count()
    return (
        resolved.groupBy("subject")
        .agg(F.countDistinct("doc_id").alias("df"))
        .select(
            "subject",
            F.log(F.lit(float(n_docs)) / (F.col("df") + 1)).alias("idf"),
        )
    )


_RANK_SCHEMA = "doc_id long, subject long, authority double, hub double, pagerank double"


def _rank_one_doc(pdf: pd.DataFrame) -> pd.DataFrame:
    """HITS (10 L2-normalized iterations) + PageRank (alpha=0.1, like
    PageRankBasedRating.java:52-60) over one document's graph. A doc
    graph is tens of nodes — per-doc numpy inside the Arrow pass, same
    policy as linking._resolve_one."""
    import numpy as np

    nodes = sorted(set(pdf["src"].tolist()) | set(pdf["dst"].tolist()))
    idx = {n: i for i, n in enumerate(nodes)}
    adj = np.zeros((len(nodes), len(nodes)))
    for a, b in zip(pdf["src"].values, pdf["dst"].values):
        adj[idx[a], idx[b]] = 1.0
    h = np.ones(len(nodes))
    a_s = np.ones(len(nodes))
    for _ in range(10):
        a_s = adj.T @ h
        a_s /= max(np.linalg.norm(a_s), 1e-12)
        h = adj @ a_s
        h /= max(np.linalg.norm(h), 1e-12)
    outs = np.maximum(adj.sum(axis=1), 1.0)
    r = np.ones(len(nodes))
    for _ in range(15):
        r = 0.1 + 0.9 * (adj.T @ (r / outs))
    subj = [n for n in nodes if n >= 0]
    doc = pdf["doc_id"].iloc[0]
    return pd.DataFrame(
        {
            "doc_id": [doc] * len(subj),
            "subject": subj,
            "authority": [a_s[idx[n]] for n in subj],
            "hub": [h[idx[n]] for n in subj],
            "pagerank": [r[idx[n]] for n in subj],
        }
    )


def graph_rank_scores(
    resolved: DataFrame, kb: KB, edges: DataFrame | None = None
) -> DataFrame:
    """authority / hub / pagerank per (doc, subject) over the doc graph
    (AuthorityBasedRating / HubBasedRating / PageRankBasedRating).

    Runs through :func:`grouped.grouped_apply` — one doc_id shuffle and
    per-BATCH Arrow transfer — not ``groupBy().applyInPandas``, whose
    per-tiny-group Arrow round trip dominates at millions of small doc
    graphs (grouped.py header: 26s for 5k two-row groups)."""
    from .grouped import grouped_apply

    if edges is None:
        edges = _doc_edges(resolved, kb)
    return grouped_apply(edges, "doc_id", _rank_one_doc, _RANK_SCHEMA)


def random_score_col() -> F.Column:
    """RandomRating.java draws ``new Random().nextDouble()`` per subject;
    the deterministic twin maps xxhash64(doc, subject) into [0, 1) so
    sweeps are reproducible run-to-run (non-parity flag, same spirit as
    linking's random resolver)."""
    return (
        F.xxhash64(F.col("doc_id"), F.col("subject")).cast("double")
        / F.lit(float(2**64))
        + F.lit(0.5)
    )


def metric_table(
    resolved: DataFrame,
    kb: KB,
    docs_with_id: DataFrame,
    metrics: list[str],
) -> DataFrame:
    """Wide unnormalized (doc_id, subject, <metric...>) with exactly the
    requested metric columns materialized.

    The entity list is the spine (every reference RatingMetric.getRating
    reads scores at the entity list only, e.g.
    PageRankBasedRating.java:44-60); each metric FAMILY joins on only
    when requested — metrics=["tf"] no longer pays the KB edge joins
    and degree aggregation just to drop the columns. The doc-graph edge
    union is built once and staged when both the degree family and the
    rank family need it (it embeds two KB joins)."""
    want = set(metrics)
    wide = resolved.select("doc_id", "subject").distinct()
    need_deg = bool({"capacity", "degree"} & want)
    need_rank = bool({"authority", "hub", "pagerank"} & want)
    edges = _doc_edges(resolved, kb) if (need_deg or need_rank) else None
    if need_deg and need_rank:
        edges = edges.localCheckpoint(eager=False)
    if need_deg:
        wide = wide.join(
            graph_metric_scores(resolved, kb, edges), ["doc_id", "subject"], "left"
        )
    if {"position", "tf"} & want:
        wide = wide.join(
            positional_scores(resolved, docs_with_id), ["doc_id", "subject"], "left"
        )
    if need_rank:
        wide = wide.join(
            graph_rank_scores(resolved, kb, edges), ["doc_id", "subject"], "left"
        )
    if "idf" in want:
        wide = wide.join(idf_scores(resolved), "subject", "left")
    if "random" in want:
        wide = wide.withColumn("random", random_score_col())
    return wide.fillna(0.0)


def normalize_per_doc(wide: DataFrame, metrics: list[str]) -> DataFrame:
    """Min-max normalize each metric within a document
    (DoubleMatrix.normalize:380-399); a constant column normalizes
    to 1.0."""
    for m in metrics:
        w = Window.partitionBy("doc_id")
        rng = F.max(m).over(w) - F.min(m).over(w)
        wide = wide.withColumn(
            m, F.when(rng > 0, (F.col(m) - F.min(m).over(w)) / rng).otherwise(F.lit(1.0))
        )
    return wide


def relevance_scores(
    resolved: DataFrame,
    kb: KB,
    docs_with_id: DataFrame,
    metrics: list[str] | None = None,
) -> DataFrame:
    """(doc_id, subject, <metric columns>, score) — metrics min-max
    normalized per doc, fused by product (fuseRatings:844-867). Default
    = capacity (the reference's production config, Scoobie.java:102-105).
    Full metric set = :data:`ALL_METRICS`."""
    metrics = metrics or ["capacity"]
    wide = normalize_per_doc(metric_table(resolved, kb, docs_with_id, metrics), metrics)
    score = reduce(lambda a, b: a * b, [F.col(m) for m in metrics])
    return wide.withColumn("score", score)


def default_sweep_subsets(metrics: list[str] | None = None) -> list[tuple[str, ...]]:
    """All size>1 subsets of the metric list — the reference experiment
    enumerates the 2^9 bitmasks and keeps those with more than one bit
    (RelevanceRatingExperiment.java:168-185)."""
    metrics = metrics or ALL_METRICS
    return [
        c for k in range(2, len(metrics) + 1) for c in combinations(metrics, k)
    ]


def fusion_sweep(
    resolved: DataFrame,
    kb: KB,
    docs_with_id: DataFrame,
    subsets: list[tuple[str, ...]] | None = None,
) -> DataFrame:
    """The RelevanceRatingExperiment fusion sweep: every metric computed
    and normalized ONCE, then every subset's product score in one
    aggregation → (subset_id, subset, doc_id, subject, score).

    Physical plan: wide→long unpivot (stack), broadcast join against the
    (subset_id, metric) membership table, zero-aware log-sum product
    aggregate (exact for the non-negative normalized scores). The sweep
    costs one extra shuffle regardless of subset count — the reference
    recomputes each fused matrix per subset."""
    subsets = subsets or default_sweep_subsets()
    metrics = sorted({m for s in subsets for m in s})
    wide = normalize_per_doc(metric_table(resolved, kb, docs_with_id, metrics), metrics)
    stack = F.expr(
        "stack({n}, {args}) as (metric, value)".format(
            n=len(metrics),
            args=", ".join(f"'{m}', {m}" for m in metrics),
        )
    )
    long = wide.select("doc_id", "subject", stack)
    spark = resolved.sparkSession
    members = spark.createDataFrame(
        [(i, ",".join(s), m) for i, s in enumerate(subsets) for m in s],
        "subset_id int, subset string, metric string",
    )
    return (
        long.join(F.broadcast(members), "metric")
        .groupBy("subset_id", "subset", "doc_id", "subject")
        .agg(
            F.when(
                F.max((F.col("value") == 0).cast("int")) == 1, F.lit(0.0)
            )
            .otherwise(F.exp(F.sum(F.log(F.when(F.col("value") > 0, F.col("value")).otherwise(1.0)))))
            .alias("score")
        )
    )
