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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .facts import known_facts
from .kb.model import KB
from .linking import literal_edges


def graph_metric_scores(resolved: DataFrame, kb: KB) -> DataFrame:
    """capacity = min(in,out), degree = in+out over the doc graph
    (literal edges + known-fact edges) — CapacityBasedRating /
    DegreeBasedRating re-expressed as per-doc edge aggregates."""
    lit_e = literal_edges(resolved).select("doc_id", "src", "dst")
    fact_e = known_facts(resolved, kb).select(
        "doc_id", F.col("s").alias("src"), F.col("o").alias("dst")
    )
    edges = lit_e.unionByName(fact_e)
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


def relevance_scores(
    resolved: DataFrame,
    kb: KB,
    docs_with_id: DataFrame,
    metrics: list[str] | None = None,
) -> DataFrame:
    """(doc_id, subject, <metric columns>, score) — metrics min-max
    normalized per doc, fused by product. Default = capacity (the
    reference's production config)."""
    metrics = metrics or ["capacity"]
    wide = graph_metric_scores(resolved, kb)
    if {"position", "tf"} & set(metrics):
        wide = wide.join(positional_scores(resolved, docs_with_id), ["doc_id", "subject"], "full")
    if "idf" in metrics:
        wide = wide.join(idf_scores(resolved), "subject", "left")
    wide = wide.fillna(0.0)

    # min-max normalize each metric within a document (DoubleMatrix.normalize)
    for m in metrics:
        w = Window.partitionBy("doc_id")
        rng = F.max(m).over(w) - F.min(m).over(w)
        wide = wide.withColumn(
            m, F.when(rng > 0, (F.col(m) - F.min(m).over(w)) / rng).otherwise(F.lit(1.0))
        )

    score = reduce(lambda a, b: a * b, [F.col(m) for m in metrics])
    return wide.withColumn("score", score)
