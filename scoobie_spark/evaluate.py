"""Evaluation harness — SURVEY.md §3 E3 / §5.

Reference protocol (``workflow/Evaluator.java:39-45`` + per-transducer
``compare`` methods): per-document precision/recall of found vs
ground-truth sets, and MAP (mean average precision) for ranked
relevance output (``DoubleMatrix.averagePrecision``,
DoubleMatrix.java:123-157). DataFrame form: ground truth is a table,
P/R is two semi-join counts, AP is a window over the ranked list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def set_precision_recall(
    found: DataFrame, truth: DataFrame, keys: list[str]
) -> dict[str, float]:
    """Global set P/R over ``keys`` (e.g. spotting: [doc, prop, literal];
    instances: [doc, subject_uri])."""
    f = found.select(*keys).distinct().cache()
    t = truth.select(*keys).distinct().cache()
    tp = f.join(t, keys, "left_semi").count()
    nf, nt = f.count(), t.count()
    f.unpersist()
    t.unpersist()
    return {
        "precision": tp / nf if nf else 1.0,
        "recall": tp / nt if nt else 1.0,
        "tp": tp,
        "found": nf,
        "truth": nt,
    }


def per_doc_precision_recall(
    found: DataFrame, truth: DataFrame, keys: list[str], doc_col: str = "doc_id"
) -> DataFrame:
    """Per-document P/R rows (the reference logs one line per doc)."""
    f = found.select(doc_col, *keys).distinct()
    t = truth.select(doc_col, *keys).distinct()
    tp = (
        f.join(t, [doc_col, *keys], "left_semi")
        .groupBy(doc_col)
        .agg(F.count("*").alias("tp"))
    )
    nf = f.groupBy(doc_col).agg(F.count("*").alias("n_found"))
    nt = t.groupBy(doc_col).agg(F.count("*").alias("n_truth"))
    return (
        nt.join(nf, doc_col, "full")
        .join(tp, doc_col, "left")
        .fillna(0)
        .select(
            doc_col,
            (F.col("tp") / F.greatest(F.col("n_found"), F.lit(1))).alias("precision"),
            (F.col("tp") / F.greatest(F.col("n_truth"), F.lit(1))).alias("recall"),
        )
    )


def mean_average_precision(
    ranked: DataFrame,
    truth: DataFrame,
    doc_col: str = "doc_id",
    item_col: str = "subject",
    score_col: str = "score",
) -> float:
    """MAP over per-doc ranked lists, reference-exact
    (DoubleMatrix.averagePrecision:123-157): AP = Σ precision@rank over
    RETRIEVED relevant items ÷ TOTAL relevant count — so a doc whose
    ranked list misses relevant items is penalized, and a doc
    retrieving none of its truth scores AP = 0 rather than vanishing
    from the mean."""
    t = truth.select(doc_col, item_col).distinct().withColumn("rel", F.lit(1))
    w = Window.partitionBy(doc_col).orderBy(F.col(score_col).desc(), F.col(item_col))
    scored = (
        ranked.join(t, [doc_col, item_col], "left")
        .fillna(0, subset=["rel"])
        .withColumn("rank", F.row_number().over(w))
        .withColumn(
            "cum_rel", F.sum("rel").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        .withColumn("p_at_k", F.col("cum_rel") / F.col("rank"))
    )
    hit_sum = (
        scored.filter(F.col("rel") == 1)
        .groupBy(doc_col)
        .agg(F.sum("p_at_k").alias("hit_sum"))
    )
    n_truth = t.groupBy(doc_col).agg(F.count("*").alias("n_rel"))
    ap = (
        n_truth.join(hit_sum, doc_col, "left")
        .fillna(0.0, subset=["hit_sum"])
        .select((F.col("hit_sum") / F.col("n_rel")).alias("ap"))
    )
    row = ap.agg(F.avg("ap").alias("map")).first()
    return float(row["map"]) if row["map"] is not None else 0.0


GRAPH_RESOLVERS = [
    "degree", "flow", "pagerank", "hub", "authority", "hits", "hits2", "random",
]


def resolver_pr(
    docs: DataFrame,
    kb,
    gt_uris: set[str],
    resolvers: list[str] | None = None,
    classifier=None,
) -> list[dict]:
    """Per-resolver P/R on the ambiguous mentions of a labeled corpus —
    the reference's resolver-comparison protocol
    (``EntityDisambiguation.compare:467-566``): ground truth is reduced
    to URIs that are actually ambiguous in the documents (spans whose
    literal maps to >1 candidate subject); each resolver's resolved
    subjects are intersected with that ambiguous set; precision =
    relevant/(relevant+not) over the distinct found URIs, recall =
    relevant/|GT∩ambiguous|. One dict per resolver, plus the
    missed/true/false URI sets the reference logs.

    ``classifier`` — a ``(model, clusters)`` pair as taken by
    :func:`linking.disambiguate_classification` — adds the
    classification resolver to the sweep. Driver-side set work is
    bounded by the corpus's ambiguity volume — same shape as the
    reference's in-memory compare loop; this is an evaluation harness
    for labeled fixtures, not a production stage.
    """
    from . import linking, textproc
    from .spotting import spot

    resolvers = list(resolvers or GRAPH_RESOLVERS)
    if classifier is not None and "classification" not in resolvers:
        resolvers.append("classification")
    if "classification" in resolvers and classifier is None:
        raise ValueError(
            "classification resolver needs classifier=(model, clusters)"
        )
    docs_id = docs if "doc_id" in docs.columns else textproc.with_doc_id(docs)
    kb_prefixes = [r[0] for r in kb.literals.select("prefix").distinct().collect()]
    mentions = spot(textproc.suffix_candidates(docs_id, kb_prefixes), kb.gazetteer())
    cand = linking.resolve_instances(mentions, kb).localCheckpoint()

    amb_subjects = {
        r["subject"]
        for r in (
            cand.groupBy("doc_id", "begin", "end", "lit_id")
            .agg(F.collect_set("subject").alias("subjects"))
            .filter(F.size("subjects") > 1)
            .select(F.explode("subjects").alias("subject"))
            .distinct()
            .collect()
        )
    }
    uri_of = {
        r["id"]: r["uri"]
        for r in kb.resources.filter(F.col("id").isin(*amb_subjects)).collect()
    } if amb_subjects else {}
    amb_uris = set(uri_of.values())
    gt = set(gt_uris) & amb_uris  # gtUris.retainAll(ambUris)

    out = []
    for resolver in resolvers:
        if resolver == "classification":
            model, clusters = classifier
            resolved = linking.disambiguate_classification(cand, kb, model, clusters)
        else:
            resolved = linking.disambiguate(cand, kb, resolver)
        found = {
            uri_of[r["subject"]]
            for r in resolved.select("subject").distinct().collect()
            if r["subject"] in amb_subjects
        }
        relevant = len(found & gt)
        out.append(
            {
                "resolver": resolver,
                "precision": relevant / max(len(found), 1),
                "recall": relevant / max(len(gt), 1),
                "n_gt": len(gt),
                "n_found": len(found),
                "missed": sorted(gt - found),
                "true": sorted(found & gt),
                "false": sorted(found - gt),
            }
        )
    return out
