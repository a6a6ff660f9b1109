"""Triple emission — SURVEY.md §2 B25, B27.

Reference ``postprocessor/RDFSerializer.java:61-113`` writes TriG with
three named graphs; our output is one flat DataFrame
``(doc_id, graph, subj, pred, obj)`` with graph ∈ {recognized,
predicted, known} — at scale written to an Iceberg/parquet table
partitioned by ``graph`` (per north_rule "materialize (subj,pred,obj)
triples to partitioned Iceberg output").

recognized: (subject_uri, property_uri, surface_literal) per resolved
span + (subject_uri, rdf:type, type_uri) for the subject's KB types
(the reference attaches types with probability 1.0 and the serializer
emits those, RDFSerializer.java:76-79).
known: KB relation edges of the doc graph (see facts.known_facts).
predicted: recommended facts (B24), when enabled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .kb.model import KB, RDF_TYPE

TRIPLES_COLS = ["doc_id", "graph", "subj", "pred", "obj"]


def _uri(resources: DataFrame, id_col: str, out: str) -> DataFrame:
    return resources.select(F.col("id").alias(id_col), F.col("uri").alias(out))


def recognized_triples(
    resolved: DataFrame, types: DataFrame, kb: KB, assume_distinct: bool = False
) -> DataFrame:
    """(subj, prop, surface) + (subj, rdf:type, type).

    ``assume_distinct=True`` when the caller already deduplicated
    (doc_id, subject, prop_id, surface) — the pipeline does ONE such
    dedup and feeds every output branch from it, so the 10^?-row
    resolved table shuffles once, not once per branch."""
    r = kb.resources
    base = resolved.select("doc_id", "subject", "prop_id", "surface")
    if not assume_distinct:
        base = base.distinct()
    labels = (
        base
        .join(_uri(r, "subject", "subj"), "subject")
        .join(_uri(r, "prop_id", "pred"), "prop_id")
        .select("doc_id", F.lit("recognized").alias("graph"), "subj", "pred", F.col("surface").alias("obj"))
    )
    doc_subjects = base.select("doc_id", "subject") if assume_distinct else resolved.select("doc_id", "subject")
    type_rows = (
        doc_subjects.distinct()
        .join(types, "subject")
        .join(_uri(r, "subject", "subj"), "subject")
        .join(_uri(r, "type_id", "obj"), "type_id")
        .select(
            "doc_id",
            F.lit("recognized").alias("graph"),
            "subj",
            F.lit(RDF_TYPE).alias("pred"),
            "obj",
        )
    )
    # dedup happens in id space BEFORE uri decode (the decode joins are
    # injective and the two branches are disjoint by construction:
    # datatype properties are never rdf:type) — a distinct() here would
    # re-shuffle the full decoded-string rows, ~10× the bytes
    return labels.unionByName(type_rows)


def known_triples(known: DataFrame, kb: KB) -> DataFrame:
    r = kb.resources
    return (
        known.distinct()  # id-space dedup; decode is injective
        .join(_uri(r, "s", "subj"), "s")
        .join(_uri(r, "p", "pred"), "p")
        .join(_uri(r, "o", "obj"), "o")
        .select("doc_id", F.lit("known").alias("graph"), "subj", "pred", "obj")
    )


def predicted_triples(predicted: DataFrame, kb: KB) -> DataFrame:
    r = kb.resources
    return (
        predicted.select("doc_id", "s", "p", "o").distinct()  # id space
        .join(_uri(r, "s", "subj"), "s")
        .join(_uri(r, "p", "pred"), "p")
        .join(_uri(r, "o", "obj"), "o")
        .select("doc_id", F.lit("predicted").alias("graph"), "subj", "pred", "obj")
    )


def ranked_subjects(
    resolved: DataFrame, scores: DataFrame, kb: KB, ordered: bool = True
) -> DataFrame:
    """B27 (postprocessor/ListSerializer.java:39-79): subjects ordered by
    relevance score desc → ranked URI list per document.

    ``ordered=False`` skips the terminal global sort (a full
    range-partition shuffle): callers that re-rank with their own
    window — the ScoobieExperiment replay ranks inside
    calc_prec_rec_f1 — would pay for an ordering the next shuffle
    destroys."""
    out = (
        resolved.select("doc_id", "subject")
        .distinct()
        .join(scores, ["doc_id", "subject"])
        .join(_uri(kb.resources, "subject", "uri"), "subject")
    )
    if ordered:
        out = out.orderBy(F.col("doc_id"), F.col("score").desc(), F.col("uri"))
    return out.select("doc_id", "uri", "score")


def rdfa_serialize(docs_with_id: DataFrame, resolved: DataFrame, kb: KB) -> DataFrame:
    """B26 (postprocessor/RDFaSerializer.java:50-159): wrap the original
    text in XHTML+RDFa spans per resolved mention → (doc_id, rdfa).

    One join to attach per-doc mention arrays (collect_list of structs),
    then an Arrow pass builds the markup string. B10 removes CONTAINED
    spans but partially-overlapping spans can survive it; well-formed
    markup cannot represent a partial overlap, so the builder keeps the
    earlier span and drops the overlapping one (greedy left-to-right),
    the same choice every inline-annotation serializer makes."""
    from pyspark.sql import functions as _F

    spans = (
        resolved.join(_uri(kb.resources, "subject", "subj_uri"), "subject")
        .join(_uri(kb.resources, "prop_id", "prop_uri"), "prop_id")
        .groupBy("doc_id")
        .agg(
            _F.sort_array(
                _F.collect_list(_F.struct("begin", "end", "subj_uri", "prop_uri"))
            ).alias("spans")
        )
    )
    joined = docs_with_id.select("doc_id", "content").join(spans, "doc_id", "left")

    def build(batches):
        import html

        import pandas as pd

        for pdf in batches:
            out = []
            for text, sp in zip(pdf["content"].values, pdf["spans"].values):
                if sp is None or (hasattr(sp, "__len__") and len(sp) == 0):
                    out.append(html.escape(text))
                    continue
                parts, pos = [], 0
                last_end = -1
                for row in sp:
                    b, e = int(row["begin"]), int(row["end"])
                    # overlapping span (same-range duplicate or partial
                    # overlap): keep the earlier one, drop this
                    if b < last_end:
                        continue
                    parts.append(html.escape(text[pos:b]))
                    about = html.escape(row["subj_uri"], quote=True)
                    prop = html.escape(row["prop_uri"], quote=True)
                    parts.append(
                        f'<span about="{about}" property="{prop}">'
                        f"{html.escape(text[b:e])}</span>"
                    )
                    pos = e
                    last_end = e
                parts.append(html.escape(text[pos:]))
                out.append("".join(parts))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "rdfa": out})

    return joined.mapInPandas(build, "doc_id long, rdfa string")


def write_triples(triples: DataFrame, path: str) -> None:
    """Partitioned sink (Iceberg writeTo at cluster scale; parquet here)."""
    triples.write.mode("overwrite").partitionBy("graph").parquet(path)
