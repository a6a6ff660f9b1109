"""Instance resolution + connected-component disambiguation.

SURVEY.md §2 B15-B21. Reference flow per document
(``transducer/InstanceRecognition.java:60-169``,
``transducer/EntityDisambiguation.java:73-152``):

1. mentions → candidate subjects via the ``symbols`` fact table on
   (predicate, literal) — ONE corpus-wide shuffle join here instead of
   per-document ``(p,l) IN (...)`` SQL (PostgresKB.java:210-247).
2. per-document bipartite graph: literal nodes (−lit_id) ↔ candidate
   subject nodes, edges grouped by lowercased surface phrase
   (EntityDisambiguation.splitLiteralComponents:383-407).
3. weak connected components = "ambiguity sets".
4. doc graph enrichment from the KB: outgoing relations of unambiguous
   subjects (skipping rdf:type, traverseForward:437-465), incoming
   relations of ambiguous ones (traverseBackward:409-435) — re-expressed
   as two corpus-wide joins against ``relations`` instead of the
   reference's per-document rank-ordered growth loop (the loop exists
   only to bound per-doc graph size; the batch form touches each
   relation row once).
5. prune intermediate nodes with degree ≤ 1
   (EntityDisambiguation.pruneGraph:158-172).
6. degree resolver: per ambiguous component keep the max-degree subject
   (DegreeBasedResolver.java:41-79; reference tie-break is HashSet
   iteration order — we use min subject id for determinism), losers'
   annotations removed (EntityDisambiguation.resolve:179-218 keeps a
   single winner).

Physical notes: components are computed per document with a pandas
union-find (a document's mention graph is tens of nodes — a cluster-wide
iterative algorithm per doc would be absurd); the corpus-level
distributed CC operator lives in :mod:`scoobie_spark.graph` and is used
for cross-document URI canonicalization instead.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .kb.model import KB

CANDIDATES_SCHEMA = (
    "doc_id long, begin int, end int, lit_id long, prop_id long, "
    "belief double, literal string, surface string, subject long"
)


def resolve_instances(mentions: DataFrame, kb: KB) -> DataFrame:
    """B15: mention × symbols equi-join on (prop_id, lit_id) → candidate
    subjects (possibly several per mention — that's the ambiguity)."""
    sym = kb.symbols.select(
        F.col("p").alias("prop_id"), F.col("lit").alias("lit_id"), F.col("s").alias("subject")
    ).distinct()
    return mentions.join(sym, ["prop_id", "lit_id"])


def subject_types(candidates: DataFrame, kb: KB) -> DataFrame:
    """B15 tail: rdf:type objects of candidate subjects
    (PostgresKB.getRDFTypesForInstances:629-660) → (subject, type_id)."""
    type_id = kb.rdf_type_id
    if type_id is None:
        return candidates.sparkSession.createDataFrame([], "subject long, type_id long")
    types = kb.relations.filter(F.col("p") == type_id).select(
        F.col("s").alias("subject"), F.col("o").alias("type_id")
    )
    return candidates.select("subject").distinct().join(types, "subject")


_COMP_SCHEMA = "doc_id long, node long, component long"


def _components_per_doc(pdf: pd.DataFrame) -> pd.DataFrame:
    """Union-find over one document's bipartite edges (src<0 literal,
    dst>0 subject). Component label = min node id in the set."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        for n in (a, b):
            if n not in parent:
                parent[n] = n
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for src, dst in zip(pdf["src"].values, pdf["dst"].values):
        union(int(src), int(dst))

    nodes = list(parent)
    doc = pdf["doc_id"].iloc[0]
    return pd.DataFrame(
        {
            "doc_id": [doc] * len(nodes),
            "node": nodes,
            "component": [find(n) for n in nodes],
        }
    )


def literal_edges(candidates: DataFrame) -> DataFrame:
    """B16: bipartite edges. The reference connects each subject to every
    literal id sharing its *lowercased surface phrase*
    (populateGraphWithLiterals:73-99 via componentLiterals) — so two
    different literals with the same lowercased surface coalesce."""
    spans = candidates.select(
        "doc_id", F.lower("surface").alias("phrase"), "lit_id", "subject"
    ).distinct()
    phrase_lits = spans.select("doc_id", "phrase", "lit_id").distinct()
    phrase_subj = spans.select("doc_id", "phrase", "subject").distinct()
    # Literal node id = -(lit_id + 1): the reference uses -literalIndex
    # (EntityDisambiguation.java:231-241) which silently collides with
    # subject 0 when dictionary ids start at 0 — the +1 shift keeps the
    # bipartite node spaces disjoint for every id.
    return (
        phrase_subj.join(phrase_lits, ["doc_id", "phrase"])
        .select(
            "doc_id",
            (-(F.col("lit_id") + 1)).alias("src"),
            F.col("subject").alias("dst"),
        )
        .distinct()
    )


def components(edges: DataFrame) -> DataFrame:
    """B17: weak CC per document (JUNG WeakComponentClusterer,
    EntityDisambiguation.java:370-374) → (doc_id, node, component)."""
    return edges.groupBy("doc_id").applyInPandas(_components_per_doc, _COMP_SCHEMA)


def disambiguate(candidates: DataFrame, kb: KB) -> DataFrame:
    """B16-B21 composed: returns the resolved candidate table (losing
    subjects of ambiguous components removed)."""
    edges = literal_edges(candidates).cache()
    comps = components(edges).cache()

    subj_comp = comps.filter(F.col("node") >= 0).select(
        "doc_id", F.col("node").alias("subject"), "component"
    )
    comp_sizes = subj_comp.groupBy("doc_id", "component").agg(
        F.countDistinct("subject").alias("n_subjects")
    )
    subj_comp = subj_comp.join(comp_sizes, ["doc_id", "component"])

    ambiguous = subj_comp.filter(F.col("n_subjects") > 1)
    unambiguous = subj_comp.filter(F.col("n_subjects") == 1)

    # B18 — KB expansion, batched: forward from unambiguous subjects
    # (skip rdf:type), backward into ambiguous ones.
    type_id = kb.rdf_type_id
    rel = kb.relations if type_id is None else kb.relations.filter(F.col("p") != type_id)

    fwd = (
        unambiguous.select("doc_id", F.col("subject").alias("s"))
        .join(rel, "s")
        .select("doc_id", F.col("s").alias("src"), F.col("o").alias("dst"))
    )
    bwd = (
        ambiguous.select("doc_id", F.col("subject").alias("o"))
        .join(rel, "o")
        .select("doc_id", F.col("s").alias("src"), F.col("o").alias("dst"))
    )
    kb_edges = fwd.unionByName(bwd).distinct()

    # B19 — prune: non-candidate, non-literal endpoints need degree ≥ 2.
    all_subjects = subj_comp.select("doc_id", F.col("subject").alias("node")).distinct()
    endpoint_deg = (
        kb_edges.select("doc_id", F.col("src").alias("node"))
        .unionByName(kb_edges.select("doc_id", F.col("dst").alias("node")))
        .groupBy("doc_id", "node")
        .agg(F.count("*").alias("deg"))
    )
    intermediates_ok = (
        endpoint_deg.join(all_subjects, ["doc_id", "node"], "left_anti")
        .filter(F.col("deg") >= 2)
        .select("doc_id", "node")
    )
    keep_nodes = all_subjects.unionByName(intermediates_ok)

    kb_edges_pruned = (
        kb_edges.join(
            keep_nodes.withColumnRenamed("node", "src"), ["doc_id", "src"], "left_semi"
        ).join(keep_nodes.withColumnRenamed("node", "dst"), ["doc_id", "dst"], "left_semi")
    )

    # B20 — degree per subject over literal + pruned KB edges.
    graph_edges = edges.unionByName(kb_edges_pruned)
    degrees = (
        graph_edges.select("doc_id", F.col("src").alias("node"))
        .unionByName(graph_edges.select("doc_id", F.col("dst").alias("node")))
        .filter(F.col("node") >= 0)
        .groupBy("doc_id", "node")
        .agg(F.count("*").alias("degree"))
        .withColumnRenamed("node", "subject")
    )

    scored = ambiguous.join(degrees, ["doc_id", "subject"], "left").fillna(
        0, subset=["degree"]
    )
    w = Window.partitionBy("doc_id", "component").orderBy(
        F.col("degree").desc(), F.col("subject").asc()
    )
    winners = scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)

    keep_subjects = unambiguous.select("doc_id", "subject").unionByName(
        winners.select("doc_id", "subject")
    )

    # B21 — drop losers' annotations (Document.removeUnresolvedSubjects).
    return candidates.join(keep_subjects, ["doc_id", "subject"], "left_semi")


def canonical_uri_map(resources: DataFrame) -> DataFrame:
    """URI canonicalization (north_rule: sorted-key union-find): URIs that
    normalize identically (case-insensitive authority, http≡https, no
    trailing slash) map to the min resource id of their group. Single
    groupBy — the sorted-key trick makes multi-hop union-find unnecessary
    because the normalized key IS the component key."""
    norm = F.regexp_replace(
        F.regexp_replace(F.col("uri"), r"^https://", "http://"), r"/+$", ""
    )
    keyed = resources.withColumn("ckey", F.lower(norm))
    w = Window.partitionBy("ckey")
    return keyed.withColumn("canonical_id", F.min("id").over(w)).select(
        "id", "uri", "canonical_id"
    )
