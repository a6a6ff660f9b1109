"""KB statistics layer — SURVEY.md §2 A11-A16.

Reference: materialized views + statistics tables built once per KB
(``dbscheme.sql:78-148``, ``PostgresKB.java:1177-1631``). Every one is
a plain aggregation/join pipeline here — partial (map-side) aggregation
and AQE come free from Catalyst. The only driver-side step is the
hierarchical clustering of the type-correlation matrix (A14), which the
reference also runs in-memory (Colt) because the matrix is |types|² —
a few hundred classes, not data-scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .model import KB


# --- A11: histogram / ambiguity views (dbscheme.sql:119-148) -----------

def histogram_literals(kb: KB) -> DataFrame:
    """literal → count(distinct subject): how ambiguous is each literal."""
    return kb.symbols.groupBy("lit").agg(F.countDistinct("s").alias("n_subjects"))


def ambiguity_symbols(kb: KB) -> DataFrame:
    """predicate → avg per-literal subject count (expected ambiguity of a
    datatype property)."""
    per_lit = kb.symbols.groupBy("p", "lit").agg(F.countDistinct("s").alias("n"))
    return per_lit.groupBy("p").agg(F.avg("n").alias("ambiguity"))


def histogram_types(kb: KB) -> DataFrame:
    """type → instance count (dbscheme.sql HISTOGRAM_TYPES)."""
    type_id = kb.rdf_type_id
    return (
        kb.relations.filter(F.col("p") == type_id)
        .groupBy(F.col("o").alias("type"))
        .agg(F.countDistinct("s").alias("n_instances"))
    )


def histogram_symbols(kb: KB) -> DataFrame:
    """predicate → count(distinct literal)."""
    return kb.symbols.groupBy("p").agg(F.countDistinct("lit").alias("n_literals"))


# --- A12: cardinality statistics (PostgresKB.java:1177-1204) ------------

def subject_cardinalities(kb: KB) -> DataFrame:
    """Per predicate: distinct subjects, total triples, avg out-degree —
    the two-level aggregate SUBJECT_CARD_RELATIONS (dbscheme.sql:78-83)."""
    per_subj = kb.relations.groupBy("s", "p").agg(F.count("*").alias("c"))
    return per_subj.groupBy("p").agg(
        F.count("*").alias("count"),
        F.sum("c").alias("sum"),
        (F.sum("c") / F.count("*")).alias("ratio"),
    )


def object_cardinalities(kb: KB) -> DataFrame:
    per_obj = kb.relations.groupBy("o", "p").agg(F.count("*").alias("c"))
    return per_obj.groupBy("p").agg(
        F.count("*").alias("count"),
        F.sum("c").alias("sum"),
        (F.sum("c") / F.count("*")).alias("ratio"),
    )


# --- A14: type co-occurrence → correlation → clusters -------------------

def instance_types(kb: KB) -> DataFrame:
    type_id = kb.rdf_type_id
    return kb.relations.filter(F.col("p") == type_id).select(
        F.col("s").alias("instance"), F.col("o").alias("type")
    )


def type_cooccurrence(kb: KB, sample_per_type: int | None = 1000) -> DataFrame:
    """(t1, t2, n) co-occurrence counts over shared instances
    (PostgresKB.java:1492-1540). Reference samples instances with LIMIT;
    we sample deterministically with row_number ≤ n per type (§4 O9)."""
    it = instance_types(kb)
    if sample_per_type:
        w = Window.partitionBy("type").orderBy("instance")
        it = it.withColumn("rn", F.row_number().over(w)).filter(
            F.col("rn") <= sample_per_type
        ).drop("rn")
    a = it.withColumnRenamed("type", "t1")
    b = it.withColumnRenamed("type", "t2")
    return a.join(b, "instance").groupBy("t1", "t2").agg(F.count("*").alias("n"))


def _pearson_from_cooc(cooc: list[tuple[int, int, int]]):
    """Correlation matrix from co-occurrence counts (driver-side: the
    matrix is |types|², tiny). Mirrors DoubleMatrix covariance→Pearson
    (DoubleMatrix.java:424-586) treating instance membership as the
    random variable over the sampled universe."""
    import math

    types = sorted({t for t1, t2, _ in cooc for t in (t1, t2)})
    idx = {t: i for i, t in enumerate(types)}
    k = len(types)
    m = [[0.0] * k for _ in range(k)]
    for t1, t2, n in cooc:
        m[idx[t1]][idx[t2]] = float(n)
    total = max(sum(m[i][i] for i in range(k)), 1.0)
    corr = [[0.0] * k for _ in range(k)]
    for i in range(k):
        for j in range(k):
            pi, pj, pij = m[i][i] / total, m[j][j] / total, m[i][j] / total
            den = math.sqrt(pi * (1 - pi) * pj * (1 - pj))
            corr[i][j] = (pij - pi * pj) / den if den > 1e-12 else (1.0 if i == j else 0.0)
    return types, corr


def _average_link_clusters(types, corr, threshold: float = 0.5):
    """Average-link agglomerative clustering on the correlation matrix
    (reference HierarchicalClustering.java:37-138 with bias/pruning
    thresholds). Pure python — no scipy in the image; |types| is small."""
    clusters = [[i] for i in range(len(types))]

    def avg_link(c1, c2):
        return sum(corr[i][j] for i in c1 for j in c2) / (len(c1) * len(c2))

    while len(clusters) > 1:
        best = None
        for a in range(len(clusters)):
            for b in range(a + 1, len(clusters)):
                s = avg_link(clusters[a], clusters[b])
                if best is None or s > best[0]:
                    best = (s, a, b)
        if best is None or best[0] < threshold:
            break
        s, a, b = best
        clusters[a] = clusters[a] + clusters[b]
        del clusters[b]
    return clusters


def type_clusters(kb: KB, sample_per_type: int | None = 1000, threshold: float = 0.5) -> DataFrame:
    """A14 end-to-end → (type, cluster) with cluster = min type id of the
    cluster (deterministic label)."""
    cooc = [(r["t1"], r["t2"], r["n"]) for r in type_cooccurrence(kb, sample_per_type).collect()]
    if not cooc:
        return kb.resources.sparkSession.createDataFrame([], "type long, cluster long")
    types, corr = _pearson_from_cooc(cooc)
    clusters = _average_link_clusters(types, corr, threshold)
    rows = []
    for c in clusters:
        label = min(types[i] for i in c)
        rows.extend((types[i], label) for i in c)
    return kb.resources.sparkSession.createDataFrame(rows, "type long, cluster long")


# --- A13: markov-chain statistics (PostgresKB.java:1225-1320) ------------

def markov_chain(
    kb: KB, clusters: DataFrame, sample_per_cluster: int = 1000
) -> DataFrame:
    """P(predicate, object-cluster | subject-cluster) estimated from a
    deterministic per-cluster instance sample → (s_cluster, p, o_cluster,
    probability), normalized per s_cluster (window aggregate replaces the
    reference's driver-side normalize loop :1283-1315)."""
    it = instance_types(kb).join(clusters, "type").select("instance", "cluster")
    w = Window.partitionBy("cluster").orderBy("instance")
    sample = (
        it.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= sample_per_cluster)
        .select(F.col("instance").alias("s"), F.col("cluster").alias("s_cluster"))
    )
    type_id = kb.rdf_type_id
    rel = kb.relations.filter(F.col("p") != type_id)
    obj_cluster = it.select(
        F.col("instance").alias("o"), F.col("cluster").alias("o_cluster")
    ).distinct()
    counts = (
        sample.join(rel, "s")
        .join(obj_cluster, "o")
        .groupBy("s_cluster", "p", "o_cluster")
        .agg(F.count("*").alias("n"))
    )
    wn = Window.partitionBy("s_cluster")
    return counts.select(
        "s_cluster",
        "p",
        "o_cluster",
        (F.col("n") / F.sum("n").over(wn)).alias("probability"),
    )


# --- A15: proper-noun statistics (PostgresKB.java:1385-1484) -------------

def proper_noun_rating(
    kb: KB, clusters: DataFrame, idf: DataFrame | None = None
) -> DataFrame:
    """Per (cluster, datatype property): coverage = distinct labeled
    subjects / cluster size; ambiguity from A11; idf optional from a
    corpus run → rating = coverage / ambiguity × idf."""
    it = instance_types(kb).join(clusters, "type").select("instance", "cluster").distinct()
    cluster_sizes = it.groupBy("cluster").agg(F.countDistinct("instance").alias("size"))
    labeled = (
        kb.symbols.select(F.col("s").alias("instance"), "p")
        .join(it, "instance")
        .groupBy("cluster", "p")
        .agg(F.countDistinct("instance").alias("n_labeled"))
    )
    amb = ambiguity_symbols(kb)
    out = (
        labeled.join(cluster_sizes, "cluster")
        .join(amb, "p")
        .select(
            "cluster",
            F.col("p").alias("property"),
            (F.col("n_labeled") / F.col("size")).alias("coverage"),
            "ambiguity",
        )
    )
    if idf is not None:
        out = out.join(idf, out.property == idf.p, "left").drop(idf.p).fillna(
            1.0, subset=["idf"]
        )
    else:
        out = out.withColumn("idf", F.lit(1.0))
    return out.withColumn(
        "rating", F.col("coverage") / F.col("ambiguity") * F.col("idf")
    )


def corpus_property_idf(docs: DataFrame, kb: KB) -> DataFrame:
    """A15 corpus-IDF builder (``TextCorpus.getDocumentFrequency``,
    TextCorpus.java:180-232): run the corpus through spotting (the
    reference executes pipeline steps 1-7, stopping after
    RDFLiteralSpotting) and count, per datatype property, the documents
    in which it was retrieved; idf = N_docs / (df + 1) — the
    reference's UN-logged ratio. Returns (p, idf) in exactly the shape
    :func:`proper_noun_rating` joins on.

    ``docs`` is a corpus in input_hint shape (``doc_id`` is derived if
    absent); the spotting join is the same corpus-wide prefix join the
    flagship uses — one pass, no per-doc queries."""
    from .. import textproc
    from ..spotting import spot

    if "doc_id" not in docs.columns:
        docs = textproc.with_doc_id(docs)
    # same single dictionary job as the flagship (pipeline.py): the
    # distinct prefix set AND max literal length in one aggregation —
    # the length caps emitted suffixes at max_lit + 1 instead of the
    # worst-case MAX_SUFFIX_LEN, shrinking every candidate row shipped
    # through the spot join
    pref_rows = (
        kb.literals.groupBy("prefix")
        .agg(F.max(F.length("literal")).alias("ml"))
        .collect()
    )
    prefixes = [r["prefix"] for r in pref_rows]
    max_lit = max((r["ml"] for r in pref_rows), default=0)
    cap = min(textproc.MAX_SUFFIX_LEN, max_lit + 1)
    mentions = spot(
        textproc.suffix_candidates(docs, prefixes, max_suffix_len=cap),
        kb.gazetteer(),
    )
    n_docs = docs.count()
    return (
        mentions.groupBy("prop_id")
        .agg(F.countDistinct("doc_id").alias("df"))
        .select(
            F.col("prop_id").alias("p"),
            (F.lit(float(n_docs)) / (F.col("df") + 1)).alias("idf"),
        )
    )


# --- A16: regex distribution (PostgresKB.java:1605-1631) ------------------

DEFAULT_REGEXES = {
    # patterns from the reference's QueryExperiment.java:159-166
    "DATE": r"^\d{4}-\d{2}-\d{2}$",
    "MAIL": r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$",
    "ISBN": r"^\d{9}[\dXx]$",
    "FLOAT": r"^-?\d+\.\d+$",
    "INT": r"^-?\d+$",
}


def regex_distribution(
    kb: KB, regexes: dict[str, str] | None = None, keep_above: float = 0.9
) -> DataFrame:
    """Per (regex, property): fraction of the property's distinct literals
    matching; keep ratios > 0.9 (PostgresKB.java:1617-1626)."""
    regexes = regexes or DEFAULT_REGEXES
    spark = kb.literals.sparkSession
    rx = spark.createDataFrame(list(regexes.items()), "name string, pattern string")
    prop_lits = (
        kb.symbols.join(kb.literals.withColumnRenamed("id", "lit"), "lit")
        .select("p", "lit", "literal")
        .distinct()
    )
    scored = prop_lits.crossJoin(F.broadcast(rx)).withColumn(
        "m", F.regexp_like(F.col("literal"), F.col("pattern")).cast("int")
    )
    return (
        scored.groupBy("name", "pattern", "p")
        .agg((F.sum("m") / F.countDistinct("lit")).alias("ratio"))
        .filter(F.col("ratio") > keep_above)
    )
