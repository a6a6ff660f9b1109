"""Known-fact retrieval + fact recommendation — SURVEY.md §2 B22, B24.

B22 (``transducer/KnownFactsRetrieval.java:48-83``): every outgoing KB
relation of a resolved subject joins the document graph; the serializer
then emits those edges in the ``#known`` named graph. We batch this as
one ``resolved ⋈ relations`` join and (deliberately) exclude rdf:type
edges — they are already emitted in ``#recognized`` and the reference
serializer cannot render its literal/type bookkeeping edges anyway
(RDFSerializer.java:98-104 calls getURI on negative vertex ids).

B24 (``transducer/FactRecommender.java:72-113``): for every ordered
pair of resolved subjects in a document, look up the top-k markov-chain
probabilities between their type clusters → predicted (s, p, o, weight)
edges. Pure joins + a window top-k; the reference's per-pair memoized
SQL (PostgresKB.getMaxMarkovProbability:1343-1383) becomes one join
against the small broadcast ``markov_chain`` stats table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .kb.model import KB


def known_facts(resolved: DataFrame, kb: KB) -> DataFrame:
    """B22: (doc_id, s, p, o) = outgoing non-type KB relations of resolved
    subjects."""
    type_id = kb.rdf_type_id
    rel = kb.relations if type_id is None else kb.relations.filter(F.col("p") != type_id)
    subjects = resolved.select("doc_id", F.col("subject").alias("s")).distinct()
    return subjects.join(rel, "s").select("doc_id", "s", "p", "o").distinct()


def majority_cluster(subjects: DataFrame, kb: KB, type_clusters: DataFrame) -> DataFrame:
    """Reference PostgresKB.getCluster:806-850 — majority vote of a
    subject's rdf:type clusters. (subject) → (subject, cluster)."""
    type_id = kb.rdf_type_id
    types = kb.relations.filter(F.col("p") == type_id).select(
        F.col("s").alias("subject"), F.col("o").alias("type")
    )
    votes = (
        subjects.select("subject")
        .distinct()
        .join(types, "subject")
        .join(F.broadcast(type_clusters), "type")
        .groupBy("subject", "cluster")
        .agg(F.count("*").alias("votes"))
    )
    w = Window.partitionBy("subject").orderBy(F.col("votes").desc(), F.col("cluster").asc())
    return votes.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).select(
        "subject", "cluster"
    )


def recommend_facts(
    resolved: DataFrame,
    kb: KB,
    markov_chain: DataFrame,   # (s_cluster, p, o_cluster, probability)
    type_clusters: DataFrame,  # (type, cluster)
    k: int = 3,
    min_prob: float = 0.0,
) -> DataFrame:
    """B24: predicted (doc_id, s, p, o, weight) edges between resolved
    subject pairs, top-k markov transitions per cluster pair."""
    clusters = majority_cluster(resolved, kb, type_clusters)
    subj = (
        resolved.select("doc_id", "subject").distinct().join(clusters, "subject")
    )
    a = subj.select("doc_id", F.col("subject").alias("s"), F.col("cluster").alias("s_cluster"))
    b = subj.select("doc_id", F.col("subject").alias("o"), F.col("cluster").alias("o_cluster"))
    pairs = a.join(b, "doc_id").filter(F.col("s") != F.col("o"))

    w = Window.partitionBy("s_cluster", "o_cluster").orderBy(
        F.col("probability").desc(), F.col("p").asc()
    )
    top = (
        markov_chain.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") <= k) & (F.col("probability") > min_prob))
        .select("s_cluster", "p", "o_cluster", "probability")
    )
    return pairs.join(F.broadcast(top), ["s_cluster", "o_cluster"]).select(
        "doc_id", "s", "p", "o", F.col("probability").alias("weight")
    )
