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


def predict_facts_cosine(m: "np.ndarray") -> "np.ndarray":
    """Item-based cosine CF fill-in over one item×subject matrix —
    ``DoubleMatrix.cosineSimilarity`` + ``predictValuesByCosine``
    (DoubleMatrix.java, the variant the reference exercises in
    ``PredictFactsExperiment.testPredictFacts:229-310``; the production
    ``FactRecommender.compareRecommender`` path uses the Pearson +
    typed-evidence variant in :func:`_cf_eval_one_doc`).

    Reference-parity semantics, bug-for-bug
    (``testPredictFacts:282-293``): the similarity matrix comes from
    the UNREDUCED input ``m`` (``m.cosineSimilarity()`` re-reads the
    original), while prediction runs over the reduced copy ``mc``
    (single-cardinality subject columns zeroed) — so a subject with
    exactly one asserted fact comes back all-zero: its column is zeroed
    by the reduction and the fill ``Σ_{item'≠item} cos × mc[item']``
    sums an all-zero column. Cells still non-zero in ``mc`` pass
    through unchanged. Driver/executor-local numpy on a per-doc matrix
    — same physical policy as the rest of the CF family."""
    import numpy as np

    mc = m.astype(float).copy()
    card = (mc != 0).sum(axis=0)
    mc[:, card == 1] = 0.0
    norm = np.sqrt((m * m).sum(axis=1))
    with np.errstate(invalid="ignore", divide="ignore"):
        sim = (m @ m.T) / np.outer(norm, norm)
    sim = np.nan_to_num(sim)
    fill = sim @ mc - np.diag(sim)[:, None] * mc
    return np.where(mc == 0, fill, mc)


_CF_EVAL_SCHEMA = "doc_id long, n_eval int, accuracy double, fallout double"


def _cf_eval_one_doc(
    spo: "np.ndarray",
    cls: dict,
    markov: dict,
    type_id: int,
    clusters: set,
    max_holdouts: int | None = None,
):
    """Leave-one-out item-based CF over one document's fact graph
    (FactRecommender.compareRecommender, FactRecommender.java:329-480).

    For each held-out (s,p,o) with both endpoints classified: build the
    0/1 item×subject matrix over the REMAINING triples (items =
    distinct (p,o) pairs), zero single-cardinality subject columns,
    item-item Pearson similarity clipped at 0 and masked to pairs with
    shared type-item evidence, CF fill-in pred = sim @ M for empty
    cells, then score each predicted cell by the markov probability of
    (cluster(s), p, cluster(o)). The held-out triple predicted ⇒
    correct; other predictions ⇒ fallout.

    Deviations from the Java (documented, both evident defects in the
    eval-only code): the reference accumulates ``matrix.add`` across
    hold-out iterations instead of rebuilding (counts grow per round),
    and its type-evidence mask indexes subjects with item ids; here the
    matrix is rebuilt per hold-out and type evidence is computed in the
    item space.

    ``max_holdouts`` caps the number of evaluated hold-outs per doc
    (the loop is O(holdouts × matrix builds), quadratic on rich doc
    graphs); the triple list is sorted so the cap — and hence the
    metric — is deterministic regardless of upstream partition order.
    """
    import numpy as np

    triples = sorted(tuple(int(x) for x in row) for row in spo)
    items = {}
    for s, p, o in triples:
        items.setdefault((p, o), len(items))
    subs = {}
    for s, p, o in triples:
        subs.setdefault(s, len(subs))
    type_items = [
        i for (p, o), i in items.items() if p == type_id and o in clusters
    ]
    correct = unknown = n_eval = 0
    for k, held in enumerate(triples):
        hs, hp, ho = held
        if hs not in cls or ho not in cls:
            continue
        if max_holdouts is not None and n_eval >= max_holdouts:
            break
        n_eval += 1
        rest = triples[:k] + triples[k + 1:]
        m = np.zeros((len(items), len(subs)))
        for s, p, o in rest:
            m[items[(p, o)], subs[s]] = 1.0
        # zero single-cardinality subject columns (cold-start noise)
        m[:, (m.sum(axis=0) == 1)] = 0.0
        if not m.any():
            continue
        with np.errstate(invalid="ignore", divide="ignore"):
            sim = np.corrcoef(m)
        sim = np.nan_to_num(sim)
        np.clip(sim, 0.0, None, out=sim)
        np.fill_diagonal(sim, 0.0)
        if type_items:
            tvec = m[type_items].sum(axis=0)          # type mass per subject
            support = (m * tvec) @ m.T                # shared typed subjects
            sim[support == 0] = 0.0
        else:
            sim[:] = 0.0
        pred = sim @ m
        pred[m > 0] = 0.0                             # only fill empty cells
        for (p, o), i in items.items():
            for s, j in subs.items():
                if pred[i, j] == 0 or s == o or s not in cls or o not in cls:
                    continue
                # bug-for-bug reference parity (FactRecommender.java:
                # 442-448): ANY zero probability — stored or missing —
                # is floored to 1e-6 before the gate, which makes
                # `pr * pred > 0` equivalent to `pred > 0` (pred > 0
                # already holds here). The markov stats therefore never
                # veto a CF prediction in the reference either; the
                # lookup is kept because the replayed protocol computes
                # it, not because it can change the outcome.
                pr = markov.get((cls[s], p, cls[o]), 0.0) or 1e-6
                if pr * pred[i, j] > 0:
                    if (s, p, o) == held:
                        correct += 1
                    else:
                        unknown += 1
    acc = correct / n_eval if n_eval else 0.0
    fall = unknown / n_eval if n_eval else 0.0
    return n_eval, acc, fall


def cf_recommend_eval(
    facts: DataFrame,
    kb: KB,
    markov_chain: DataFrame,
    type_clusters: DataFrame,
    max_holdouts: int | None = None,
) -> DataFrame:
    """The reference's CF-recommender comparison experiment as a
    distributed eval: per document, leave-one-out accuracy/fallout of
    the item-based CF recommender over the doc's fact graph →
    (doc_id, n_eval, accuracy, fallout).

    ``facts`` is (doc_id, s, p, o) (e.g. :func:`known_facts` plus
    rdf:type rows). classification = majority cluster per subject;
    markov lookups ship as a broadcast dict (stats-table scale). The
    per-doc matrices are tens of items — per-doc numpy inside one
    applyInPandas pass, the same physical policy as disambiguation."""
    import pandas as pd

    cls_rows = majority_cluster(
        facts.select(F.col("s").alias("subject"))
        .unionByName(facts.select(F.col("o").alias("subject")))
        .distinct(),
        kb,
        type_clusters,
    ).collect()
    cls = {r["subject"]: r["cluster"] for r in cls_rows}
    markov = {
        (r["s_cluster"], r["p"], r["o_cluster"]): r["probability"]
        for r in markov_chain.collect()
    }
    # membership set = every clustered type (members AND labels): the
    # reference checks labels only (kb.getClusters()), which zeroes CF
    # evidence for docs typed with non-representative members
    cl_rows = type_clusters.collect()
    clusters = {r["type"] for r in cl_rows} | {r["cluster"] for r in cl_rows}
    type_id = kb.rdf_type_id
    type_id = -1 if type_id is None else type_id  # id 0 is a valid id

    def eval_doc(pdf: pd.DataFrame) -> pd.DataFrame:
        doc = pdf["doc_id"].iloc[0]
        n_eval, acc, fall = _cf_eval_one_doc(
            pdf[["s", "p", "o"]].to_numpy(),
            cls,
            markov,
            type_id,
            clusters,
            max_holdouts=max_holdouts,
        )
        return pd.DataFrame(
            {"doc_id": [doc], "n_eval": [n_eval], "accuracy": [acc], "fallout": [fall]}
        )

    return facts.groupBy("doc_id").applyInPandas(eval_doc, _CF_EVAL_SCHEMA)
