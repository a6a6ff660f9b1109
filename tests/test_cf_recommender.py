"""CF comparison recommender (FactRecommender.compareRecommender,
FactRecommender.java:329-480) — leave-one-out eval protocol."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from scoobie_spark import facts as facts_mod
from scoobie_spark.fixtures import synth_kb
from scoobie_spark.kb.stats import markov_chain, type_clusters


def test_cf_eval_one_doc_recovers_structured_held_out():
    """Hand-built doc graph where CF must recover held-out triples: two
    blocks of twin subjects — {1,2} share items (5,10),(5,11),(5,12)
    and {3,4} share (5,20),(5,21) — plus a type item per subject, so a
    held-out in-block triple correlates with its block's other items
    (Pearson needs cross-subject variance, hence two blocks)."""
    TYPE = 99
    CL = 7
    spo = np.array(
        [
            (1, 5, 10), (2, 5, 10),
            (1, 5, 11), (2, 5, 11),
            (1, 5, 12), (2, 5, 12),
            (3, 5, 20), (4, 5, 20),
            (3, 5, 21), (4, 5, 21),
            (1, TYPE, CL), (2, TYPE, CL), (3, TYPE, CL), (4, TYPE, CL),
        ],
        dtype="int64",
    )
    cls = {s: CL for s in (1, 2, 3, 4, 10, 11, 12, 20, 21)}
    markov = {(CL, 5, CL): 0.5}
    n_eval, acc, fall = facts_mod._cf_eval_one_doc(
        spo, cls, markov, type_id=TYPE, clusters={CL}
    )
    assert n_eval == 10  # all p-triples have both endpoints classified
    assert acc > 0.0     # held-out facts recovered from the twin subject
    assert 0.0 <= fall


def test_cf_eval_unconnected_doc():
    spo = np.array([(1, 5, 10)], dtype="int64")
    n_eval, acc, fall = facts_mod._cf_eval_one_doc(
        spo, cls={}, markov={}, type_id=99, clusters=set()
    )
    assert n_eval == 0 and acc == 0.0 and fall == 0.0


def test_cf_recommend_eval_distributed(spark):
    """End-to-end over synthetic per-doc fact graphs: one row per doc,
    accuracy/fallout in range, deterministic across runs."""
    kb = synth_kb(spark, n_instances=60)
    clusters = type_clusters(kb, sample_per_type=None)
    mc = markov_chain(kb, clusters)
    type_id = kb.rdf_type_id
    # pseudo-docs: subject i's KB neighborhood (relations + type rows)
    rel = kb.relations
    docs_facts = (
        rel.filter(F.col("s") % 10 < 3)
        .select((F.col("s") % 7).alias("doc_id"), "s", "p", "o")
    )
    out = facts_mod.cf_recommend_eval(docs_facts, kb, mc, clusters).cache()
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows
    for r in rows.values():
        assert r["accuracy"] >= 0.0 and r["fallout"] >= 0.0
    out2 = {r["doc_id"]: (r["n_eval"], r["accuracy"], r["fallout"])
            for r in facts_mod.cf_recommend_eval(docs_facts, kb, mc, clusters).collect()}
    assert out2 == {k: (v["n_eval"], v["accuracy"], v["fallout"]) for k, v in rows.items()}


def test_predict_facts_cosine_toy_parity():
    """PredictFactsExperiment.testPredictFacts:229-310 replay: the
    reference's hand-built 10-item × 4-subject toy matrix (Dana, Damian,
    Tresto, Leif; knows-edges + type facts) through cosineSimilarity +
    predictValuesByCosine. The experiment's narrative reproduces with
    frozen values: IS_PERSON — asserted for everyone but Dana — is
    filled in for Dana at 2.8165 (sqrt(2)*2 - ish from her knows-edges),
    the strongest type prediction for her, while the unrelated
    IS_WARRIOR fills at only 1.1547."""
    import numpy as np

    from scoobie_spark.facts import predict_facts_cosine

    rows = [
        "IS_PERSON", "KNOWS_DANA", "KNOWS_DAMIAN", "KNOWS_TRESTO",
        "KNOWS_LEIF", "IS_MAGICIAN", "IS_MUSICIAN", "IS_SPIRITE",
        "IS_LIBRIAN", "IS_WARRIOR",
    ]
    cols = ["DAMIAN", "TRESTO", "LEIF", "DANA"]
    ri = {k: i for i, k in enumerate(rows)}
    ci = {k: i for i, k in enumerate(cols)}
    m = np.zeros((10, 4))
    for r, c, v in [
        ("IS_PERSON", "DAMIAN", 2), ("IS_PERSON", "TRESTO", 2),
        ("IS_PERSON", "LEIF", 2),
        ("KNOWS_DANA", "DAMIAN", 1), ("KNOWS_DANA", "TRESTO", 1),
        ("KNOWS_DANA", "LEIF", 1),
        ("KNOWS_DAMIAN", "TRESTO", 1), ("KNOWS_DAMIAN", "LEIF", 1),
        ("KNOWS_DAMIAN", "DANA", 1),
        ("KNOWS_TRESTO", "DAMIAN", 1), ("KNOWS_TRESTO", "LEIF", 1),
        ("KNOWS_TRESTO", "DANA", 1),
        ("KNOWS_LEIF", "DAMIAN", 1), ("KNOWS_LEIF", "TRESTO", 1),
        ("KNOWS_LEIF", "DANA", 1),
        ("IS_MAGICIAN", "DANA", 2), ("IS_MUSICIAN", "DANA", 2),
        ("IS_MAGICIAN", "DAMIAN", 2), ("IS_SPIRITE", "DAMIAN", 2),
        ("IS_LIBRIAN", "DAMIAN", 2),
        ("IS_WARRIOR", "LEIF", 2),
    ]:
        m[ri[r], ci[c]] = v

    pred = predict_facts_cosine(m)
    # asserted cells survive untouched
    assert pred[ri["IS_PERSON"], ci["DAMIAN"]] == 2.0
    assert pred[ri["KNOWS_DANA"], ci["LEIF"]] == 1.0
    # the experiment's headline inference: Dana is probably a person too
    assert pred[ri["IS_PERSON"], ci["DANA"]] == pytest.approx(2.8165, abs=1e-4)
    assert pred[ri["IS_WARRIOR"], ci["DANA"]] == pytest.approx(1.1547, abs=1e-4)
    is_rows = [ri[r] for r in rows if r.startswith("IS_") and r != "IS_PERSON"]
    assert pred[ri["IS_PERSON"], ci["DANA"]] > max(
        pred[i, ci["DANA"]] for i in is_rows
    )


def test_predict_facts_cosine_single_fact_subject_zeroed():
    """Reference-parity edge (testPredictFacts:282-293): a subject with
    exactly ONE asserted fact is zeroed by the dimension reduction and
    predictValuesByCosine then fills its cells from the all-zero
    reduced column — the asserted fact does NOT survive. (The docstring
    documents this deliberately; this pin keeps anyone from 'fixing'
    it away from the reference.)"""
    import numpy as np

    from scoobie_spark.facts import predict_facts_cosine

    m = np.array(
        [
            [2.0, 2.0, 0.0],  # shared type fact
            [1.0, 1.0, 0.0],  # shared knows fact
            [0.0, 0.0, 5.0],  # the lone fact of subject 2
        ]
    )
    pred = predict_facts_cosine(m)
    # subject 2's column had cardinality 1 → fully zeroed, asserted 5.0 gone
    assert (pred[:, 2] == 0).all()
    # multi-fact subjects keep their asserted values
    assert pred[0, 0] == 2.0 and pred[1, 1] == 1.0
