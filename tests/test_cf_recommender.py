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
