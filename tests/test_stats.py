"""A11-A16 statistics layer against hand-computable fixtures."""

import pytest
from pyspark.sql import functions as F

from scoobie_spark.fixtures import micro_kb, synth_kb
from scoobie_spark.kb import stats


@pytest.fixture(scope="module")
def kb(spark):
    return synth_kb(spark, n_instances=60).materialize()


def test_histograms_micro(spark):
    mk = micro_kb(spark)
    hl = {(r["lit"], r["n_subjects"]) for r in stats.histogram_literals(mk).collect()}
    assert hl == {(0, 1), (1, 1)}
    ht = {(r["type"], r["n_instances"]) for r in stats.histogram_types(mk).collect()}
    assert ht == {(2, 1), (3, 1)}  # Person←Percy, Place←CampNode
    hs = {(r["p"], r["n_literals"]) for r in stats.histogram_symbols(mk).collect()}
    assert hs == {(7, 2)}


def test_ambiguity_planted(spark, kb):
    """synth KB plants shared labels (~10% of instances) → some literal
    has ≥2 subjects and rdfs:label ambiguity > 1."""
    hl = stats.histogram_literals(kb)
    assert hl.filter(F.col("n_subjects") >= 2).count() > 0
    amb = stats.ambiguity_symbols(kb).collect()
    assert len(amb) == 1 and amb[0]["ambiguity"] > 1.0


def test_cardinalities(spark, kb):
    sc = stats.subject_cardinalities(kb)
    rows = {r["p"]: r for r in sc.collect()}
    # every predicate: ratio = sum / count
    for p, r in rows.items():
        assert abs(r["ratio"] - r["sum"] / r["count"]) < 1e-9
    # relations triple count is preserved: sum over predicates
    assert sum(r["sum"] for r in rows.values()) == kb.relations.count()


def test_type_clusters_and_markov(spark, kb):
    clusters = stats.type_clusters(kb, threshold=0.99)
    # 5 disjoint classes in the synth KB → no correlation → 5 singleton clusters
    assert clusters.count() == 5
    assert clusters.select("cluster").distinct().count() == 5

    mc = stats.markov_chain(kb, clusters)
    rows = mc.collect()
    assert rows, "markov chain must be non-empty"
    # probabilities normalize to 1 per s_cluster
    sums = mc.groupBy("s_cluster").agg(F.sum("probability").alias("s")).collect()
    for r in sums:
        assert abs(r["s"] - 1.0) < 1e-9


def test_proper_noun_rating(spark, kb):
    clusters = stats.type_clusters(kb, threshold=0.99)
    pnr = stats.proper_noun_rating(kb, clusters)
    rows = pnr.collect()
    assert rows
    for r in rows:
        assert 0.0 < r["coverage"] <= 1.0
        assert r["rating"] == pytest.approx(r["coverage"] / r["ambiguity"] * r["idf"])


def test_regex_distribution(spark):
    from scoobie_spark.kb.etl import build_kb_from_string_triples

    obj = spark.createDataFrame(
        [("http://i/a", "http://rel/x", "http://i/b")], "s string, p string, o string"
    )
    dat = spark.createDataFrame(
        [
            ("http://i/a", "http://prop/date", "2021-01-02"),
            ("http://i/b", "http://prop/date", "1999-12-31"),
            ("http://i/a", "http://prop/name", "Alice"),
        ],
        "s string, p string, literal string",
    )
    kb = build_kb_from_string_triples(spark, obj, dat)
    dist = stats.regex_distribution(kb)
    rows = [(r["name"], r["ratio"]) for r in dist.collect()]
    # the date property's literals all match DATE; name property matches nothing
    assert ("DATE", 1.0) in rows
    assert all(name != "DATE" or ratio == 1.0 for name, ratio in rows)


def test_corpus_idf_feeds_proper_noun_rating(spark):
    """A15 end-to-end: corpus run → per-property IDF
    (TextCorpus.getDocumentFrequency) → proper_noun_rating(idf=...).
    rdfs:label is spotted in every synth doc, so its df is high and its
    idf low but > 1 (N/(df+1) with df < N); properties never spotted
    keep the 1.0 fill."""
    from scoobie_spark.fixtures import synth_corpus, synth_kb
    from scoobie_spark.kb.stats import (
        corpus_property_idf,
        proper_noun_rating,
        type_clusters,
    )

    kb = synth_kb(spark, n_instances=60)
    docs = synth_corpus(spark, n_docs=40, n_instances=60)
    idf = corpus_property_idf(docs, kb)
    rows = {r["p"]: r["idf"] for r in idf.collect()}
    assert rows, "label property must be spotted"
    n_docs = 40
    for p, v in rows.items():
        assert 0 < v <= n_docs
    clusters = type_clusters(kb, sample_per_type=None)
    rated = proper_noun_rating(kb, clusters, idf=idf)
    got = {(r["cluster"], r["property"]): r for r in rated.collect()}
    assert got
    # every rated property that was spotted carries the corpus idf
    for (c, p), r in got.items():
        if p in rows:
            assert r["idf"] == pytest.approx(rows[p])
            assert r["rating"] == pytest.approx(
                r["coverage"] / r["ambiguity"] * r["idf"]
            )
        else:
            assert r["idf"] == 1.0
