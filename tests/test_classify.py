"""B14 entity classification — train on synth-KB literals, classify
planted phrases, margin rule honored (EntityClassification.java:56-147)."""

import pytest
from pyspark.sql import functions as F

from scoobie_spark import classify
from scoobie_spark.fixtures import synth_kb


@pytest.fixture(scope="module")
def model(spark):
    kb = synth_kb(spark, n_instances=100)
    pairs = classify.training_pairs(kb)
    assert pairs.count() > 50
    return classify.train_entity_classifier(pairs, epochs=1200), kb


def test_training_classes(model):
    clf, kb = model
    # synth KB has 5 classes (Person/Place/Org/Work/Event)
    assert len(clf.classes) == 5


def test_memorizes_training_literals(model, spark):
    """Maxent with hashed ngrams must recover the class of seen,
    unambiguously-labeled literals (sanity floor, not a quality gate)."""
    clf, kb = model
    pairs = classify.training_pairs(kb)
    # literals appearing with ONE class only
    uniq = (
        pairs.groupBy("literal")
        .agg(F.countDistinct("cls").alias("n"), F.first("cls").alias("cls"))
        .filter(F.col("n") == 1)
        .collect()
    )
    texts = [r["literal"] for r in uniq]
    want = [r["cls"] for r in uniq]
    proba = clf.predict_proba(texts)
    got = [clf.classes[i] for i in proba.argmax(axis=1)]
    acc = sum(g == w for g, w in zip(got, want)) / len(want)
    assert acc > 0.9, f"train-set accuracy {acc}"


def test_classify_phrases_margin(model, spark):
    clf, kb = model
    phrases = spark.createDataFrame(
        [(1, 0, 10, "Alder Archer"), (1, 20, 25, "zzzz qqqq")],
        "doc_id long, begin int, end int, phrase string",
    )
    strict = classify.classify_phrases(phrases, clf, margin=0.99).collect()
    loose = classify.classify_phrases(phrases, clf, margin=0.0).collect()
    assert len(loose) >= len(strict)
    for r in loose:
        assert r["margin"] >= 0.0 and 0.0 <= r["prob"] <= 1.0
    # schema contract
    assert {f.name for f in classify.classify_phrases(phrases, clf).schema} == {
        "doc_id", "begin", "end", "phrase", "cls", "prob", "margin"
    }
