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


def test_scan_word_syntax_shape_classes():
    """LabeledTextCorpus.scanWordSyntax:403-483 golden: regex shape
    classes replace the token (last matching class wins), unclassed
    tokens >3 chars add an s:<last3> suffix feature."""
    assert classify.scan_word_syntax("McDonald") == ["MIXEDCAPS"]
    # the reference's DATE class [0-9]+[\p{Punct}[0-9]+]+ admits plain
    # digit runs (nested-class union) and is checked after ALLDIGITS,
    # so "1984" lands on DATE there too
    assert classify.scan_word_syntax("1984") == ["DATE"]
    assert classify.scan_word_syntax("3.14") == ["DATE"]  # DATE after NUMERICAL wins
    assert classify.scan_word_syntax("xiv") == ["ROMAN"]
    assert classify.scan_word_syntax("...") == ["MULTIDOTS"]
    assert classify.scan_word_syntax("Dr.") == ["ABBR"]
    assert classify.scan_word_syntax("J.") == ["LONELYINITIAL"]  # ABBR needs ≥2 letters
    assert classify.scan_word_syntax("A") == ["CAPLETTER"]
    assert classify.scan_word_syntax(",") == ["PUNC"]
    assert classify.scan_word_syntax("1990-1995") == ["NUMRANGE"]
    assert classify.scan_word_syntax("Jackson") == ["s:son", "Jackson"]
    assert classify.scan_word_syntax("cat") == ["cat"]


def test_reference_features_structure():
    """extractFeatures:293-337: i: content unigrams; a:/p: context
    n-grams (comma-joined) over windowsize-1 neighbors."""
    feats = classify.reference_features(
        "Percy Jackson",
        pre_tokens=["met", "young"],
        post_tokens=["today", "at", "camp"],
        ngram_sizes=(1, 2),
        windowsize=3,
    )
    assert "i:Percy" in feats and "i:Jackson" in feats and "i:s:son" in feats
    assert "a:met" in feats and "a:met,young" in feats
    # windowsize=3 keeps only the first 2 post tokens
    assert "p:today" in feats and "p:today,at" in feats
    assert not any(f.startswith("p:") and "camp" in f for f in feats)


def test_featurizer_flag_comparison(model, spark):
    """Both featurizers train and classify on the synthetic KB; the
    margin-0.6 acceptance measured on this fixture: char_ngrams 67 vs
    reference 39 of 100 planted labels — the char-ngram bag memorizes
    synthetic label morphology better, which is exactly why it stays
    the default and the reference feature set is the parity flag."""
    clf, kb = model
    pairs = classify.training_pairs(kb)
    phrases = (
        kb.symbols.join(kb.literals.withColumnRenamed("id", "lit"), "lit")
        .select(
            F.col("s").alias("doc_id"),
            F.lit(0).alias("begin"),
            F.length("literal").alias("end"),
            F.col("literal").alias("phrase"),
        )
        .distinct()
    )
    ref = classify.train_entity_classifier(pairs, epochs=1200, featurizer="reference")
    assert ref.featurizer == "reference"
    n_ref = classify.classify_phrases(phrases, ref, margin=0.6).count()
    n_chr = classify.classify_phrases(phrases, clf, margin=0.6).count()
    assert n_ref >= 20          # the parity features do learn the KB
    assert n_chr >= n_ref       # measured: the default is not worse


def test_reference_features_windowsize_one():
    """windowsize=1 means zero context neighbors on BOTH sides (the
    ctx[-0:] slice used to leak the entire pre-context)."""
    feats = classify.reference_features(
        "Percy", pre_tokens=["a"] * 50, post_tokens=["b"] * 50, windowsize=1
    )
    assert not any(f.startswith(("a:", "p:")) for f in feats)


def test_featurizer_validated():
    with pytest.raises(ValueError):
        classify.EntityClassifier(
            __import__("numpy").zeros((4, 2), "float32"),
            __import__("numpy").zeros(2, "float32"),
            [0, 1],
            featurizer="Reference",
        )


def test_extract_span_features_protocol():
    """extractFeatures:293-337 full-context form: span tokens emit i:
    unigrams (with suffixes), O-context participates only when its
    2-char POS prefix is in the postag set, labeled context contributes
    its LABEL at type_proportion=1, and a:/p: n-grams join with ','."""
    rows = [
        ("quickly", "RB", "O"),        # RB not in postags -> silent
        ("acquired", "VBD", "O"),      # VB prefix -> shape feature
        ("Google", "NNP", "I-ORG"),    # labeled context -> label itself
        ("Percy", "NNP", "I-PER"),     # span start
        ("Jackson", "NNP", "I-PER"),   # span end
        ("visited", "VBD", "O"),       # VB prefix -> shape
        ("Rome", "NNP", "O"),          # NN prefix -> shape
    ]
    feats = classify.extract_span_features(rows, 3, 4, ngram_sizes=(1, 2))
    infix = [f for f in feats if f.startswith("i:")]
    pre = [f for f in feats if f.startswith("a:")]
    post = [f for f in feats if f.startswith("p:")]
    # span: CAPLETTER-initial words -> shape class + s: suffix features
    assert "i:s:rcy" in infix and "i:s:son" in infix
    # pre-context: acquired's shape + Google's label, bigram joined by ','
    assert "a:I-ORG" in pre
    assert any("," in f for f in pre)          # 2-grams present
    assert not any("RB" in f for f in pre)     # quickly filtered out
    # post-context: visited & Rome shapes, no suffix features in context
    assert post and not any(f.startswith("p:s:") for f in post)


def test_extract_span_features_type_proportion_zero():
    """type_proportion=0 degrades labeled context to its word shape
    (the reference's Random() draw at the deterministic endpoint)."""
    rows = [("Google", "NNP", "I-ORG"), ("Percy", "NNP", "I-PER")]
    feats = classify.extract_span_features(rows, 1, 1, type_proportion=0.0)
    assert not any("I-ORG" in f for f in feats)
    assert any(f.startswith("a:") for f in feats)


def test_calc_ngrams_short_sequence_fallback():
    """calculateNgrams:383-401 — n longer than the sequence falls back
    to one full-length gram; empty sequences yield nothing."""
    assert classify._calc_ngrams(3, ["a", "b"], "x:") == ["x:a,b"]
    assert classify._calc_ngrams(2, ["a", "b", "c"], "") == ["a,b", "b,c"]
    assert classify._calc_ngrams(1, [], "x:") == []


def test_fit_maxent_separable():
    """The shared trainer drives training loss to the argmax on a
    linearly separable toy problem."""
    np = __import__("numpy")
    x = np.array([[1, 0], [0.9, 0.1], [0, 1], [0.2, 0.8]], dtype=np.float32)
    y = np.array([0, 0, 1, 1])
    w, b = classify.fit_maxent(x, y, 2, epochs=200)
    assert ((x @ w + b).argmax(axis=1) == y).all()


def test_training_pairs_skew_guard(spark):
    """Hot-class thinning (VERDICT r3 item 3): when one class's pair
    count exceeds 4x the per-class cap, a deterministic hash filter
    bounds the row_number window's input; under the threshold the
    output is identical to the unthinned ordering."""
    kb = synth_kb(spark, n_instances=400)

    # under-threshold: every class below 4x cap -> exactly the full
    # distinct pair set (thinning is a no-op, byte-identical semantics)
    full = classify.training_pairs(kb, sample_per_class=100000)
    types = kb.relations.filter(F.col("p") == kb.rdf_type_id).select(
        "s", F.col("o").alias("cls")
    )
    lits = kb.symbols.join(
        kb.literals.withColumnRenamed("id", "lit"), "lit"
    ).select("s", "literal")
    expected = lits.join(types, "s").select("literal", "cls").distinct()
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, expected.collect()))

    # oversized classes: cap honored, deterministic across runs, and
    # output is a subset of the full pair set ordered by literal
    capped1 = classify.training_pairs(kb, sample_per_class=5)
    capped2 = classify.training_pairs(kb, sample_per_class=5)
    rows1 = sorted(map(tuple, capped1.collect()))
    rows2 = sorted(map(tuple, capped2.collect()))
    assert rows1 == rows2
    per_class = capped1.groupBy("cls").count().collect()
    assert all(r["count"] <= 5 for r in per_class)
    assert len(per_class) == 5  # thinning never starves a class
    assert set(rows1) <= set(map(tuple, expected.collect()))

    # plan shape: the hash filter must sit BELOW the row_number window
    # (the whole point — the window's single-task sort sees the thinned
    # input, not the hot class's full pair set). Simple explain prints
    # parents above children, so Window must appear before pmod.
    plan = capped1._jdf.queryExecution().executedPlan().toString()
    assert "pmod" in plan and "Window" in plan
    assert plan.index("Window") < plan.index("pmod")
