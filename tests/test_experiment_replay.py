"""ScoobieExperiment.testSystem replay on the reference's bundled
wikinews corpus — frozen end-to-end metrics (experiments.py)."""

import os

import pytest
from pyspark.sql import functions as F

from scoobie_spark import experiments as E

_ZIP = "/root/reference/corpora/wikinews/wikinews_text_labels.zip"

needs_corpus = pytest.mark.skipif(
    not os.path.exists(_ZIP), reason="reference wikinews corpus not present"
)


@needs_corpus
def test_zip_corpus_reader(spark):
    """TextCorpus.getEntries parity: one row per non-directory member."""
    corpus = E.read_zip_corpus(spark, _ZIP)
    rows = corpus.collect()
    assert len(rows) == 99  # 100 entries − 1 directory
    assert all(r["content"] for r in rows)
    assert any("LulzSec" in r["uri"] for r in rows)


@needs_corpus
def test_wikinews_ground_truth(spark):
    """WikinewsCorpus.extractLabels parity: quote-delimited dbpedia
    URIs, \\w+-segment only (Madison,_Wisconsin is NOT ground truth),
    lowercased."""
    corpus = E.read_zip_corpus(spark, _ZIP)
    gt = E.ground_truth(corpus)
    uris = {r["gt_uri"] for r in gt.collect()}
    assert "http://dbpedia.org/resource/sony" in uris
    assert all(u == u.lower() for u in uris)
    assert not any("," in u for u in uris)
    assert gt.count() == 893


@needs_corpus
def test_scoobie_experiment_frozen_metrics(spark):
    """The full replay: zip corpus → anchor KB through A2-A9 → flagship
    pipeline → recognized lists → calcPrecRecF1@1000. Deterministic, so
    the corpus means are frozen exactly (rounded to 3 decimals):
    P 0.703, R 0.875, F1 0.767 over 99 docs. Precision < 1 is the
    corpus-wide anchor dictionary firing on unlinked mentions; recall
    misses are case/markup variants — both effects the reference's
    DBpedia deployment shows too."""
    res = E.scoobie_experiment(spark, _ZIP).cache()
    agg = res.agg(
        F.round(F.avg("precision"), 3).alias("p"),
        F.round(F.avg("recall"), 3).alias("r"),
        F.round(F.avg("f1"), 3).alias("f1"),
        F.count("*").alias("docs"),
    ).first()
    assert agg["docs"] == 99
    assert agg["p"] == pytest.approx(0.703, abs=0.002)
    assert agg["r"] == pytest.approx(0.875, abs=0.002)
    assert agg["f1"] == pytest.approx(0.767, abs=0.002)
    # every document participates and none scores a degenerate denominator
    assert res.filter(F.col("n_gt") <= 0).count() == 0


@needs_corpus
def test_prf_at_k_truncates_ranked_tail(spark):
    """calcPrecRecF1's @k truncation must cut the lowest-RATED tail of
    each doc's list, not an alphabetical prefix: at k=1 every doc
    reports exactly its top-rated URI."""
    res1 = E.scoobie_experiment(spark, _ZIP, k=1).cache()
    assert res1.filter(F.col("n_found") > 1).count() == 0
    assert res1.filter(F.col("n_found") == 1).count() > 90
    # frozen: capacity-rated P@1 measures 0.4545 on this corpus —
    # deterministic, and (interestingly) BELOW the @1000 set precision:
    # the capacity metric favors long labels, not ground-truth-ness
    p1 = res1.agg(F.avg("precision")).first()[0]
    assert p1 == pytest.approx(0.4545, abs=0.002)


# ---------------------------------------------------------------------------
# PredictTypesOnConll2003Experiment replay
# ---------------------------------------------------------------------------

_C03 = "/root/reference/corpora/conll2003"

needs_conll2003 = pytest.mark.skipif(
    not os.path.exists(f"{_C03}/eng.testa.zip"),
    reason="reference conll2003 corpus not present",
)


@needs_conll2003
def test_conll2003_reader_and_spans():
    """LabeledTextCorpus span accumulation: consecutive non-O tokens
    form ONE example labeled by the first token's tag, flushed on the
    following O token."""
    # the author's testa file ships with NO blank separator lines, so the
    # reference reader (toFeatureFormat:184-191 breaks only on empty
    # lines) sees ONE giant sentence — parity preserved here
    sents = E.read_conll2003(f"{_C03}/eng.testa.zip")
    assert len(sents) == 1
    assert len(E.read_conll2003(f"{_C03}/eng.train.zip")) > 10000
    ex = E.conll2003_examples(sents)
    assert len(ex) == 1734  # frozen: spans followed by an O token
    # testa carries the author's numeric KB type ids in the NER column
    assert all(l.isdigit() for l, _ in ex)
    assert all(f for _, f in ex)


@needs_conll2003
def test_predict_types_conll2003_frozen():
    """trainClassifierOnConLLData protocol, real held-out form (train
    testa → test testb over the shared 10 KB-type classes). Seeded and
    full-batch, so the metrics freeze exactly: accuracy 0.4229 vs a
    0.4202 majority baseline — the fine-grained KB-id task is barely
    learnable from 1734 spans, matching the reference experiment's
    motivation for KB-literal (not corpus) training."""
    res = E.predict_types_conll2003(
        f"{_C03}/eng.testa.zip", test_path=f"{_C03}/eng.testb.zip"
    )
    assert res["n_train"] == 1734
    assert res["n_test"] == 1835
    assert res["accuracy"] == pytest.approx(0.4229, abs=0.003)
    assert res["accuracy"] >= res["majority_baseline"]
    assert set(res["classes"]) <= {l for l, _ in E.conll2003_examples(
        E.read_conll2003(f"{_C03}/eng.testa.zip"))}


# ---------------------------------------------------------------------------
# InstanceRecognitionExperiment replay (wikipedia corpus)
# ---------------------------------------------------------------------------

_WP = "/root/reference/corpora/wikipedia"

needs_wikipedia = pytest.mark.skipif(
    not os.path.exists(f"{_WP}/wikipedia_text.zip"),
    reason="reference wikipedia corpus not present",
)


@needs_wikipedia
def test_instance_recognition_wikipedia_frozen(spark):
    """testWikipediaCorpus replay: real DBpedia N-Triples label dumps
    through the A1-A9 zip/Turtle ingestion as the KB, full
    spot+link+disambiguate, per-doc SET P/R of resolved instance URIs
    (InstanceRecognition.compare — no ranking, no lowercasing).
    Deterministic, so the corpus means freeze exactly: P 0.6314 /
    R 0.9458 / F1 0.7442 over 209 docs (3707 GT uris, 5247 found).
    High recall = the KB carries every GT label; the precision gap is
    the corpus-wide dictionary firing on other docs' labels — the same
    behavior the reference's full-DBpedia deployment exhibits."""
    res = E.instance_recognition_experiment(
        spark, f"{_WP}/wikipedia_text.zip", f"{_WP}/wikipedia_labels.zip"
    ).cache()
    agg = res.agg(
        F.round(F.avg("precision"), 4).alias("p"),
        F.round(F.avg("recall"), 4).alias("r"),
        F.round(F.avg("f1"), 4).alias("f1"),
        F.count("*").alias("docs"),
        F.sum("n_gt").alias("n_gt"),
        F.sum("n_found").alias("n_found"),
    ).first()
    assert agg["docs"] == 209
    assert agg["n_gt"] == 3707
    assert agg["n_found"] == 5247
    assert agg["p"] == pytest.approx(0.6314, abs=0.002)
    assert agg["r"] == pytest.approx(0.9458, abs=0.002)
    assert agg["f1"] == pytest.approx(0.7442, abs=0.002)
    # every doc has labels and none scores a degenerate denominator
    assert res.filter(F.col("n_gt") <= 0).count() == 0


@needs_wikipedia
def test_disambiguation_experiment_frozen(spark):
    """DisambiguationExperiment replay over the wikipedia corpus: the
    eight graph resolvers compared with EntityDisambiguation.compare's
    ambiguous-set protocol. Precision pools to 1.0 by construction (the
    KB is built from the GT dumps, so every ambiguous candidate is GT
    somewhere in the corpus) — RECALL is the discriminating signal, and
    it freezes exactly: degree/pagerank/authority/hits2 resolve 56 of
    the 99 ambiguous GT uris, flow/hub/hits 53, random 52. Every graph
    resolver beats random, degree ties the eigenvector family — the
    reference experiment's published conclusion."""
    res = E.disambiguation_experiment(
        spark, f"{_WP}/wikipedia_text.zip", f"{_WP}/wikipedia_labels.zip"
    )
    by = {r["resolver"]: r for r in res}
    assert set(by) == {
        "degree", "flow", "pagerank", "hub", "authority", "hits", "hits2", "random"
    }
    assert all(r["n_gt"] == 99 for r in res)
    assert all(r["precision"] == 1.0 for r in res)
    assert by["degree"]["n_found"] == 56
    assert by["pagerank"]["n_found"] == 56
    assert by["authority"]["n_found"] == 56
    assert by["hits2"]["n_found"] == 56
    assert by["flow"]["n_found"] == 53
    assert by["hub"]["n_found"] == 53
    assert by["hits"]["n_found"] == 53
    assert by["random"]["n_found"] == 52
    assert all(r["recall"] > by["random"]["recall"] or r["resolver"] == "random"
               for r in res)


# ---------------------------------------------------------------------------
# InstanceRecognitionExperiment replay (gutenberg corpus)
# ---------------------------------------------------------------------------

_GB = "/root/reference/corpora/gutenberg/gutenberg_text_labels.zip"


@pytest.mark.skipif(
    not os.path.exists(_GB), reason="reference gutenberg corpus not present"
)
def test_gutenberg_experiment_frozen(spark):
    """testGutenbergCorpus replay: 13 anchor-labeled book chapters,
    /page/→/resource/ GT rewrite, anchor-derived KB, per-doc set P/R.
    Frozen: P 0.8117 / R 0.9682 / F1 0.8746 (174 GT uris, 206 found).
    Higher precision than wikinews/wikipedia — book chapters share far
    fewer cross-document entities, so the corpus-wide dictionary
    over-fires less."""
    res = E.gutenberg_experiment(spark, _GB).cache()
    agg = res.agg(
        F.round(F.avg("precision"), 4).alias("p"),
        F.round(F.avg("recall"), 4).alias("r"),
        F.round(F.avg("f1"), 4).alias("f1"),
        F.count("*").alias("docs"),
        F.sum("n_gt").alias("n_gt"),
        F.sum("n_found").alias("n_found"),
    ).first()
    assert agg["docs"] == 13
    assert agg["n_gt"] == 174
    assert agg["n_found"] == 206
    assert agg["p"] == pytest.approx(0.8117, abs=0.002)
    assert agg["r"] == pytest.approx(0.9682, abs=0.002)
    assert agg["f1"] == pytest.approx(0.8746, abs=0.002)
    # the /page/ rewrite reached both GT and KB: no /page/ uris anywhere
    assert res.count() == 13


# ---------------------------------------------------------------------------
# ProperNameExperiment replay (bbc_nature corpus)
# ---------------------------------------------------------------------------

_BBC = "/root/reference/corpora/bbc_nature/bbc_nature_labels.zip"


@pytest.mark.skipif(
    not os.path.exists(_BBC), reason="reference bbc_nature corpus not present"
)
def test_proper_name_experiment_frozen(spark):
    """testOnBBCNature replay: the full A14+A15 statistics layer over
    the real 1175-file RDF/XML wildlife dump (45k typed-node rdf:type
    triples, 38 wo:/po:/foaf: types). Frozen: 54 (cluster, property)
    rating rows over 36 rated clusters (of 37 avg-link clusters — one
    carries no symbols-bearing property); the reference's published
    finding reproduces — canonical naming properties out-rate
    descriptive ones (wo:commonName ~0.988 vs dc:description best ~0.056)."""
    pnr = E.proper_name_experiment(spark, _BBC).cache()
    assert pnr.count() == 54
    assert pnr.select("cluster").distinct().count() == 36

    # decode property ids and pool each property's best rating
    from scoobie_spark.kb.etl import build_kb_from_string_triples
    from scoobie_spark.kb.rdfio import parse_rdf_zip

    obj, dat = parse_rdf_zip(spark, _BBC, "rdfxml")
    kb = build_kb_from_string_triples(spark, obj, dat)
    best = {
        r["uri"]: r["best"]
        for r in pnr.join(
            kb.resources.select(F.col("id").alias("property"), "uri"), "property"
        )
        .groupBy("uri")
        .agg(F.max("rating").alias("best"))
        .collect()
    }
    wo = "http://purl.org/ontology/wo/"
    assert best[wo + "commonName"] == pytest.approx(0.9877, abs=0.002)
    assert best[wo + "scientificName"] == pytest.approx(0.9566, abs=0.002)
    assert best["http://www.w3.org/2000/01/rdf-schema#label"] == pytest.approx(
        0.6281, abs=0.002
    )
    # the experiment's conclusion: naming beats describing, with margin
    assert best["http://purl.org/dc/terms/description"] == pytest.approx(
        0.0558, abs=0.002
    )
    # idf defaults to the rating-neutral 1.0 (no text corpus bundled)
    assert pnr.filter(F.col("idf") != 1.0).count() == 0


# ---------------------------------------------------------------------------
# RelevanceRatingExperiment replay (wikinews corpus)
# ---------------------------------------------------------------------------


@needs_corpus
def test_relevance_rating_experiment_frozen(spark):
    """testWikinewsCorpus replay of RelevanceRating.compare: per-doc
    average precision of each of the nine metric-ranked subject lists
    vs the anchor ground truth, pooled to corpus MAP. Deterministic
    (random = the splitmix hash metric), so the per-metric MAPs freeze:
    idf 0.7562 > position 0.7181 > tf 0.7043 — the document-signal
    metrics beat every pure graph metric (degree family ~0.65), the
    experiment's published motivation for fusing corpus and graph
    signals. Set P/R are rank-independent and equal across metrics."""
    res = E.relevance_rating_experiment(
        spark, _ZIP
    ).cache()
    assert res.count() == 891  # 99 docs x 9 metrics
    maps = {
        r["metric"]: r["map"]
        for r in res.groupBy("metric")
        .agg(F.round(F.avg("ap"), 4).alias("map"))
        .collect()
    }
    assert len(maps) == 9
    assert maps["idf"] == pytest.approx(0.7562, abs=0.002)
    assert maps["position"] == pytest.approx(0.7181, abs=0.002)
    assert maps["tf"] == pytest.approx(0.7043, abs=0.002)
    assert maps["capacity"] == pytest.approx(0.6476, abs=0.002)
    assert maps["degree"] == pytest.approx(0.6536, abs=0.002)
    # document-signal metrics out-rank every pure graph metric
    for doc_m in ("idf", "position", "tf"):
        for graph_m in ("degree", "capacity", "pagerank", "authority", "hub"):
            assert maps[doc_m] > maps[graph_m]
    # P/R are set-level: identical for every metric of a doc
    assert (
        res.groupBy("uri").agg(F.countDistinct("precision").alias("n"))
        .filter(F.col("n") > 1).count() == 0
    )


@pytest.mark.skipif(
    not os.path.exists(_BBC), reason="reference bbc_nature corpus not present"
)
def test_cluster_types_experiment_frozen(spark):
    """testHierarchicalClusteringBBCNature replay with the reference's
    countSamples=10: the clustering's purpose — merging correlated /
    synonymous classes — reproduces on the real ontology. Frozen: 38
    types → 37 clusters; the single merge is the wo:Ecozone/wo:Ecozones
    synonym pair (the only double-typed instances in the dump); every
    other class is a singleton."""
    cl = E.cluster_types_experiment(spark, _BBC).cache()
    assert cl.count() == 38
    assert cl.select("cluster").distinct().count() == 37
    merged = (
        cl.groupBy("cluster")
        .agg(F.collect_set("type_uri").alias("uris"), F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .collect()
    )
    assert len(merged) == 1
    assert sorted(u.rsplit("/", 1)[-1] for u in merged[0]["uris"]) == [
        "Ecozone", "Ecozones"
    ]


@pytest.mark.skipif(
    not os.path.exists(_BBC), reason="reference bbc_nature corpus not present"
)
def test_predict_types_experiment_frozen(spark):
    """PredictTypesExperiment replay on the real wildlife KB: the B14
    maxent trained on (literal → rdf:type) pairs from the bbc_nature
    dump. Deterministic hash split + seeded full-batch training, so the
    metrics freeze: 0.6788 held-out accuracy over 37 classes vs a
    0.3681 majority baseline — scientific/common-name shapes genuinely
    predict the wildlife type, the experiment's training rationale."""
    res = E.predict_types_experiment(spark, _BBC)
    assert res["n_classes"] == 37
    assert res["n_train"] == 9088
    assert res["n_test"] == 2285
    assert res["accuracy"] == pytest.approx(0.6788, abs=0.003)
    assert res["majority_baseline"] == pytest.approx(0.3681, abs=0.003)
    assert res["accuracy"] > res["majority_baseline"] + 0.25


@pytest.mark.skipif(
    not os.path.exists(_BBC), reason="reference bbc_nature corpus not present"
)
def test_fact_recommendation_experiment_frozen(spark):
    """FactRecommendationExperiment replay: A12 cardinalities + A13
    markov chain (sample=100) on the real wildlife KB, then per-doc
    leave-one-out CF recommendation over each dump member's KB
    neighborhood. Deterministic (sorted-holdout cap of 5/doc), so the
    corpus metrics freeze: the recommender recovers 37.7% of held-out
    facts; fallout is huge (~3028 extra predictions per holdout) — the
    unfiltered flood that motivates the reference's markov-probability
    scoring of recommendations."""
    res = E.fact_recommendation_experiment(spark, _BBC)
    assert res["docs"] == 1175
    assert res["n_eval"] == 5845
    assert res["accuracy"] == pytest.approx(0.3767, abs=0.003)
    assert res["fallout"] == pytest.approx(3027.66, rel=0.01)
    assert res["n_subject_cardinalities"] == 28
    assert res["n_markov_rows"] == 218


# ---------------------------------------------------------------------------
# PhraseExperiment.analyseTokenPhraseFrequencies — reuters leg
# (PhraseExperiment.java:165-260)
# ---------------------------------------------------------------------------

_REUTERS = "/root/reference/corpora/reuters/reuters.zip"


@pytest.mark.skipif(
    not os.path.exists(_REUTERS), reason="reference reuters corpus not present"
)
def test_phrase_frequency_reuters_frozen(spark):
    """The five token_phrase_frequency_reuters.csv columns over the full
    bundled corpus (1471 docs) with the trained conll2000 chunker.
    Frozen (scripts/reuters_phrase_frequency.py): 415498 tokens,
    115894 NPs, 251172 tokens inside NPs — i.e. the reference's
    motivating observation that NP tokens are a ~0.62 fraction of all
    tokens and carry ~0.73 of the vocabulary."""
    from pyspark.sql import functions as F

    freq = E.phrase_frequency_experiment(spark, _REUTERS)
    t = freq.agg(
        F.count("*").alias("docs"),
        F.sum("tokens").alias("tokens"),
        F.sum("noun_phrases").alias("nps"),
        F.sum("tokens_in_nps").alias("in_nps"),
        F.avg(F.col("tokens_in_nps") / F.col("tokens")).alias("tok_ratio"),
        F.avg(
            F.col("distinct_tokens_in_nps") / F.col("distinct_tokens")
        ).alias("vocab_ratio"),
    ).first()
    assert t["docs"] == 1471
    assert t["tokens"] == 415498
    assert t["nps"] == 115894
    assert t["in_nps"] == 251172
    assert abs(t["tok_ratio"] - 0.6209) < 1e-3
    assert abs(t["vocab_ratio"] - 0.7302) < 1e-3
