"""B23 complete metric set + fusion sweep
(RelevanceRatingExperiment.java:168-204 protocol)."""

import pytest
from pyspark.sql import functions as F

from scoobie_spark import rating
from scoobie_spark.evaluate import mean_average_precision

from test_resolvers import _ambiguous_docs, _ambiguous_kb


@pytest.fixture(scope="module")
def fixture(spark):
    """Resolved candidate table + docs for the rating layer, from the
    planted-ambiguity KB (Big wins the degree resolution)."""
    from scoobie_spark import linking, textproc
    from scoobie_spark.spotting import spot

    kb, big, small, uid, lid = _ambiguous_kb(spark)
    docs = textproc.with_doc_id(_ambiguous_docs(spark))
    kb_prefixes = [r[0] for r in kb.literals.select("prefix").distinct().collect()]
    mentions = spot(textproc.suffix_candidates(docs, kb_prefixes), kb.gazetteer())
    cand = linking.resolve_instances(mentions, kb)
    resolved = linking.disambiguate(cand, kb, "degree").cache()
    return kb, docs.select("doc_id", F.col("content")), resolved, big


def test_all_nine_metrics_materialize(spark, fixture):
    kb, docs, resolved, big = fixture
    wide = rating.metric_table(resolved, kb, docs, rating.ALL_METRICS)
    assert set(rating.ALL_METRICS) <= set(wide.columns)
    rows = wide.collect()
    assert rows
    for r in rows:
        for m in rating.ALL_METRICS:
            assert r[m] is not None
        assert 0.0 <= r["random"] < 1.0


def test_graph_rank_scores_orders_by_connectivity(spark, fixture):
    kb, docs, resolved, big = fixture
    ranks = {r["subject"]: r for r in rating.graph_rank_scores(resolved, kb).collect()}
    assert big in ranks
    # Big took 6 in-edges in the KB → top authority and pagerank among
    # all resolved subjects of the doc
    best_auth = max(ranks.values(), key=lambda r: r["authority"])["subject"]
    best_pr = max(ranks.values(), key=lambda r: r["pagerank"])["subject"]
    assert best_auth == big
    assert best_pr == big


def test_fusion_sweep_matches_manual_product(spark, fixture):
    kb, docs, resolved, big = fixture
    subset = ("capacity", "position", "tf")
    sweep = rating.fusion_sweep(resolved, kb, docs, subsets=[subset])
    manual = rating.relevance_scores(resolved, kb, docs, metrics=list(subset))
    got = {
        (r["doc_id"], r["subject"]): r["score"] for r in sweep.collect()
    }
    want = {
        (r["doc_id"], r["subject"]): r["score"] for r in manual.collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9), k


def test_default_sweep_enumerates_all_bitmasks(spark, fixture):
    # 2^9 bitmasks, size>1 kept → 502 subsets
    subsets = rating.default_sweep_subsets()
    assert len(subsets) == 2**9 - 9 - 1
    kb, docs, resolved, big = fixture
    sweep = rating.fusion_sweep(resolved, kb, docs).cache()
    assert sweep.select("subset_id").distinct().count() == len(subsets)
    # every (subset, doc, subject) cell scored exactly once
    n_subj = resolved.select("doc_id", "subject").distinct().count()
    assert sweep.count() == len(subsets) * n_subj


def test_sweep_map_protocol(spark, fixture):
    """The experiment's evaluation step: MAP per fused subset against
    ground truth. The planted truth (Big) is the best-connected subject,
    so graph-metric subsets must rank it first → MAP 1.0."""
    kb, docs, resolved, big = fixture
    doc_id = resolved.select("doc_id").first()["doc_id"]
    truth = spark.createDataFrame([(doc_id, big)], "doc_id long, subject long")
    sweep = rating.fusion_sweep(
        resolved, kb, docs, subsets=[("authority", "pagerank"), ("random", "tf")]
    ).cache()
    m1 = mean_average_precision(sweep.filter(F.col("subset_id") == 0), truth)
    assert m1 == 1.0
    m2 = mean_average_precision(sweep.filter(F.col("subset_id") == 1), truth)
    assert 0.0 <= m2 <= 1.0


def test_graph_rank_scores_no_per_group_arrow(spark, fixture):
    """graph_rank_scores must run through grouped_apply (one doc_id
    repartition + mapInPandas) — groupBy().applyInPandas would pay the
    per-tiny-group Arrow round trip at millions of doc graphs. The plan
    shows MapInPandas, never FlatMapGroupsInPandas."""
    kb, docs, resolved, big = fixture
    scores = rating.graph_rank_scores(resolved, kb)
    plan = scores._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "FlatMapGroupsInPandas" not in plan
    assert "MapInPandas" in plan
