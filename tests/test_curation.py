"""Curation funnel (extras.curation) stage-semantics test: a synthetic
corpus with exactly one casualty per stage. The value-for-value DuckDB
differential runs in test_oracles_sql (curation_funnel)."""

from __future__ import annotations

from scoobie_spark.extras import curation


def test_funnel_drops_one_doc_per_stage(spark):
    good = "the " + " ".join(f"w{i}" for i in range(30))
    near = "the " + " ".join(f"w{i}" for i in range(29)) + " CHANGED"
    rows = [
        (0, good),                                       # survives all
        (1, "der hund und die katze ist von mit für"),   # 1_lang
        (2, "the cat sat"),                              # 2_quality (<24 tokens)
        (3, "the " + "spam " * 40),                      # 3_repetition
        (4, good),                                       # 4_exact_dedup (copy of 0)
        (5, near),                                       # 5_near_dedup (0's near-copy)
        (6, "the " + " ".join(f"z{i}" for i in range(30))),  # survives all
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["stage"]: r["n_docs"] for r in curation.curation_funnel(docs).collect()}
    assert out == {
        "0_all": 7,
        "1_lang": 6,
        "2_quality": 5,
        "3_repetition": 4,
        "4_exact_dedup": 3,
        "5_near_dedup": 2,
    }
