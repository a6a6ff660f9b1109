"""substring_dedup (extras.dedup) span-semantics tests. The DuckDB
value differential runs in test_oracles_sql (dedup_substrings)."""

from __future__ import annotations

from scoobie_spark.extras import dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_copy_is_one_full_span(spark):
    import random

    rng = random.Random(7)
    # random 26-letter text: no repeated 40-gram inside the base itself
    base = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(100))
    out = {
        r["doc_id"]: r
        for r in dedup.substring_dedup(
            _docs(spark, [(0, base), (1, base), (2, "x" * 5)]), k=40
        ).collect()
    }
    # doc 0 holds every first occurrence → clean
    assert out[0]["n_spans"] == 0 and out[0]["dup_chars"] == 0
    # doc 1: all 61 gram starts duplicated, merging into ONE span of 100
    assert out[1]["n_spans"] == 1 and out[1]["dup_chars"] == 100
    # doc 2 shorter than k → no grams, no spans
    assert out[2]["n_spans"] == 0 and out[2]["n_chars"] == 5


def test_two_separated_spans_do_not_merge(spark):
    import random

    rng = random.Random(5)
    rnd = lambda n: "".join(rng.choice("abcdefghij") for _ in range(n))  # noqa: E731
    shared1, shared2 = rnd(50), rnd(50)
    host = rnd(40) + shared1 + rnd(60) + shared2 + rnd(40)
    out = {
        r["doc_id"]: r
        for r in dedup.substring_dedup(
            _docs(spark, [(0, shared1 + " | " + shared2), (1, host)]), k=40
        ).collect()
    }
    # host repeats both 50-char blocks (first seen in doc 0) as two
    # islands separated by 60 random chars
    assert out[1]["n_spans"] == 2
    assert out[1]["dup_chars"] == 100
