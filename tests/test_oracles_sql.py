"""Differential check of the round-4 derived SQL oracles.

These queries moved from rows-only to full value oracles by replaying
their deterministic hash/rule pipelines in DuckDB (VERDICT r3 item 2):
winnowing fingerprints, simhash near-pairs, the rule-path noun-phrase
counts, minhash-LSH pairs (xxhash64 re-implemented bit-for-bit in SQL,
scoobie_spark/xxh64_sql.py), the connected-component histogram over
the minhash pair graph, hash-plane (Rademacher) embedding LSH (FNV-1a
plane parities + sequential f64 folds replayed in SQL) and the FLAT
hash-quantizer IVF (hashInt centroid selection replayed in SQL). The
driver runs the same comparison at sf0.01; this test pins it locally
at sf0.001 so a drift in either side fails fast.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from scoobie_spark import queries as q

SF_DIR = "/root/testdata/sf0.001"

needs_testdata = pytest.mark.skipif(
    not os.path.exists(os.path.join(SF_DIR, "documents.parquet")),
    reason="driver testdata not present",
)


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.9g}"
    return str(v)


def _rows(df_rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_canon(r[i]) for i in order) for r in df_rows)


@needs_testdata
@pytest.mark.parametrize(
    "name",
    [
        "text_fingerprints",
        "dedup_simhash",
        "b6_noun_phrases",
        "dedup_minhash",
        "b17_components",
        "multimodal_features",
        "dedup_embedding_lsh",
        "ann_ivf_flat",
        "dedup_semantic",
        "curation_funnel",
        "domain_mix",
        "dedup_substrings",
        "b24_cf_eval",
        "quality_repetition",
        "sample_split",
        "pii_redact",
        "decontaminate",
        "b6_noun_phrases_trained",
        "token_phrase_frequency",
        "dedup_survivors",
        "dedup_segments",
        "dsir_select",
        "pack_chunks",
        "lm_quality",
        "code_quality",
        "license_detect",
        "dedup_incremental",
        "bpe_pairs",
        "call_graph",
        "api_usage",
        "repo_churn",
        "class_methods",
        "doc_coverage",
        "dep_reach",
    ],
)
def test_derived_oracle_matches(spark, name):
    if name not in q.oracle_sql():
        pytest.skip(f"{name} oracle unavailable (model artifacts absent)")
    sdf = q.queries()[name](spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    res = con.execute(q.oracle_sql()[name])
    oracle_cols = [d[0] for d in res.description]
    oracle_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(oracle_cols)
    assert len(spark_rows) == len(oracle_rows)
    assert _rows(spark_rows, spark_cols) == _rows(oracle_rows, oracle_cols)
