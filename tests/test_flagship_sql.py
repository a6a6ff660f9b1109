"""The flagship SQL twin (flagship_sql.py) must replay the FULL
pipeline value-for-value: same triples, same chained-xxhash64 doc ids,
same filter and disambiguation decisions — for the degree default AND
the iterative/hash resolver variants (the trickiest score replays).

The driver's check_oracles harness runs the same comparison at sf0.01;
this test pins it at sf0.001 inside the suite so a regression in either
side (or in DuckDB UNION semantics inside WITH RECURSIVE — see the
gnodes note in flagship_sql.py) fails fast.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from scoobie_spark.flagship_sql import flagship_oracle_sql

SF = "/root/testdata/sf0.001"

# skip (not error) on checkouts without the driver-generated parquet —
# same guard as test_oracles_sql.needs_testdata
pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(SF, "documents.parquet")),
    reason="driver testdata not present",
)


def _duck_rows(resolver: str):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    return sorted(map(tuple, con.sql(flagship_oracle_sql(resolver=resolver)).fetchall()))


@pytest.mark.parametrize("resolver", ["degree", "hits", "random"])
def test_flagship_sql_twin_matches_pipeline(spark, resolver):
    from scoobie_spark.fixtures import synth_corpus, synth_kb
    from scoobie_spark.pipeline import PipelineConfig, extract_triples

    corpus = synth_corpus(
        spark, docs=spark.read.parquet(f"{SF}/documents.parquet"), n_instances=200
    )
    kb = synth_kb(spark, n_instances=200)
    t = extract_triples(
        spark, corpus, kb, PipelineConfig(materialize_kb=False, resolver=resolver)
    )
    srows = sorted(tuple(r) for r in t.collect())
    assert len(srows) > 2000
    assert srows == _duck_rows(resolver)


def test_micro_rdfa_sql_twin(spark):
    """The B26 RDFa twin must reproduce the markup byte for byte —
    span order, greedy overlap drop, html escaping, and the untouched
    no-mention documents."""
    import duckdb as _duck

    from scoobie_spark.flagship_sql import micro_rdfa_oracle_sql
    from scoobie_spark.queries import q_micro_rdfa

    drows = sorted(map(tuple, _duck.sql(micro_rdfa_oracle_sql()).fetchall()))
    srows = sorted(tuple(r) for r in q_micro_rdfa(spark, SF).collect())
    assert len(srows) == 6
    assert srows == drows


def test_resolvers_actually_disagree():
    """The synthetic corpus plants ambiguity (~10% shared labels), so
    different resolvers must pick different winners somewhere — the
    guard against the round-3 situation where the resolver queries ran
    on a fixture with no ambiguous component and every strategy was
    vacuously identical."""
    by = {r: set(_duck_rows(r)) for r in ["degree", "pagerank", "hits", "random"]}
    assert any(by["degree"] != v for k, v in by.items() if k != "degree")
