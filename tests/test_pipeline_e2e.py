"""End-to-end micro-fixture parity: the P/R gate (FIXTURES.md §E).

The micro corpus replays the reference's frozen test KB
(scoobie/testdb.script) through the full B1-B25 pipeline and must
reproduce the golden triple set exactly (P = R = 1.0 ≥ 0.95 target).
"""

import pytest

from scoobie_spark.fixtures import MICRO_EXPECTED_TRIPLES, micro_docs, micro_kb
from scoobie_spark.pipeline import (
    PipelineConfig,
    Sha256MismatchError,
    extract_triples,
    precision_recall,
)


@pytest.fixture(scope="module")
def triples(spark):
    docs = micro_docs(spark)
    kb = micro_kb(spark)
    return extract_triples(spark, docs, kb).cache()


def test_micro_triple_set_exact(spark, triples):
    got = sorted(
        {
            (r["graph"], r["subj"], r["pred"], r["obj"])
            for r in triples.collect()
        }
    )
    assert got == MICRO_EXPECTED_TRIPLES


def test_micro_precision_recall(spark, triples):
    expected = spark.createDataFrame(
        MICRO_EXPECTED_TRIPLES, "graph string, subj string, pred string, obj string"
    )
    pr = precision_recall(triples, expected)
    assert pr["precision"] == 1.0
    assert pr["recall"] == 1.0


def test_sha256_invariant_enforced(spark):
    docs = micro_docs(spark)
    corrupted = docs.withColumn(
        "sha256",
        # flip the hash of one row
        __import__("pyspark").sql.functions.when(
            docs.path == "docs/percy.txt", "0" * 64
        ).otherwise(docs.sha256),
    )
    kb = micro_kb(spark)
    # the invariant is enforced inside the candidates Arrow pass; the
    # executor-side failure surfaces as a PythonException mentioning sha256
    with pytest.raises(Exception, match="sha256"):
        extract_triples(spark, corrupted, kb).collect()


def test_three_physical_paths_identical(spark, triples):
    """The fused broadcast-adjacency path (default), the fused edge-join
    path, and the staged spot→resolve→disambiguate path must emit the
    SAME triple set — they are physical strategies for one logical
    plan."""
    docs = micro_docs(spark)
    kb = micro_kb(spark)
    want = {tuple(r) for r in triples.select("graph", "subj", "pred", "obj").collect()}
    for cfg in (
        PipelineConfig(adjacency_max_rows=0),  # fused, edge-join cogroup
        PipelineConfig(fused=False),           # staged B8-B21
    ):
        got = {
            tuple(r)
            for r in extract_triples(spark, docs, kb, cfg)
            .select("graph", "subj", "pred", "obj")
            .collect()
        }
        assert got == want, f"path mismatch for {cfg}"


def test_checkpoint_resume(spark, tmp_path):
    """north_rule resumability: second run with the same checkpoint dir
    reuses stage outputs and produces the identical triple set."""
    docs = micro_docs(spark)
    kb = micro_kb(spark)
    cfg = PipelineConfig(checkpoint_dir=str(tmp_path))
    t1 = extract_triples(spark, docs, kb, cfg)
    rows1 = {tuple(r) for r in t1.select("graph", "subj", "pred", "obj").collect()}
    stages1 = [m["stage"] for m in cfg.metrics]
    assert "triples" in stages1 and "resolved" in stages1

    import os

    marker = tmp_path / "candidates" / "_SUCCESS"
    mtime1 = os.path.getmtime(marker)

    cfg2 = PipelineConfig(checkpoint_dir=str(tmp_path))
    t2 = extract_triples(spark, docs, kb, cfg2)
    rows2 = {tuple(r) for r in t2.select("graph", "subj", "pred", "obj").collect()}
    assert rows1 == rows2
    assert (tmp_path / "metrics.jsonl").exists()
    # stage output was REUSED, not recomputed (resume contract)
    assert os.path.getmtime(marker) == mtime1

    # partial failure: drop a later stage, keep 'candidates' → resume
    # recomputes only the missing stage
    import shutil

    shutil.rmtree(tmp_path / "resolved")
    t3 = extract_triples(spark, docs, kb, PipelineConfig(checkpoint_dir=str(tmp_path)))
    rows3 = {tuple(r) for r in t3.select("graph", "subj", "pred", "obj").collect()}
    assert rows3 == rows1
    assert os.path.getmtime(marker) == mtime1  # earlier stage still reused


def test_partition_lineage_opt_in(spark, tmp_path):
    """north_rule per-partition lineage: with partition_lineage=True the
    metrics log carries per-partition row counts + skew stats; the
    default run writes only stage/wall records (no extra scans)."""
    import json

    docs = micro_docs(spark)
    kb = micro_kb(spark)
    cfg = PipelineConfig(checkpoint_dir=str(tmp_path), partition_lineage=True)
    extract_triples(spark, docs, kb, cfg).collect()
    lines = [
        json.loads(l)
        for l in (tmp_path / "metrics.jsonl").read_text().splitlines()
    ]
    assert any("partition_rows" in rec for rec in lines)
    staged = [r for r in lines if "partition_skew" in r]
    assert staged
    for r in staged:
        assert r["rows"] == sum(
            next(
                x["partition_rows"]
                for x in lines
                if x.get("stage") == r["stage"] and "partition_rows" in x
            ).values()
        )


def test_adjacency_broadcast_memoized(spark):
    """Repeated pipeline runs over one KB (the streaming foreachBatch
    shape) must reuse ONE broadcast handle instead of re-shipping the
    adjacency blob every call."""
    from scoobie_spark import linking

    kb = micro_kb(spark)
    bc1 = linking.kb_adjacency_broadcast(kb)
    bc2 = linking.kb_adjacency_broadcast(kb)
    assert bc1 is bc2 and bc1 is not None and bc1.value
    # a different cap is a different cache entry, not a clobber
    assert linking.kb_adjacency_broadcast(kb, max_rows=0) is None
    assert linking.kb_adjacency_broadcast(kb) is bc1


def test_three_physical_paths_identical_with_template(spark):
    """Same cross-path contract with a SPARQL template engaged: the
    fused paths must apply the rdf:type filter AFTER the B10/B11 span
    filters (staged order) — an early semi-join would let a contained
    span survive when its container's subjects are typed out, making
    fused and staged emit different triples."""
    from scoobie_spark.fixtures import EX_ONT

    template = f"""
    PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
    PREFIX ex: <{EX_ONT}>
    SELECT * WHERE {{
      GRAPH <http://example#recognized> {{
        ?s rdfs:label ?l .
        ?s a ex:Person .
        ?s ex:livesIn ?place .
      }}
    }}
    """
    docs = micro_docs(spark)
    kb = micro_kb(spark)
    outs = []
    for cfg in (
        PipelineConfig(template=template),                        # fused, adjacency
        PipelineConfig(template=template, adjacency_max_rows=0),  # fused, edge-join
        PipelineConfig(template=template, fused=False),           # staged
    ):
        outs.append(
            {
                tuple(r)
                for r in extract_triples(spark, docs, kb, cfg)
                .select("graph", "subj", "pred", "obj")
                .collect()
            }
        )
    assert outs[0], "template run must extract something"
    assert outs[0] == outs[1] == outs[2]


def test_staged_path_survives_safe_arrow_conversion(spark):
    """The staged disambiguate() cogroup null-pads int columns to
    float64 inside Arrow batches that carry edge rows; _resolve_doc
    must restore ints rather than rely on Spark's unsafe float→int
    Arrow cast (convertToArrowArraySafely=false default). With the
    safety flag ON, the un-restored frame would crash the staged run."""
    key = "spark.sql.execution.pandas.convertToArrowArraySafely"
    old = spark.conf.get(key, "false")
    spark.conf.set(key, "true")
    try:
        docs = micro_docs(spark)
        kb = micro_kb(spark)
        got = {
            (r["graph"], r["subj"], r["pred"], r["obj"])
            for r in extract_triples(
                spark, docs, kb, PipelineConfig(fused=False)
            ).collect()
        }
        assert sorted(got) == MICRO_EXPECTED_TRIPLES
    finally:
        spark.conf.set(key, old)
