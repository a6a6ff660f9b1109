"""A1-A9 ETL: cleansing parity, deterministic dictionaries, encode
round-trip (reference TestPostgresKB.java:56-183 round-trip assertions)."""

import pytest
from pyspark.sql import functions as F

from scoobie_spark.fixtures import (
    EX_INST,
    EX_ONT,
    RDF_TYPE,
    RDFS_LABEL,
    micro_kb,
)
from scoobie_spark.hashing import java_hash_prefix_py
from scoobie_spark.kb.etl import (
    build_kb_from_string_triples,
    cleanse_triples,
    parse_ntriples,
)


@pytest.fixture(scope="module")
def string_triples(spark):
    obj = spark.createDataFrame(
        [
            (EX_INST + "Percy_Jackson", EX_ONT + "livesIn", EX_INST + "Camp_Halfblood"),
            (EX_INST + "Percy_Jackson", RDF_TYPE, EX_ONT + "Person"),
            ("http://nullCamp_Halfblood", RDF_TYPE, EX_ONT + "Place"),
            # over-long URI → dropped (RDFTripleParser.java:205-215)
            ("http://example.org/" + "x" * 150, RDF_TYPE, EX_ONT + "Place"),
        ],
        "s string, p string, o string",
    )
    dat = spark.createDataFrame(
        [
            (EX_INST + "Percy_Jackson", RDFS_LABEL, "Percy Jackson"),
            ("http://nullCamp_Halfblood", RDFS_LABEL, "Camp Halfblood"),
            # literal cleansing: strip \n \t " and trim (RDFTripleParser.java:229-234)
            (EX_INST + "Percy_Jackson", RDFS_LABEL, ' Percy\t"Jackson"\n '),
            # too short / too long literals dropped
            (EX_INST + "Percy_Jackson", RDFS_LABEL, "P"),
            (EX_INST + "Percy_Jackson", RDFS_LABEL, "y" * 150),
        ],
        "s string, p string, literal string",
    )
    return obj, dat


def test_cleansing(spark, string_triples):
    obj, dat = string_triples
    obj_c, dat_c = cleanse_triples(obj, dat)
    assert obj_c.count() == 3
    lits = {r[0] for r in dat_c.select("literal").collect()}
    assert lits == {"Percy Jackson", "Camp Halfblood", "PercyJackson"}


def test_build_kb_round_trip(spark, string_triples):
    obj, dat = string_triples
    kb = build_kb_from_string_triples(spark, obj, dat)

    # dictionary ids are dense, deterministic (sorted by uri/literal)
    uris = [r["uri"] for r in kb.resources.orderBy("id").collect()]
    assert uris == sorted(uris)
    ids = [r["id"] for r in kb.resources.orderBy("id").collect()]
    assert ids == list(range(len(ids)))

    # prefix = java hash of lowercased 4-char prefix
    for r in kb.literals.collect():
        assert r["prefix"] == java_hash_prefix_py(r["literal"].lower()[:4])

    # encode → decode round-trip reproduces the cleansed string triples
    r = kb.resources
    decoded = (
        kb.relations.join(r.withColumnRenamed("id", "s").withColumnRenamed("uri", "su"), "s")
        .join(r.withColumnRenamed("id", "p").withColumnRenamed("uri", "pu"), "p")
        .join(r.withColumnRenamed("id", "o").withColumnRenamed("uri", "ou"), "o")
        .select("su", "pu", "ou")
    )
    got = {tuple(x) for x in decoded.collect()}
    obj_c, _ = cleanse_triples(obj, dat)
    assert got == {tuple(x) for x in obj_c.collect()}

    # symbols belief=1.0 (PostgresKB.java:1164-1175)
    assert all(r["belief"] == 1.0 for r in kb.symbols.collect())


def test_micro_kb_matches_testdb_shape(spark):
    kb = micro_kb(spark)
    assert kb.resources.count() == 8
    assert kb.literals.count() == 2
    assert kb.relations.count() == 3
    assert kb.symbols.count() == 2
    assert kb.rdf_type_id == 6
    # gazetteer join shape (PostgresKB.getDatatypePropertyValues)
    gaz = {(r["literal"], r["prop_id"]) for r in kb.gazetteer().collect()}
    assert gaz == {("Camp Halfblood", 7), ("Percy Jackson", 7)}


def test_parse_ntriples(spark, tmp_path):
    nt = tmp_path / "dump.nt"
    nt.write_text(
        '<http://a> <http://p> <http://b> .\n'
        '<http://a> <http://www.w3.org/2000/01/rdf-schema#label> "A \\"quoted\\" thing" .\n'
        '<http://a> <http://label> "typed"^^<http://www.w3.org/2001/XMLSchema#string> .\n'
        '<http://a> <http://label> "lang"@en .\n'
        "# a comment line\n"
        "malformed line\n"
    )
    obj, dat = parse_ntriples(spark, str(nt))
    assert [tuple(r) for r in obj.collect()] == [("http://a", "http://p", "http://b")]
    lits = {r["literal"] for r in dat.collect()}
    assert lits == {'A "quoted" thing', "typed", "lang"}


def test_parse_ntriples_control_escapes(spark, tmp_path):
    r"""\n \t \r decode to the CONTROL characters (which cleansing then
    strips), never to the letters n/t/r; \\n is backslash+n. Must match
    rdfio._unescape exactly — the zip-container path uses it."""
    from scoobie_spark.kb.etl import cleanse_triples
    from scoobie_spark.kb.rdfio import _unescape

    raws = [r"Rock\nRoll", r"a\tb", r"cr\rlf", r"keep\\nme", r"back\\slash"]
    nt = tmp_path / "esc.nt"
    nt.write_text(
        "".join(f'<http://s{i}> <http://p> "{raw}" .\n' for i, raw in enumerate(raws))
    )
    obj, dat = parse_ntriples(spark, str(nt))
    got = {r["s"]: r["literal"] for r in dat.collect()}
    assert got == {f"http://s{i}": _unescape(raw) for i, raw in enumerate(raws)}
    assert got["http://s0"] == "Rock\nRoll"
    assert got["http://s3"] == "keep\\nme"  # escaped backslash, then letter n
    # after cleansing, the reference strips the control chars entirely:
    # "Rock\nRoll" → "RockRoll" (NOT "RocknRoll")
    _, dat_c = cleanse_triples(obj, dat)
    cleansed = {r["s"]: r["literal"] for r in dat_c.collect()}
    assert cleansed["http://s0"] == "RockRoll"
    assert cleansed["http://s1"] == "ab"


def test_fix_uri_percent_encoding(spark):
    """A2 fixJavaURI parity (RDFTripleParser.java:256-273): URI-invalid
    chars percent-encoded, valid URIs untouched."""
    from scoobie_spark.kb.etl import cleanse_triples

    obj = spark.createDataFrame(
        [
            ("http://a/with space", "http://p", "http://b{x}"),
            ("http://clean", "http://p", "http://also|bad"),
        ],
        "s string, p string, o string",
    )
    dat = spark.createDataFrame([], "s string, p string, literal string")
    obj_c, _ = cleanse_triples(obj, dat)
    rows = {tuple(r) for r in obj_c.collect()}
    assert rows == {
        ("http://a/with%20space", "http://p", "http://b%7Bx%7D"),
        ("http://clean", "http://p", "http://also%7Cbad"),
    }


def test_uri_length_checked_on_raw_before_encoding(spark):
    """RDFTripleParser.java:205-240 parity: the 120-char limit applies
    to the RAW URI; a URI near the limit that percent-encodes past it
    is still kept (and '[' ']' are in the bad-char map)."""
    from scoobie_spark.kb.etl import MAX_URI_LEN, cleanse_triples

    near = "http://x/" + "a" * (MAX_URI_LEN - 9 - 4) + " b c"   # raw 120
    over = "http://x/" + "a" * (MAX_URI_LEN - 8)                # raw 121
    assert len(near) == MAX_URI_LEN and len(over) == MAX_URI_LEN + 1
    obj = spark.createDataFrame(
        [(near, "http://p", "http://o[1]"), (over, "http://p", "http://o")],
        "s string, p string, o string",
    )
    dat = spark.createDataFrame([], "s string, p string, literal string")
    obj_c, _ = cleanse_triples(obj, dat)
    rows = {tuple(r) for r in obj_c.collect()}
    assert rows == {
        (near.replace(" ", "%20"), "http://p", "http://o%5B1%5D"),
    }


def test_bucketed_kb_layout_skips_shuffle(spark, tmp_path):
    """A10: the bucketed saveAsTable layout is a real index — a join
    probing `relations` on its bucket key (s) shuffles ONLY the probe
    side; the bucketed scan itself has no Exchange above it."""
    from pyspark.sql import functions as F

    from scoobie_spark.fixtures import synth_kb
    from scoobie_spark.kb.model import KB

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        kb = synth_kb(spark, 100)
        kb.write_bucketed(prefix="tkb_test", buckets=4)
        kb2 = KB.read_bucketed(spark, "tkb_test")
        probe = spark.range(1000).select((F.col("id") % 50).alias("s"), F.lit(1).alias("x"))
        j = kb2.relations.join(probe, "s")
        plan = j._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        assert "Bucketed: true" in plan
        # exactly ONE exchange node: the probe side
        import re

        assert len(re.findall(r"^\(\d+\) Exchange", plan, re.MULTILINE)) == 1, plan
        # and it still computes the right thing
        assert j.count() == probe.join(kb.relations, "s").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        for t in ("resources", "literals", "relations", "symbols"):
            spark.sql(f"DROP TABLE IF EXISTS tkb_test_{t}")
