"""A1 Turtle / RDF-XML ingestion round-trip.

``test_kb_roundtrip_ttl`` replays the reference's own KB fixtures
(``src/test/resources/.../connection/test1.ttl`` / ``test2.ttl``,
reproduced inline below) through the distributed parser + ETL and must
land EXACTLY on the frozen dictionary encoding of
``scoobie/testdb.script:31-45`` — ids, prefix hashes, relations,
symbols — mirroring TestPostgresKB.java:56-183's round-trip assertions.
"""

import pytest

from scoobie_spark.kb.etl import build_kb_from_dumps
from scoobie_spark.kb.rdfio import (
    parse_ntriples_text,
    parse_rdfxml_text,
    parse_turtle_text,
)

# reference fixture test1.ttl: all prefixes dot-terminated, one subject
TEST1_TTL = """\
@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix ex-ont: <http://example.org/ontology#> .
@prefix ex-ins: <http://example.org/instance#> .

ex-ins:Percy_Jackson\trdfs:label\t\t"Percy Jackson" ;
\t\t\t\t\t\ta\t\t\t\tex-ont:Person ;
\t\t\t\t\t\tex-ont:livesIn\tex-ins:Camp_Halfblood .
"""

# reference fixture test2.ttl: the LAST @prefix misses its terminating
# dot, so ex-ins: never registers and later names resolve against the
# null namespace — frozen as resource 5 'http://nullCamp_Halfblood'
# (testdb.script:38)
TEST2_TTL = """\
@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix ex-ont: <http://example.org/ontology#> .
@prefix ex-ins: <http://example.org/instance#>

ex-ins:Camp_Halfblood\trdfs:label\t\t"Camp Halfblood" ;
\t\t\t\t\t\ta\t\t\t\tex-ont:Place .
"""

# the frozen encoding (testdb.script:31-45). Literal prefix hashes: the
# frozen HSQL image stores ORIGINAL-case hashes (2092705/2483974 =
# hash('Camp')/hash('Perc')), but the ETL path we reimplement hashes the
# LOWERCASED literal (RDFTripleParser.java:295) → hash('camp')/
# hash('perc'); spotting probes both cases (SuffixArray.java:114-117) so
# join semantics are identical either way.
FROZEN_LITERALS = [(0, "Camp Halfblood", 3046017), (1, "Percy Jackson", 3437286)]
FROZEN_RESOURCES = [
    (0, "http://example.org/instance#Camp_Halfblood"),
    (1, "http://example.org/instance#Percy_Jackson"),
    (2, "http://example.org/ontology#Person"),
    (3, "http://example.org/ontology#Place"),
    (4, "http://example.org/ontology#livesIn"),
    (5, "http://nullCamp_Halfblood"),
    (6, "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"),
    (7, "http://www.w3.org/2000/01/rdf-schema#label"),
]
FROZEN_RELATIONS = {(1, 4, 0), (1, 6, 2), (5, 6, 3)}
FROZEN_SYMBOLS = {(1, 7, 1), (5, 7, 0)}


def test_parse_turtle_text_basic():
    t = parse_turtle_text(TEST1_TTL)
    assert (
        "http://example.org/instance#Percy_Jackson",
        "http://www.w3.org/2000/01/rdf-schema#label",
        None,
        "Percy Jackson",
    ) in t
    assert (
        "http://example.org/instance#Percy_Jackson",
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
        "http://example.org/ontology#Person",
        None,
    ) in t
    assert len(t) == 3


def test_parse_turtle_null_namespace_quirk():
    t = parse_turtle_text(TEST2_TTL)
    subjects = {s for s, *_ in t}
    assert subjects == {"http://nullCamp_Halfblood"}


def test_kb_roundtrip_ttl(spark, tmp_path):
    d = tmp_path / "dumps"
    d.mkdir()
    (d / "test1.ttl").write_text(TEST1_TTL)
    (d / "test2.ttl").write_text(TEST2_TTL)

    kb = build_kb_from_dumps(spark, str(d), fmt="turtle")

    res = sorted(tuple(r) for r in kb.resources.collect())
    assert res == FROZEN_RESOURCES
    lits = sorted(tuple(r) for r in kb.literals.collect())
    assert lits == FROZEN_LITERALS
    rel = {tuple(r) for r in kb.relations.collect()}
    assert rel == FROZEN_RELATIONS
    sym = {(r["s"], r["p"], r["lit"]) for r in kb.symbols.collect()}
    assert sym == FROZEN_SYMBOLS
    assert all(r["belief"] == 1.0 for r in kb.symbols.collect())

    # TestPostgresKB round-trip: uri -> id -> uri is the identity
    for rid, uri in FROZEN_RESOURCES:
        assert kb.uri_id(uri) == rid


def test_turtle_comma_object_lists(spark):
    t = parse_turtle_text(
        "@prefix ex: <http://e/> .\n"
        'ex:s ex:p ex:a , ex:b ; ex:q "x" , "y" .\n'
    )
    assert ("http://e/s", "http://e/p", "http://e/a", None) in t
    assert ("http://e/s", "http://e/p", "http://e/b", None) in t
    assert ("http://e/s", "http://e/q", None, "x") in t
    assert ("http://e/s", "http://e/q", None, "y") in t


def test_turtle_literal_datatype_and_lang_tags():
    t = parse_turtle_text(
        "@prefix ex: <http://e/> .\n"
        'ex:s ex:p "typed"^^<http://www.w3.org/2001/XMLSchema#string> ;\n'
        '     ex:p "tagged"@en ; ex:p "es\\"caped\\n" .\n'
    )
    lits = {lit for *_, lit in t}
    assert lits == {"typed", "tagged", 'es"caped\n'}


def test_parse_rdfxml_text():
    xml = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
         xmlns:ex="http://example.org/ontology#">
  <ex:Person rdf:about="http://example.org/instance#Percy_Jackson">
    <rdfs:label>Percy Jackson</rdfs:label>
    <ex:livesIn rdf:resource="http://example.org/instance#Camp_Halfblood"/>
  </ex:Person>
  <rdf:Description rdf:about="http://example.org/instance#Camp_Halfblood">
    <rdfs:label>Camp Halfblood</rdfs:label>
  </rdf:Description>
</rdf:RDF>"""
    t = parse_rdfxml_text(xml)
    assert (
        "http://example.org/instance#Percy_Jackson",
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
        "http://example.org/ontology#Person",
        None,
    ) in t
    assert (
        "http://example.org/instance#Percy_Jackson",
        "http://example.org/ontology#livesIn",
        "http://example.org/instance#Camp_Halfblood",
        None,
    ) in t
    assert (
        "http://example.org/instance#Camp_Halfblood",
        "http://www.w3.org/2000/01/rdf-schema#label",
        None,
        "Camp Halfblood",
    ) in t


def test_rdfxml_distributed_roundtrip(spark, tmp_path):
    d = tmp_path / "xml"
    d.mkdir()
    (d / "a.rdf").write_text(
        """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#">
  <rdf:Description rdf:about="http://a">
    <rdfs:label>Alpha Beta</rdfs:label>
  </rdf:Description>
</rdf:RDF>"""
    )
    kb = build_kb_from_dumps(spark, str(d), fmt="rdfxml")
    assert kb.symbols.count() == 1
    assert {r["literal"] for r in kb.literals.collect()} == {"Alpha Beta"}


def test_zip_container(spark, tmp_path):
    import zipfile

    z = tmp_path / "dump.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("test1.ttl", TEST1_TTL)
        zf.writestr("test2.ttl", TEST2_TTL)
    kb = build_kb_from_dumps(spark, str(z), fmt="turtle", zipped=True)
    assert sorted(tuple(r) for r in kb.resources.collect()) == FROZEN_RESOURCES


def test_zip_container_ntriples(spark, tmp_path):
    """zipped=True must parse N-Triples members, not silently feed the
    raw zip bytes to the line scanner (which would yield an empty KB)."""
    import zipfile

    nt = (
        '<http://e/s> <http://e/p> <http://e/o> .\n'
        '<http://e/s> <http://e/label> "Al\\"pha" .\n'
    )
    bare = tmp_path / "dump.nt"
    bare.write_text(nt)
    z = tmp_path / "dump_nt.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("part-0.nt", nt)
    # text-level parse keeps the unescaped quote; A2 cleansing strips it
    assert parse_ntriples_text(nt) == [
        ("http://e/s", "http://e/p", "http://e/o", None),
        ("http://e/s", "http://e/label", None, 'Al"pha'),
    ]
    kb_zip = build_kb_from_dumps(spark, str(z), fmt="ntriples", zipped=True)
    kb_bare = build_kb_from_dumps(spark, str(bare), fmt="ntriples")
    for side in (kb_zip, kb_bare):
        assert side.relations.count() == 1
        assert {r["literal"] for r in side.literals.collect()} == {"Alpha"}


def test_turtle_glued_statement_terminator():
    """A '.' glued to the final prefixed name must terminate the
    statement, not join the name (Turtle PN_LOCAL cannot end in '.'),
    and typed-literal datatype suffixes must not swallow it either."""
    t = parse_turtle_text(
        "@prefix ex: <http://e/> .\n"
        "ex:s ex:p ex:o.\n"
        "ex:s2 ex:p2 ex:o2 .\n"
        'ex:s3 ex:p3 "5"^^<http://www.w3.org/2001/XMLSchema#int>.\n'
        'ex:s4 ex:p4 "x"^^ex:dt.\n'
    )
    assert ("http://e/s", "http://e/p", "http://e/o", None) in t
    assert ("http://e/s2", "http://e/p2", "http://e/o2", None) in t
    assert ("http://e/s3", "http://e/p3", None, "5") in t
    assert ("http://e/s4", "http://e/p4", None, "x") in t
    assert len(t) == 4


_BBC = "/root/reference/corpora/bbc_nature/bbc_nature_labels.zip"


@pytest.mark.skipif(
    not __import__("os").path.exists(_BBC),
    reason="reference bbc_nature corpus not present",
)
def test_rdfxml_base_resolution_bbc_nature(spark):
    """The A1 RDF/XML path on 1175 REAL BBC label files: relative
    rdf:about/rdf:resource references resolve against the base URI
    (Sesame's ``conn.add(in, "http://www.bbc.co.uk/", RDFXML)`` at
    BBCNatureCorpus.java:95), typed node elements become rdf:type
    triples, and the full A2-A9 ETL produces a frozen KB: 17028
    resources / 9490 literals / 56581 relations / 18065 symbols
    (cleansing drops the >120-char image URLs and >100-char
    description literals, per RDFTripleParser.java:205-244)."""
    from pyspark.sql import functions as F

    kb = build_kb_from_dumps(
        spark, _BBC, fmt="rdfxml", zipped=True, base="http://www.bbc.co.uk/"
    )
    assert kb.resources.count() == 17028
    assert kb.literals.count() == 9490
    assert kb.relations.count() == 56581
    assert kb.symbols.count() == 18065
    # every relative reference resolved; scheme-qualified ones untouched
    assert kb.resources.filter(F.col("uri").startswith("/")).count() == 0
    assert (
        kb.resources.filter(
            F.col("uri").startswith("http://www.bbc.co.uk/nature/")
        ).count()
        > 3000
    )
    lbl = kb.resources.filter(
        F.col("uri") == "http://www.w3.org/2000/01/rdf-schema#label"
    ).first()
    assert lbl is not None
    assert kb.symbols.filter(F.col("p") == lbl["id"]).count() == 4173


def test_base_resolution_rejected_for_turtle():
    from scoobie_spark.kb.rdfio import _parser

    with pytest.raises(ValueError):
        _parser("turtle", "http://example.org/")


def test_base_resolution_rejected_for_ntriples(spark):
    with pytest.raises(ValueError):
        build_kb_from_dumps(spark, "/nonexistent", fmt="ntriples", base="http://x/")
