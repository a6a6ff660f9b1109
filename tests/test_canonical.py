"""URI canonicalization (north_rule: min-hash / sorted-key union-find)."""

from pyspark.sql import functions as F

from scoobie_spark.kb.model import KB
from scoobie_spark.linking import (
    apply_canonical_map,
    canonical_uri_map,
    canonicalize_by_label,
)


def _kb(spark):
    resources = spark.createDataFrame(
        [
            (0, "http://ex/A"),
            (1, "http://ex/A_dup"),
            (2, "http://ex/B"),
            (3, "http://ex/label"),
        ],
        "id long, uri string",
    )
    literals = spark.createDataFrame(
        [
            (0, "the grand old northern railway station", 1),
            (1, "the grand old northern railway station hall", 2),
            (2, "completely different text about fish ponds", 3),
        ],
        "id long, literal string, prefix int",
    )
    symbols = spark.createDataFrame(
        [(0, 3, 0, 1.0), (1, 3, 1, 1.0), (2, 3, 2, 1.0)],
        "s long, p long, lit long, belief double",
    )
    relations = spark.createDataFrame([], "s long, p long, o long")
    return KB(resources=resources, literals=literals, relations=relations, symbols=symbols)


def test_canonicalize_by_label_minhash(spark):
    kb = _kb(spark)
    got = {
        r["subject"]: r["canonical_id"]
        for r in canonicalize_by_label(kb, threshold=0.5, n=2).collect()
    }
    # near-dup labels → same canonical id (the min subject id); the
    # unrelated subject maps to itself
    assert got[0] == got[1] == 0
    assert got[2] == 2


def test_canonical_uri_map_sorted_key(spark):
    resources = spark.createDataFrame(
        [
            (0, "http://Ex.org/thing/"),
            (1, "https://ex.org/thing"),
            (2, "http://ex.org/other"),
            # RFC 3986: paths are case-SENSITIVE — only scheme/authority
            # case collapses
            (3, "http://ex.org/THING"),
        ],
        "id long, uri string",
    )
    got = {r["id"]: r["canonical_id"] for r in canonical_uri_map(resources).collect()}
    assert got[0] == got[1] == 0  # scheme/authority-case/trailing-slash collapse
    assert got[2] == 2
    assert got[3] == 3  # path case preserved


def test_apply_canonical_map(spark):
    kb = _kb(spark)
    canon = canonicalize_by_label(kb, threshold=0.5, n=2)
    triples = spark.createDataFrame(
        [
            (1, "recognized", "http://ex/A_dup", "p", "o"),
            (1, "recognized", "http://ex/B", "p", "o"),
            (1, "known", "http://unmapped", "p", "o"),
        ],
        "doc_id long, graph string, subj string, pred string, obj string",
    )
    out = {
        r["subj"]
        for r in apply_canonical_map(triples, canon, kb.resources).collect()
    }
    assert out == {"http://ex/A", "http://ex/B", "http://unmapped"}
