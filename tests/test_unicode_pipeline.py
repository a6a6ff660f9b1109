"""Non-ASCII end-to-end: KB literals with unicode prefixes exercise the
exact-python fallback in textproc.suffix_candidates (the numpy fast
path only covers ASCII 4-char prefixes) and unicode-safe span math."""

import hashlib

from scoobie_spark.hashing import java_hash_prefix_py
from scoobie_spark.kb.model import KB
from scoobie_spark.pipeline import extract_triples


def _kb(spark):
    uris = [
        "http://ex/Zürich",        # 0
        "http://ex/Éowyn",         # 1
        "http://ex/label",         # 2
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",  # 3
        "http://ex/City",          # 4
    ]
    lits = ["Zürich Hauptbahnhof", "Éowyn of Rohan"]
    resources = spark.createDataFrame(list(enumerate(uris)), "id long, uri string")
    literals = spark.createDataFrame(
        [(i, l, java_hash_prefix_py(l.lower())) for i, l in enumerate(lits)],
        "id long, literal string, prefix int",
    )
    symbols = spark.createDataFrame(
        [(0, 2, 0, 1.0), (1, 2, 1, 1.0)], "s long, p long, lit long, belief double"
    )
    relations = spark.createDataFrame([(0, 3, 4), (1, 3, 4)], "s long, p long, o long")
    return KB(resources=resources, literals=literals, relations=relations, symbols=symbols)


def _docs(spark):
    rows = []
    for i, content in enumerate(
        [
            "The train reaches Zürich Hauptbahnhof at noon.",
            "A song about Éowyn of Rohan, nothing else.",
            "No mentions here, just plain words.",
        ]
    ):
        rows.append(
            (
                "repo-u",
                f"docs/u{i}.txt",
                "c" * 40,
                "de",
                content,
                hashlib.sha256(content.encode("utf-8")).hexdigest(),
            )
        )
    return spark.createDataFrame(
        rows,
        "repo string, path string, commit string, lang string, content string, sha256 string",
    )


def test_unicode_mentions_end_to_end(spark):
    triples = extract_triples(spark, _docs(spark), _kb(spark))
    got = {(r["graph"], r["subj"], r["obj"]) for r in triples.collect()}
    assert ("recognized", "http://ex/Zürich", "Zürich Hauptbahnhof") in got
    assert ("recognized", "http://ex/Éowyn", "Éowyn of Rohan") in got
    # rdf:type rows decoded too
    assert ("recognized", "http://ex/Zürich", "http://ex/City") in got
