"""Deterministic synthetic fixtures (FIXTURES.md).

Two tiers:

* **Micro fixture** — exact replica of the reference's frozen test KB
  (``scoobie/testdb.script:31-45`` — Percy Jackson / Camp Halfblood) +
  a handful of mention-bearing documents covering the spotting edge
  cases (exact case, wrong case, substring-of-longer-match,
  no-token-tiling). Golden expected triples live in
  :data:`MICRO_EXPECTED_TRIPLES`.

* **Synthetic scale corpus** — a seeded generator that turns any
  driver ``documents`` table (or a target row count) into (a) a
  repo-file corpus shaped per BASELINE.json input_hint
  ``(repo, path, commit, lang, content, sha256)`` and (b) a matching
  KB whose labels are planted in the content, with ~10% ambiguous
  labels shared by multiple subjects (drives disambiguation) and a
  connected relations graph (drives the degree resolver). Everything
  derives from hashes of stable keys — no RNG state, so any subset of
  rows regenerates identically on any executor.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .hashing import java_hash_prefix_py

EX_INST = "http://example.org/instance#"
EX_ONT = "http://example.org/ontology#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"

# ---------------------------------------------------------------------------
# Micro fixture (reference scoobie/testdb.script:31-45)
# ---------------------------------------------------------------------------

MICRO_URIS = [
    EX_INST + "Camp_Halfblood",        # 0
    EX_INST + "Percy_Jackson",         # 1
    EX_ONT + "Person",                 # 2
    EX_ONT + "Place",                  # 3
    EX_ONT + "livesIn",                # 4
    "http://nullCamp_Halfblood",       # 5 (the label node, verbatim from testdb)
    RDF_TYPE,                          # 6
    RDFS_LABEL,                        # 7
]

MICRO_LITERALS = ["Camp Halfblood", "Percy Jackson"]  # ids 0, 1

# (s, p, o) over the ids above — testdb.script:41-43
MICRO_RELATIONS = [(1, 4, 0), (1, 6, 2), (5, 6, 3)]

# (s, p, lit, belief) — testdb.script:44-45
MICRO_SYMBOLS = [(1, 7, 1, 1.0), (5, 7, 0, 1.0)]

MICRO_DOCS = [
    # doc 0: both mentions, exact case → full extraction
    ("repo-micro", "docs/percy.txt", "In Camp Halfblood, Percy Jackson trains."),
    # doc 1: wrong case only → still matches (case filter only drops
    #        wrong-case when an exact-case match of the same surface exists)
    ("repo-micro", "docs/lower.txt", "we met percy jackson yesterday"),
    # doc 2: "Camp" alone — prefix of "Camp Halfblood" but no full match
    ("repo-micro", "docs/camp.txt", "The Camp is large."),
    # doc 3: substring containment — "Camp Halfblood" inside a sentence with
    #        an exact-case and a wrong-case occurrence → case filter keeps exact
    ("repo-micro", "docs/case.txt", "Camp Halfblood is not camp halfblood."),
    # doc 4: near-empty doc
    ("repo-micro", "docs/empty.txt", "!!"),
    # doc 5: no tiling — mention glued into a longer token
    ("repo-micro", "docs/glued.txt", "PercyJacksonish text about Camp Halfbloodery."),
]

# The P/R target set for the micro corpus (FIXTURES.md §E), as
# (graph, subj, pred, obj) — obj is a URI for known/type triples and the
# surface text for recognized label triples.
# Note on the case filter (RDFLiteralSpotting.filterCaseMatches:216-246):
# it keys on the *surface text*, so it only drops a match when the SAME
# surface string also matches a literal case-exactly. A wrong-case
# occurrence elsewhere in the doc ("camp halfblood") survives as its own
# surface form. Note on "known": the reference adds every outgoing KB
# relation of resolved subjects to the doc graph (KnownFactsRetrieval.java:
# 71-80, including rdf:type) but rdf:type already lands in #recognized and
# literal-edge vertices are unserializable (RDFSerializer.java:98-104 would
# call getURI on negative ids) — our known graph is the relation edges with
# predicate != rdf:type between URI nodes, per FIXTURES.md §E.
MICRO_EXPECTED_TRIPLES = sorted(
    {
        # doc 0
        ("recognized", EX_INST + "Percy_Jackson", RDFS_LABEL, "Percy Jackson"),
        ("recognized", EX_INST + "Percy_Jackson", RDF_TYPE, EX_ONT + "Person"),
        ("recognized", "http://nullCamp_Halfblood", RDFS_LABEL, "Camp Halfblood"),
        ("recognized", "http://nullCamp_Halfblood", RDF_TYPE, EX_ONT + "Place"),
        ("known", EX_INST + "Percy_Jackson", EX_ONT + "livesIn", EX_INST + "Camp_Halfblood"),
        # doc 1 (wrong case, but no exact-case competitor on that surface)
        ("recognized", EX_INST + "Percy_Jackson", RDFS_LABEL, "percy jackson"),
        # doc 3 (both surface forms survive — different surface keys)
        ("recognized", "http://nullCamp_Halfblood", RDFS_LABEL, "camp halfblood"),
    }
)


def _sha256(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def micro_docs(spark: SparkSession) -> DataFrame:
    """The micro corpus in BASELINE.json input_hint shape."""
    rows = [
        (repo, path, _sha256(repo + "/" + path)[:40], "en", content, _sha256(content))
        for repo, path, content in MICRO_DOCS
    ]
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string, sha256 string"
    )


def micro_kb(spark: SparkSession):
    """The micro KB as dictionary-encoded DataFrames (see kb.model.KB)."""
    from .kb.model import KB

    resources = spark.createDataFrame(
        list(enumerate(MICRO_URIS)), "id long, uri string"
    )
    literals = spark.createDataFrame(
        [(i, lit, java_hash_prefix_py(lit.lower())) for i, lit in enumerate(MICRO_LITERALS)],
        "id long, literal string, prefix int",
    )
    relations = spark.createDataFrame(MICRO_RELATIONS, "s long, p long, o long")
    symbols = spark.createDataFrame(MICRO_SYMBOLS, "s long, p long, lit long, belief double")
    return KB(resources=resources, literals=literals, relations=relations, symbols=symbols)


# ---------------------------------------------------------------------------
# Synthetic scale corpus + KB (seeded, hash-derived, executor-safe)
# ---------------------------------------------------------------------------

# Seeded word lists for entity label synthesis. Labels are two-word
# "Firstname Lastname"-style phrases so multi-token matching is exercised.
_FIRST = [
    "Alder", "Birch", "Cedar", "Dunes", "Ember", "Fjord", "Grove", "Harbor",
    "Iris", "Juniper", "Kestrel", "Larch", "Maple", "Nimbus", "Onyx", "Pike",
    "Quartz", "Rowan", "Sable", "Tarn", "Umber", "Vale", "Willow", "Xenon",
    "Yarrow", "Zephyr",
]
_LAST = [
    "Archer", "Brook", "Crane", "Drake", "Elm", "Finch", "Gale", "Heron",
    "Ibis", "Jay", "Knoll", "Lark", "Mason", "North", "Otter", "Pond",
    "Quill", "Reed", "Stone", "Thorn", "Usher", "Vane", "Wren", "Young",
]
_CLASSES = ["Person", "Place", "Org", "Work", "Event"]
_REL_PREDS = ["livesIn", "knows", "partOf", "memberOf", "locatedIn"]

N_AMBIG_PERCENT = 10  # ~10% of labels shared by 2 subjects


def _label_for(i: int) -> str:
    return f"{_FIRST[i % len(_FIRST)]} {_LAST[(i * 7 + i // len(_FIRST)) % len(_LAST)]}"


def synth_kb_rows(n_instances: int):
    """Driver-side tiny generation of the synthetic KB's string triples.

    Deterministic in ``n_instances``; the KB is small relative to the
    corpus (dictionaries are the broadcast side at scale), so building
    its row list driver-side is legitimate — the *corpus* is never
    materialized on the driver.

    ~10% of instances share their label with instance ``i-1`` (planted
    ambiguity); relations form a ring + skip-links so degree varies.
    """
    res_triples = []   # (s_uri, p_uri, o_uri)
    sym_triples = []   # (s_uri, p_uri, literal)
    for i in range(n_instances):
        uri = f"{EX_INST}inst_{i}"
        cls = _CLASSES[i % len(_CLASSES)]
        res_triples.append((uri, RDF_TYPE, EX_ONT + cls))
        if i > 0 and i % N_AMBIG_PERCENT == 0:
            label = _label_for(i - 1)  # shared with previous instance → ambiguous
        else:
            label = _label_for(i)
        sym_triples.append((uri, RDFS_LABEL, label))
        # ring + skip links; twin degrees differ only via INCOMING edges
        # (the doc-graph anchor guard admits only backward edges into
        # ambiguous subjects), and ties fall to the min-id tie-break —
        # resolution is deterministic either way
        nbr = (i + 1) % n_instances
        res_triples.append((uri, EX_ONT + _REL_PREDS[i % len(_REL_PREDS)], f"{EX_INST}inst_{nbr}"))
        if i % 3 == 0:
            skip = (i + 7) % n_instances
            res_triples.append((uri, EX_ONT + "knows", f"{EX_INST}inst_{skip}"))
    return res_triples, sym_triples


def synth_kb(spark: SparkSession, n_instances: int = 200, via_etl: bool = False):
    """Synthetic KB, dictionary-encoded.

    via_etl=True exercises the real distributed ETL path (A6-A9 —
    covered by tests); the default encodes driver-side (the synthetic KB
    is tiny and the ETL's ~8 Spark jobs of fixed latency would dominate
    small benchmark runs). Both paths produce the same tables."""
    from .kb.etl import build_kb_from_string_triples
    from .kb.model import KB

    res_triples, sym_triples = synth_kb_rows(n_instances)
    if via_etl:
        obj = spark.createDataFrame(res_triples, "s string, p string, o string")
        dat = spark.createDataFrame(sym_triples, "s string, p string, literal string")
        return build_kb_from_string_triples(spark, obj, dat)

    # driver-side encode, same id discipline (row_number over sorted uri)
    uris = sorted(
        {u for t in res_triples for u in t}
        | {t[0] for t in sym_triples}
        | {t[1] for t in sym_triples}
    )
    uid = {u: i for i, u in enumerate(uris)}
    lits = sorted({t[2] for t in sym_triples})
    lid = {l: i for i, l in enumerate(lits)}
    resources = spark.createDataFrame(list(enumerate(uris)), "id long, uri string")
    literals = spark.createDataFrame(
        [(i, l, java_hash_prefix_py(l.lower())) for l, i in lid.items()],
        "id long, literal string, prefix int",
    )
    relations = spark.createDataFrame(
        sorted({(uid[s], uid[p], uid[o]) for s, p, o in res_triples}),
        "s long, p long, o long",
    )
    symbols = spark.createDataFrame(
        sorted({(uid[s], uid[p], lid[l], 1.0) for s, p, l in sym_triples}),
        "s long, p long, lit long, belief double",
    )
    return KB(resources=resources, literals=literals, relations=relations, symbols=symbols)


def replicate_corpus(corpus: DataFrame, factor: int) -> DataFrame:
    """Deterministically replicate a corpus ×factor (distinct (path,
    commit) per replica, same content → sha256 stays valid). Used to
    scale the bench workload into compute-dominated territory for the
    N-vs-4N parallelism efficiency measurement."""
    if factor <= 1:
        return corpus
    # Spread the SMALL base before the ×factor blow-up: the broadcast
    # nested-loop replication multiplies rows inside each input
    # partition, so a single-split parquet source would otherwise
    # generate the whole replicated corpus (GBs of content) in one task
    # — measured ~33s at ×960 regardless of core count. Shuffling the
    # pre-blow-up base is ~1/factor of those bytes.
    spark = corpus.sparkSession
    n = spark.sparkContext.defaultParallelism * 2
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    return (
        corpus.repartition(n)
        .crossJoin(F.broadcast(reps))
        .withColumn("path", F.concat_ws("#", "path", F.col("rep").cast("string")))
        .withColumn(
            "commit", F.sha2(F.concat_ws("#", "commit", F.col("rep").cast("string")), 256).substr(1, 40)
        )
        .drop("rep")
    )


_FILLER = (
    "the quick build runs green and the long pipeline keeps its offsets stable "
    "while every stage writes metrics and lineage for resume"
).split()


def synth_corpus(
    spark: SparkSession,
    docs: DataFrame | None = None,
    n_docs: int = 1000,
    n_instances: int = 200,
    giant_repo_fraction: int = 3,
    filler_repeat: int = 1,
) -> DataFrame:
    """Repo-file corpus with planted KB labels, input_hint shape.

    If ``docs`` (the driver ``documents`` table) is given, its ``text``
    column becomes the filler and ``doc_id`` the key; otherwise
    ``n_docs`` synthetic filler docs are generated with
    ``spark.range`` (distributed — no driver materialization).

    Every doc plants 1-3 labels (exact case); every 7th doc plants a
    lowercased copy as well (case-filter signal); every 11th doc plants
    only a one-word prefix of a label (longest-match signal). One repo
    in ``giant_repo_fraction`` of rows is "repo-giant" (skew knob).
    All content is a pure function of the doc key → sha256 computable
    and stable everywhere.
    """
    if docs is None:
        base = spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            F.lit("synthetic filler body with stable words ").alias("text"),
        )
    else:
        base = docs.select("doc_id", "text")

    k = F.col("doc_id").cast("long")
    n_inst = F.lit(n_instances)

    # label ids planted in this doc (1-3 of them, derived from doc_id)
    i1 = F.pmod(k * 13 + 7, n_inst)
    i2 = F.pmod(k * 29 + 3, n_inst)
    i3 = F.pmod(k * 41 + 11, n_inst)

    labels = spark.createDataFrame(
        [(i, _label_for(i)) for i in range(n_instances)], "lid long, label string"
    )

    planted = (
        base.withColumn("i1", i1)
        .withColumn("i2", F.when(F.pmod(k, 2) == 0, i2))
        .withColumn("i3", F.when(F.pmod(k, 5) == 0, i3))
        .join(F.broadcast(labels).withColumnRenamed("label", "label1"), F.col("i1") == F.col("lid"), "left")
        .drop("lid")
        .join(
            F.broadcast(labels).withColumnRenamed("label", "label2"),
            F.col("i2") == F.col("lid"),
            "left",
        )
        .drop("lid")
        .join(
            F.broadcast(labels).withColumnRenamed("label", "label3"),
            F.col("i3") == F.col("lid"),
            "left",
        )
        .drop("lid")
    )

    content = F.concat_ws(
        " ",
        F.coalesce(F.col("label1"), F.lit("")),
        F.lit("was seen near"),
        F.coalesce(F.col("label2"), F.lit("nothing")),
        F.lit("."),
        # filler_repeat grows per-doc text volume (real corpora are
        # KB-size docs, mostly mention-free text)
        F.repeat(F.substring(F.col("text"), 1, 200), filler_repeat),
        F.when(F.pmod(k, 7) == 0, F.lower(F.col("label1"))).otherwise(F.lit("")),
        # every 11th doc plants ONLY a one-word prefix (longest-match
        # signal); label3 is null for 80% of docs, so fall back to an
        # always-present label — otherwise the signal fired only at
        # k % 55 == 0
        F.when(
            F.pmod(k, 11) == 0,
            F.split(
                F.coalesce(F.col("label3"), F.col("label2"), F.col("label1")), " "
            ).getItem(0),
        ).otherwise(F.coalesce(F.col("label3"), F.lit(""))),
    )

    out = planted.select(
        F.when(F.pmod(k, giant_repo_fraction) == 0, F.lit("repo-giant"))
        .otherwise(F.concat(F.lit("repo-"), F.pmod(k, 50).cast("string")))
        .alias("repo"),
        F.concat(F.lit("src/f"), k.cast("string"), F.lit(".txt")).alias("path"),
        F.sha2(F.concat(F.lit("commit:"), k.cast("string")), 256).substr(1, 40).alias("commit"),
        F.lit("en").alias("lang"),
        content.alias("content"),
    ).withColumn("sha256", F.sha2(F.col("content"), 256))
    return out
