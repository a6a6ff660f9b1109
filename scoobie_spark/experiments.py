"""End-to-end replay of the reference's corpus experiment
(``experiments/ScoobieExperiment.testSystem:72-146``): zip corpus →
full pipeline per document → recognized-URI lists → per-doc
precision/recall/F1@k against each document's ground-truth URI set.

Protocol parity, piece by piece:

* **zip corpus reader** — ``corpus/TextCorpus.getEntries:309-334``:
  one document per non-directory zip member, URI = member name. Here a
  ``binaryFile`` scan + Arrow-batched member expansion so the reader
  scales to many zip shards (one task per zip, like the RDF zip reader
  in :mod:`kb.rdfio`).
* **ground truth** — ``corpus/WikinewsCorpus.extractLabels:52-70``:
  every ``"http://dbpedia.org/\\w+/\\w+"`` match in the raw HTML
  (quote-delimited, case-insensitive), lowercased on comparison like
  ``ScoobieExperiment.getUris:148-156``.
* **metric** — ``ScoobieExperiment.calcPrecRecF1:159-182``: truncate
  the recognized list at k, set-intersect with the GT set; an empty
  recognized list scores (0, 0, 0).

The reference runs against a DBpedia Postgres instance; this container
has none, so the KB is synthesized *from the corpus's own anchors* —
resource URI set = all dbpedia hrefs, labels = the URI's final path
segment (underscores → spaces, percent-decoded: DBpedia's rdfs:label
convention) PLUS every anchor text observed for that URI corpus-wide
(the wikilink-anchor lexicalization that SCOOBIE's DBpedia deployment
gets from redirect/label triples). The KB then goes through the real
A2-A9 ETL (``build_kb_from_string_triples``), so the replay exercises
dictionary build → spotting → linking → disambiguation → serialization
exactly as the flagship does. Frozen metrics live in
``tests/test_experiment_replay.py``.
"""

from __future__ import annotations

import io
import zipfile
from collections.abc import Iterator
from urllib.parse import unquote

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
_THING = "http://www.w3.org/2002/07/owl#Thing"

# WikinewsCorpus.java:38-39 (CASE_INSENSITIVE), quotes stripped by the
# capture group
_GT_PATTERN = r'(?i)"(http://dbpedia\.org/\w+/\w+)"'
# anchor elements carry the (uri, surface form) pairs
_ANCHOR_PATTERN = r'<a href="(http://dbpedia\.org/[^"]+)">([^<]*)</a>'


def read_zip_corpus(spark: SparkSession, path: str) -> DataFrame:
    """(uri, content) rows from every non-directory member of the zip(s)
    at ``path`` — TextCorpus.getEntries:309-334. ``binaryFile`` keeps
    whole zips as single rows; expansion is an Arrow pass, so N zip
    shards parallelize across N tasks."""
    raw = spark.read.format("binaryFile").load(path).select("path", "content")

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            uris, texts = [], []
            for zpath, blob in zip(pdf["path"].values, pdf["content"].values):
                with zipfile.ZipFile(io.BytesIO(bytes(blob))) as zf:
                    for info in zf.infolist():
                        if info.is_dir():
                            continue
                        uris.append(f"{zpath}/{info.filename}")
                        texts.append(zf.read(info).decode("utf-8", "replace"))
            yield pd.DataFrame({"uri": uris, "content": texts})

    return raw.mapInPandas(expand, "uri string, content string")


def ground_truth(corpus: DataFrame) -> DataFrame:
    """(uri, gt_uri) — the per-document ground-truth URI set, lowercased
    (getUris lowercases both sides before comparing)."""
    return corpus.select(
        "uri",
        F.explode(F.regexp_extract_all("content", F.lit(_GT_PATTERN), 1)).alias("gt"),
    ).select("uri", F.lower("gt").alias("gt_uri")).distinct()


def kb_from_anchors(spark: SparkSession, corpus: DataFrame):
    """DBpedia stand-in KB from the corpus's anchor elements, built
    through the real A2-A9 ETL: datatype triples (resource, rdfs:label,
    {uri-derived label} ∪ {anchor texts}) + object triples (resource,
    rdf:type, owl:Thing) so disambiguation has a (trivial) graph."""
    anchors = corpus.select(
        F.explode(
            F.arrays_zip(
                F.regexp_extract_all("content", F.lit(_ANCHOR_PATTERN), 1).alias("s"),
                F.regexp_extract_all("content", F.lit(_ANCHOR_PATTERN), 2).alias("txt"),
            )
        ).alias("a")
    ).select(F.col("a.s").alias("s"), F.trim(F.col("a.txt")).alias("txt"))

    # label from the URI tail: percent-decode + underscores → spaces.
    # The percent decode runs in an Arrow pass over the (small)
    # distinct-resource table only.
    resources = anchors.select("s").distinct()

    def derive(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            labels = [
                unquote(u.rsplit("/", 1)[-1]).replace("_", " ")
                for u in pdf["s"].values
            ]
            yield pd.DataFrame({"s": pdf["s"].values, "literal": labels})

    uri_labels = resources.mapInPandas(derive, "s string, literal string")
    anchor_labels = anchors.filter(F.length("txt") > 0).select(
        "s", F.col("txt").alias("literal")
    )
    dat = (
        uri_labels.unionByName(anchor_labels)
        .distinct()
        .select("s", F.lit(RDFS_LABEL).alias("p"), "literal")
    )
    obj = resources.select(
        "s", F.lit(RDF_TYPE).alias("p"), F.lit(_THING).alias("o")
    )
    from .kb.etl import build_kb_from_string_triples

    return build_kb_from_string_triples(spark, obj, dat)


def calc_prec_rec_f1(found: DataFrame, gt: DataFrame, k: int = 1000) -> DataFrame:
    """Per-doc (uri, precision, recall, f1, n_gt, n_found) —
    calcPrecRecF1:159-182 as one aggregation: rank the found list, keep
    rank ≤ k, set-compare. Docs with an empty found list score 0/0/0;
    docs absent from GT are dropped (the reference corpus labels every
    doc)."""
    from pyspark.sql import Window

    w = Window.partitionBy("uri").orderBy(F.col("rank_key"), F.col("found_uri"))
    capped = (
        found.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("uri", "found_uri")
    )
    tp = (
        capped.join(
            gt.withColumnRenamed("gt_uri", "found_uri"), ["uri", "found_uri"], "left_semi"
        )
        .groupBy("uri")
        .agg(F.count("*").alias("tp"))
    )
    nf = capped.groupBy("uri").agg(F.count("*").alias("n_found"))
    ng = gt.groupBy("uri").agg(F.count("*").alias("n_gt"))
    p = F.col("tp") / F.greatest(F.col("n_found"), F.lit(1))
    r = F.col("tp") / F.greatest(F.col("n_gt"), F.lit(1))
    return (
        ng.join(nf, "uri", "left")
        .join(tp, "uri", "left")
        .fillna(0)
        .select(
            "uri",
            F.round(p, 5).alias("precision"),
            F.round(r, 5).alias("recall"),
            F.round(
                F.when(p + r > 0, 2 * p * r / (p + r)).otherwise(0.0), 5
            ).alias("f1"),
            "n_gt",
            "n_found",
        )
    )


def scoobie_experiment(
    spark: SparkSession,
    corpus_zip: str,
    k: int = 1000,
    resolver: str = "degree",
) -> DataFrame:
    """The full testSystem replay: returns the per-doc metric table.

    Steps: zip corpus → anchor-derived KB through A2-A9 → spotting +
    linking + disambiguation (sha256 invariant enforced inside the
    candidate scan, degree resolver = the reference default) → B23
    relevance rating (capacity, the reference's production config) →
    the B27 ranked-URI list per doc (``ListSerializer``) →
    calcPrecRecF1@k of that RANKED list vs the document's anchor ground
    truth — the @k truncation cuts the lowest-RATED tail, exactly as
    the reference's confidence-ranked list does."""
    from . import linking, rating, serialize, textproc

    corpus = read_zip_corpus(spark, corpus_zip).localCheckpoint()
    kb = kb_from_anchors(spark, corpus)
    gt = ground_truth(corpus)

    docs = textproc.with_doc_id(
        corpus.select(
            F.lit(corpus_zip).alias("repo"),
            F.col("uri").alias("path"),
            F.lit("gt").alias("commit"),
            "content",
            F.sha2(F.encode("content", "UTF-8"), 256).alias("sha256"),
        )
    ).localCheckpoint()
    kb_prefixes = [r[0] for r in kb.literals.select("prefix").distinct().collect()]
    cands = textproc.suffix_candidates(docs, kb_prefixes, check_sha256=True)
    resolved = linking.spot_resolve(cands, kb, resolver).localCheckpoint()
    scores = rating.relevance_scores(
        resolved, kb, docs.select("doc_id", "content"), metrics=["capacity"]
    )
    ranked = serialize.ranked_subjects(resolved, scores, kb)

    ids = docs.select("doc_id", F.col("path").alias("doc_uri"))
    found = (
        ranked.select(
            "doc_id",
            F.lower("uri").alias("found_uri"),
            (-F.col("score")).alias("rank_key"),
        )
        .join(F.broadcast(ids), "doc_id")
        .select(F.col("doc_uri").alias("uri"), "found_uri", "rank_key")
    )
    return calc_prec_rec_f1(found, gt, k)
