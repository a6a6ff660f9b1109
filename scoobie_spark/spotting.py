"""Gazetteer literal spotting — SURVEY.md §2 B8-B12.

Reference flow (``transducer/RDFLiteralSpotting.java:58-246``): per
document, fetch KB literals bucket-matched on the 4-char prefix hash,
sorted-merge them against the document suffix array with a
case-insensitive prefix comparator, then apply three sequential
filters: longest-match containment, case-exactness, token tiling.

Spark-first re-expression:

* The per-document gazetteer SQL round-trip becomes ONE corpus-wide
  equi-join ``candidates ⋈ gazetteer ON prefix_hash`` + a vectorized
  ``startswith`` residual (the sorted-merge's asymptotics come free
  from Spark's join machinery; the reference's DB-side collation dance,
  SuffixArray.dbSort:87-96, disappears because one engine sorts both
  sides). With the KB ``literals`` table bucketed by ``prefix`` this
  join is storage-partitioned at scale.

* The three filters are order-dependent *within one document* and so
  run as a grouped-map pandas stage over ``groupBy(doc_id)`` — groups
  are per-document mention lists (tiny). The token-tiling check
  re-derives token boundaries from the mention's carried ≤100-char
  suffix slice instead of shuffling the corpus-wide tokens table:
  a suffix starts at a global token start, so slice-local tokenization
  equals global tokenization restricted to the slice (the only
  divergence — a token straddling the 100-char truncation point of an
  exactly-100-char literal — cannot satisfy ``end == len(literal)``
  anyway unless the literal is length-100; documented limitation).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textproc import _TOKEN_RE

MENTIONS_SCHEMA = (
    "doc_id long, begin int, end int, lit_id long, prop_id long, "
    "belief double, literal string, surface string"
)


def join_gazetteer(candidates: DataFrame, gazetteer: DataFrame) -> DataFrame:
    """B8+B9: candidates(doc_id, begin, hash, suffix) ⋈ gazetteer on the
    prefix bucket, residual case-insensitive prefix test, span =
    [begin, begin+len(literal)) — no regex re-search needed (the
    reference re-finds spans because its suffix list lost offsets,
    SuffixArray.compare:261-359; we kept ``begin``)."""
    g = gazetteer.withColumnRenamed("prefix", "hash")
    joined = candidates.join(g, "hash").filter(
        F.startswith(F.lower("suffix"), F.lower("literal"))
    )
    return joined.select(
        "doc_id",
        "begin",
        (F.col("begin") + F.length("literal")).cast("int").alias("end"),
        "lit_id",
        "prop_id",
        "belief",
        "literal",
        F.col("suffix").substr(F.lit(1), F.length("literal")).alias("surface"),
        "suffix",
    ).dropDuplicates(["doc_id", "begin", "end", "lit_id", "prop_id"])


def _filter_doc(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-document longest-match (B10), case (B11) and tiling (B12)
    filters — faithful to the reference's sequential semantics."""
    # TextPointer ordering: start asc, longer span first, then property
    # (TextPointer.java:139-147); lit_id last for determinism.
    pdf = pdf.sort_values(
        ["begin", "end", "prop_id", "lit_id"], ascending=[True, False, True, True]
    )

    # B10 — longest-match scan (RDFLiteralSpotting.filterLongestMatches:186-214)
    keep = []
    s0_a = s0_b = None
    for a, b in zip(pdf["begin"].values, pdf["end"].values):
        if s0_a is None or not ((s0_b - s0_a) > (b - a) and a >= s0_a and b <= s0_b):
            keep.append(True)
            s0_a, s0_b = a, b
        else:
            keep.append(False)
    pdf = pdf[pd.Series(keep, index=pdf.index)]

    # B11 — case filter (filterCaseMatches:216-246): if this exact surface
    # string matches some literal case-exactly, drop its non-exact matches.
    exact = set(pdf.loc[pdf["surface"] == pdf["literal"], "surface"])
    pdf = pdf[~pdf["surface"].isin(exact) | (pdf["surface"] == pdf["literal"])]

    # B12 — token tiling (RDFLiteralSpotting.java:93-132): the span must be
    # exactly tiled by tokens ⇔ some token (within the suffix slice) ends
    # exactly at the span end. Span starts are token starts by construction.
    ok = []
    for b_rel, suffix in zip(
        (pdf["end"] - pdf["begin"]).values, pdf["suffix"].values
    ):
        ok.append(any(m.end() == b_rel for m in _TOKEN_RE.finditer(suffix[: int(b_rel) + 1])))
    pdf = pdf[pd.Series(ok, index=pdf.index)]

    return pdf.drop(columns=["suffix"])


def filter_mentions(mentions_raw: DataFrame) -> DataFrame:
    """Apply B10-B12 per document (grouped-map pandas; per-doc groups)."""
    return mentions_raw.groupBy("doc_id").applyInPandas(_filter_doc, MENTIONS_SCHEMA)


def spot(candidates: DataFrame, gazetteer: DataFrame) -> DataFrame:
    """Full spotting: prefix join + per-doc filters → mentions table
    (doc_id, begin, end, lit_id, prop_id, belief, literal, surface)."""
    return filter_mentions(join_gazetteer(candidates, gazetteer))
