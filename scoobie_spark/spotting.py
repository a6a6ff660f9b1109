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
    # NOTE: no dropDuplicates here — candidate rows probing with both
    # case-hashes can produce duplicate matches, but they arrive adjacent
    # after the filter stage's (doc_id, begin, end, ...) sort and are
    # dropped there for free (one shuffle instead of two).
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
    )


def _is_word(ch: str) -> bool:
    return ch.isalnum() or ch == "_"


def _filter_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Batch-vectorized B10-B12 over many complete documents at once
    (rows pre-sorted by doc_id, begin asc, end desc, prop_id, lit_id —
    TextPointer ordering, TextPointer.java:139-147).

    B12 note: "span exactly tiled by tokens" reduces to a char test —
    the span start is a token start by construction, so tiling holds iff
    a token ends exactly at the span end b, i.e. NOT (suffix[b-1] and
    suffix[b] are both word chars): a word-char run straddling b is the
    only way no token boundary falls on b (punctuation tokens are
    single-char, whitespace never ends a literal because KB literals are
    trimmed). This replaces the per-row regex scan of the suffix."""
    import numpy as np

    n = len(pdf)
    if n == 0:
        return pdf.drop(columns=["suffix"])

    # dedupe both-case-hash duplicate matches (adjacent after the sort)
    doc = pdf["doc_id"].values
    a = pdf["begin"].values
    b = pdf["end"].values
    lids = pdf["lit_id"].values
    pids = pdf["prop_id"].values
    dup = np.zeros(n, dtype=bool)
    dup[1:] = (
        (doc[1:] == doc[:-1])
        & (a[1:] == a[:-1])
        & (b[1:] == b[:-1])
        & (lids[1:] == lids[:-1])
        & (pids[1:] == pids[:-1])
    )
    if dup.any():
        pdf = pdf[~dup]
        doc, a, b = pdf["doc_id"].values, pdf["begin"].values, pdf["end"].values
    n = len(pdf)

    # B10 — longest-match scan (RDFLiteralSpotting.filterLongestMatches:186-214)
    keep = np.ones(n, dtype=bool)
    cur = None
    s0_a = s0_b = -1
    for i in range(n):
        if doc[i] != cur:
            cur = doc[i]
            s0_a, s0_b = int(a[i]), int(b[i])
            continue
        ai, bi = int(a[i]), int(b[i])
        if (s0_b - s0_a) > (bi - ai) and ai >= s0_a and bi <= s0_b:
            keep[i] = False
        else:
            s0_a, s0_b = ai, bi
    pdf = pdf[keep]
    if not len(pdf):
        return pdf.drop(columns=["suffix"])

    # B11 — case filter (filterCaseMatches:216-246), keyed by (doc, surface)
    surf = pdf["surface"].values
    lit = pdf["literal"].values
    doc2 = pdf["doc_id"].values
    exact_mask = surf == lit
    exact_keys = set(zip(doc2[exact_mask].tolist(), surf[exact_mask].tolist()))
    if exact_keys:
        in_exact = np.fromiter(
            ((d, s) in exact_keys for d, s in zip(doc2.tolist(), surf.tolist())),
            dtype=bool,
            count=len(pdf),
        )
        pdf = pdf[~in_exact | exact_mask]
        if not len(pdf):
            return pdf.drop(columns=["suffix"])

    # B12 — O(1) char tiling test per row
    blen = (pdf["end"] - pdf["begin"]).values
    sfx = pdf["suffix"].values
    ok = np.fromiter(
        (
            not (
                _is_word(s[bl - 1]) and bl < len(s) and _is_word(s[bl])
            )
            for s, bl in zip(sfx.tolist(), blen.tolist())
        ),
        dtype=bool,
        count=len(pdf),
    )
    return pdf[ok].drop(columns=["suffix"])


def filter_mentions(mentions_raw: DataFrame) -> DataFrame:
    """Apply B10-B12 per document. One shuffle on doc_id with secondary
    sort, then whole-batch vectorized filtering (per-group pandas would
    pay ~2ms/group; the batch form is ~µs/row)."""
    from .grouped import grouped_apply

    return grouped_apply(
        mentions_raw,
        "doc_id",
        _filter_batch,
        MENTIONS_SCHEMA,
        batch_mode=True,
        sort_cols=[
            F.col("begin").asc(),
            F.col("end").desc(),
            F.col("prop_id").asc(),
            F.col("lit_id").asc(),
        ],
    )


def spot(candidates: DataFrame, gazetteer: DataFrame) -> DataFrame:
    """Full spotting: prefix join + per-doc filters → mentions table
    (doc_id, begin, end, lit_id, prop_id, belief, literal, surface)."""
    return filter_mentions(join_gazetteer(candidates, gazetteer))
