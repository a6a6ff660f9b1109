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
    # B12's token-tiling test needs exactly TWO chars of the suffix
    # (the one before and the one at the span end), so it is computed
    # HERE as a JVM-side boolean and the ≤100-char suffix string never
    # enters the downstream shuffle. The *application* of the flag stays
    # inside the per-doc filter stage, after B10/B11 (reference order:
    # a non-tiling long match still suppresses contained shorter ones,
    # RDFLiteralSpotting.java:93-132 vs filterLongestMatches:186-214).
    blen = F.length("literal")
    word = lambda c: c.rlike(r"[\p{L}\p{N}_]")  # noqa: E731  (py isalnum ∪ _)
    c_last = F.col("suffix").substr(blen, F.lit(1))
    c_next = F.col("suffix").substr(blen + 1, F.lit(1))
    tile_ok = ~(word(c_last) & word(c_next))
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
        tile_ok.alias("tile_ok"),
    )


def _filter_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Batch-vectorized B10-B12 over many complete documents at once
    (rows pre-sorted by doc_id, begin asc, end desc, prop_id, lit_id —
    TextPointer ordering, TextPointer.java:139-147).

    Extra columns (e.g. ``subject`` in the fused spot+link stage) pass
    through untouched: every filter is a row mask over span columns —
    except the duplicate collapse, which includes ``subject`` when
    present so multi-subject spans survive.

    B12 note: "span exactly tiled by tokens" reduces to a 2-char test —
    the span start is a token start by construction, so tiling holds iff
    a token ends exactly at the span end b, i.e. NOT (suffix[b-1] and
    suffix[b] are both word chars): a word-char run straddling b is the
    only way no token boundary falls on b (punctuation tokens are
    single-char, whitespace never ends a literal because KB literals are
    trimmed). The two chars are tested JVM-side at join time
    (``tile_ok`` column) so the suffix string never shuffles; the flag
    is APPLIED here, after B10/B11, preserving reference order."""
    import numpy as np

    # tile_ok (the JVM-side B12 flag, applied below) never leaves this
    # function — the output shape must match the positional schema
    drop_cols = ["tile_ok"]
    n = len(pdf)
    if n == 0:
        return pdf.drop(columns=drop_cols) if drop_cols else pdf

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
    if "subject" in pdf.columns:
        subj = pdf["subject"].values
        dup[1:] &= subj[1:] == subj[:-1]
    if dup.any():
        pdf = pdf[~dup]
        doc, a, b = pdf["doc_id"].values, pdf["begin"].values, pdf["end"].values
    n = len(pdf)

    # B10 — longest-match (RDFLiteralSpotting.filterLongestMatches:186-214).
    # Vectorized via the declarative equivalent of the greedy anchor
    # scan: drop a span iff SOME strictly-longer span in the doc
    # contains it (the anchor-chain induction in flagship_sql.py's
    # header proves the equivalence; test_spotting_property pins it
    # against brute force). Under the (begin asc, end desc) sort every
    # candidate container precedes the row, so "strictly-longer
    # container exists" reduces to: the exclusive per-doc prefix max of
    # `end` over preceding DISTINCT (begin, end) spans reaches this
    # row's end. Rows sharing an identical span (multi-literal/subject)
    # must not drop each other, hence the distinct-span granularity.
    new_doc = np.r_[True, doc[1:] != doc[:-1]]
    new_span = new_doc | np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
    grp = np.cumsum(new_doc) - 1  # doc ordinal per row
    span_i = np.flatnonzero(new_span)  # first row of each distinct span
    s_doc, s_b = grp[span_i], b[span_i].astype(np.int64)
    OFF = int(b.max()) + 1 if n else 1
    incl = np.maximum.accumulate(s_b + s_doc * OFF) - s_doc * OFF
    excl = np.empty_like(incl)
    excl[0] = -1
    excl[1:] = incl[:-1]
    excl[new_doc[span_i]] = -1  # first span of each doc has no container
    span_keep = excl < s_b
    keep = np.repeat(span_keep, np.diff(np.r_[span_i, n]))
    pdf = pdf[keep]
    if not len(pdf):
        return pdf.drop(columns=drop_cols) if drop_cols else pdf

    # B11 — case filter (filterCaseMatches:216-246), keyed by (doc,
    # surface): a non-exact row drops iff some surviving row with the
    # same surface in the doc is case-exact. Pair-coded bincount, no
    # python set walk.
    surf = pdf["surface"].values
    lit = pdf["literal"].values
    doc2 = pdf["doc_id"].values
    exact_mask = surf == lit
    if exact_mask.any():
        s_codes, _ = pd.factorize(surf)
        d_codes, _ = pd.factorize(doc2)
        pair = d_codes.astype(np.int64) * (int(s_codes.max()) + 1) + s_codes
        p_codes, p_uniq = pd.factorize(pair)
        has_exact = np.zeros(len(p_uniq), dtype=bool)
        has_exact[p_codes[exact_mask]] = True
        in_exact = has_exact[p_codes]
        pdf = pdf[~in_exact | exact_mask]
        if not len(pdf):
            return pdf.drop(columns=drop_cols) if drop_cols else pdf

    # B12 — apply the JVM-computed tiling flag
    ok = pdf["tile_ok"].values.astype(bool)
    pdf = pdf[ok]
    return pdf.drop(columns=drop_cols) if drop_cols else pdf


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
