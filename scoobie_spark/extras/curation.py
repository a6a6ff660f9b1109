"""Curation funnel: the chained keep/drop pipeline a training-data
curation run applies (C4 / Gopher / FineWeb style — Raffel et al. 2020,
Rae et al. 2021 A1, Penedo et al. 2024), reported the way those papers
report it: one row per stage with the surviving document count.

Stages (each filters the previous stage's survivors):

* ``0_all``          every document
* ``1_lang``         language-ID gate (:func:`textstats.language_id`)
* ``2_quality``      rule gates on :func:`textstats.quality_scores`
                     (min tokens, min stopword ratio)
* ``3_repetition``   Gopher repetition gates on
                     :func:`textstats.repetition_scores`
* ``4_exact_dedup``  exact-text dedup keeps the lowest doc_id
                     (:func:`dedup.exact_duplicates`)
* ``5_near_dedup``   n-gram Jaccard near-dup drop: a document is dropped
                     when some LOWER-keyed stage-4 survivor pairs with
                     it at ≥ ``jaccard_threshold``
                     (:func:`dedup.ngram_jaccard_pairs`). Single-level
                     rule — no transitive cascade — so the result is a
                     pure function of the pair set, not of drop order.

Determinism note: the float gates compare the ROUND-6 signal values —
exactly the quantities the green ``quality_scores`` /
``quality_repetition`` oracles verify hash-for-hash against DuckDB — so
a gate decision can never sit on an engine-vs-oracle rounding boundary.

Scale shape: every signal is an existing operator with its own audited
plan (Column expressions / one Arrow pass for language ID / bounded
n-gram aggs); the funnel adds only doc_id equi-joins, one semi-join for
the near-dup drop set and a single global 6-counter aggregate
(map-side combinable). Nothing here is new shuffle machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup, textstats

# shared engine/oracle thresholds — queries.SQL_CURATION_FUNNEL is
# generated from these same constants, so the two sides cannot drift
LANG = "en"
MIN_TOKENS = 24
MIN_STOPWORD_RATIO = 0.01
MAX_DUP_WORD_FRAC = 0.66
MAX_TOP_BIGRAM_FRAC = 0.08
JACCARD_THRESHOLD = 0.5
JACCARD_N = 3

STAGES = [
    "0_all",
    "1_lang",
    "2_quality",
    "3_repetition",
    "4_exact_dedup",
    "5_near_dedup",
]


def curation_funnel(
    docs: DataFrame,
    key: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Returns ``(stage string, n_docs long)`` — six rows, monotonically
    non-increasing counts down the funnel."""
    qual = textstats.quality_scores(docs, key=key, text=text)
    rep = textstats.repetition_scores(docs, key=key, text=text)
    lang = textstats.language_id(docs, key=key, text=text)
    keep = dedup.exact_duplicates(docs, key=key, text=text).select(
        "doc_id", "keeper_id"
    )
    pairs = dedup.ngram_jaccard_pairs(
        docs, n=JACCARD_N, threshold=JACCARD_THRESHOLD, key=key, text=text
    ).select("a", "b")

    s1 = F.col("lang_guess") == LANG
    s2 = (
        s1
        & (F.col("n_tokens") >= MIN_TOKENS)
        & (F.round("stopword_ratio", 6) >= MIN_STOPWORD_RATIO)
    )
    # repetition_scores already rounds to 6 internally
    s3 = (
        s2
        & (F.col("dup_word_frac") <= MAX_DUP_WORD_FRAC)
        & (F.col("top_bigram_frac") <= MAX_TOP_BIGRAM_FRAC)
    )
    s4 = s3 & (F.col("keeper_id") == F.col("doc_id"))
    flags = (
        docs.select(F.col(key).alias("doc_id"))
        .join(lang, "doc_id")
        .join(qual, "doc_id")
        .join(rep, "doc_id")
        .join(keep, "doc_id")
        .select(
            "doc_id",
            s1.alias("s1"),
            s2.alias("s2"),
            s3.alias("s3"),
            s4.alias("s4"),
        )
        # flags feeds BOTH the near-dup drop set and the final counts;
        # without a lineage cut the whole signal pipeline (four joins +
        # the language-ID Arrow pass) executes twice. Lazy
        # localCheckpoint, not cache(): see dedup.py:122.
        .localCheckpoint(eager=False)
    )
    drops = (
        pairs.join(
            flags.filter(F.col("s4")).select(F.col("doc_id").alias("a")), "a"
        )
        .select("b")
        .distinct()
    )
    flags5 = flags.join(drops, flags["doc_id"] == drops["b"], "left").select(
        "s1", "s2", "s3", "s4", (F.col("s4") & F.col("b").isNull()).alias("s5")
    )
    agg = flags5.agg(
        F.count("*").alias("c0"),
        *[
            F.count(F.when(F.col(f"s{i}"), 1)).alias(f"c{i}")
            for i in range(1, 6)
        ],
    )
    stack_args = ", ".join(f"'{s}', c{i}" for i, s in enumerate(STAGES))
    return agg.select(
        F.expr(f"stack(6, {stack_args}) AS (stage, n_docs)")
    )
