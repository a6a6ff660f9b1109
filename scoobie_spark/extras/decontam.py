"""Benchmark decontamination via word n-gram overlap.

The standard eval-leakage check for training corpora (public spec: the
GPT-3 appendix-C / PaLM / Llama "13-gram overlap" decontamination
recipes): a training document is contaminated if it shares at least
one word n-gram with any benchmark text.

Scale shape (the 100 TB plan):

* both sides tokenize + shingle with Column expressions only
  (lower → whitespace split → ``transform``/``slice`` n-grams) — no
  Python, fully codegen'd;
* grams are joined on ``xxhash64(gram)`` (8-byte keys) instead of the
  gram strings, cutting shuffle bytes ~8× on typical gram lengths;
* the benchmark side is tiny by nature (eval sets), so its distinct
  gram-hash set is broadcast — the docs side never shuffles: the whole
  operator is a map-side semi-join plus one partial-aggregable
  ``groupBy(doc_id)``.

The only approximation is the 64-bit gram hash: two *different* grams
colliding across the doc/benchmark sides would miscount (probability
~|doc grams|·|bench grams|/2^64 — vanishing). The DuckDB oracle joins
on the gram strings themselves, so the differential check also guards
the hash-join shortcut.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _grams(docs: DataFrame, key_expr, text: str, n: int) -> DataFrame:
    """Distinct (key, xxhash64(word-n-gram)) pairs per row of ``docs``."""
    toks = docs.select(
        key_expr.alias("doc_id"),
        F.filter(
            F.split(F.lower(F.trim(F.col(text))), r"\s+"),
            lambda x: F.length(x) > 0,
        ).alias("t"),
    )
    grams = F.expr(
        f"transform(slice(t, 1, greatest(size(t) - {n - 1}, 0)),"
        f" (x, i) -> concat_ws(' ', slice(t, i + 1, {n})))"
    )
    return (
        toks.select("doc_id", F.explode(grams).alias("g"))
        .select("doc_id", F.xxhash64("g").alias("gh"))
        .distinct()
    )


def contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    key: str = "doc_id",
    text: str = "text",
    bench_text: str = "text",
    n: int = 8,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Per-doc ``(doc_id, n_grams, n_hits, contaminated)``.

    ``n_grams`` = distinct word ``n``-grams in the document, ``n_hits``
    = how many of those appear in *any* benchmark text, ``contaminated``
    = 1 when ``n_hits > 0`` (int for schema stability). Documents
    shorter than ``n`` words have ``n_grams = 0`` and are clean.

    ``broadcast_bench`` should stay on unless the benchmark side is
    itself corpus-scale; off, the join is a plain hash equi-join on the
    8-byte gram hash.
    """
    dg = _grams(docs, F.col(key), text, n)
    bg = _grams(benchmark, F.lit(0), bench_text, n).select("gh").distinct()
    if broadcast_bench:
        bg = F.broadcast(bg)
    tot = dg.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    hits = dg.join(bg, "gh").groupBy("doc_id").agg(F.count("*").alias("n_hits"))
    return (
        docs.select(F.col(key).alias("doc_id"))
        .distinct()
        .join(tot, "doc_id", "left")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).cast("int").alias("contaminated"),
        )
    )
