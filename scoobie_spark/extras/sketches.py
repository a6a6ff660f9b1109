"""Distributed sketches over text corpora.

KMV (k-minimum-values) distinct counting — Bar-Yossef et al. 2002,
"Counting distinct elements in a data stream" (public spec): hash every
element uniformly into [0, 2^64); the k-th smallest distinct hash h_k
estimates the distinct count as (k-1) · 2^64 / h_k. Unlike HyperLogLog
(whose register layout differs per implementation) the KMV sketch is a
pure function of the hash values, so the whole operator — including the
estimate, computed as EXACT integer division in decimal/HUGEINT — is
value-replayable in ANSI SQL through the bit-exact xxhash64 replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 2^64 as a decimal literal (the KMV hash-space size); Spark longs are
# signed, so unsigned order/arithmetic go through XOR-flip and
# DECIMAL(38,0) respectively
_TWO64 = "18446744073709551616"
_SIGN = -9223372036854775808


def kmv_distinct(
    docs: DataFrame,
    k: int = 64,
    group: str = "source",
    key: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Per-``group`` distinct-token estimate via a k-minimum-values
    sketch, next to the exact count for error inspection:
    ``(group, n_distinct_exact, kth_min_hash, est_distinct)``.

    Tokenization = trim + lower + whitespace split (the textstats
    convention). Hash = ``xxhash64(token)``; unsigned ORDER over the
    signed longs via the sign-bit XOR flip; ``kth_min_hash`` is the
    k-th smallest distinct hash (signed, as Spark emits it). Groups
    with < k distinct tokens report the exact count (the standard KMV
    small-set rule). The estimate is ``(k-1) · 2^64 div u(h_k)`` in
    DECIMAL(38,0) — exact integer division, no float anywhere.

    Scale shape: the (group, hash) distinct is a map-side-combinable
    aggregation (the token STRINGS never shuffle — only 8-byte
    hashes); the k-min rank is a per-group window over the group's
    DISTINCT hash set (vocabulary-bounded, not corpus-bounded). At
    planetary vocabularies pre-thin with a static hash threshold
    (keep h < 2^64 · c·k/|V̂|) before the window — the sketch only
    ever needs the k smallest."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    from ..pipeline import spread_if_narrow

    docs = spread_if_narrow(docs, key)
    t = F.coalesce(F.col(text), F.lit(""))
    toks = docs.select(
        F.col(group).alias("grp"),
        F.explode(
            F.filter(F.split(F.lower(F.trim(t)), r"\s+"), lambda x: F.length(x) > 0)
        ).alias("term"),
    )
    hashes = toks.select(
        "grp", F.xxhash64("term").alias("h")
    ).distinct()
    w = Window.partitionBy("grp").orderBy(
        F.col("h").bitwiseXOR(F.lit(_SIGN)).asc(), F.col("h").asc()
    )
    ranked = hashes.withColumn("r", F.row_number().over(w))
    stats = ranked.groupBy("grp").agg(
        F.count("*").alias("n_distinct_exact"),
        F.max(F.when(F.col("r") == k, F.col("h"))).alias("kth"),
    )
    u_kth = F.when(
        F.col("kth") < 0,
        F.col("kth").cast("decimal(38,0)") + F.lit(_TWO64).cast("decimal(38,0)"),
    ).otherwise(F.col("kth").cast("decimal(38,0)"))
    # (k-1)·2^64 precomputed as one literal: a runtime decimal multiply
    # would hit Spark's precision-capping rules; the quotient is ≤ the
    # true distinct count scale, well inside BIGINT
    numer = str((k - 1) << 64)
    est = F.expr(f"CAST(CAST('{numer}' AS DECIMAL(38,0)) div ukth AS BIGINT)")
    return (
        stats.withColumn("ukth", u_kth)
        .select(
            F.col("grp").alias(group),
            "n_distinct_exact",
            F.coalesce(F.col("kth"), F.lit(0).cast("long")).alias("kth_min_hash"),
            F.when(F.col("kth").isNull(), F.col("n_distinct_exact"))
            .otherwise(est)
            .alias("est_distinct"),
        )
    )
