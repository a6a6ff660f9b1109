"""Deterministic hash-based dataset splitting and sampling.

The standard large-scale pipeline pattern for stable train/val/test
cuts: ``bucket = pmod(xxhash64(key), buckets)`` compared against
cumulative fraction thresholds. Unlike ``rand()``-based sampling the
assignment is a pure function of the key — stable across runs, cluster
sizes, partitionings and resumes, join-consistent between tables that
share the key, and uniform (no skew) because xxhash64 mixes well. Pure
JVM Column expressions: no UDF, no RNG state per task, fully
whole-stage-codegen'd, and SQL-oracle-checkable through the bit-exact
xxhash64 replay in :mod:`scoobie_spark.xxh64_sql` (``hashlong_sql``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..pipeline import spread_if_narrow


def hash_split(
    df: DataFrame,
    key: str,
    fractions: dict[str, float],
    buckets: int = 1_000_000,
) -> DataFrame:
    """Add a ``split`` column assigning each row to one of the named
    fractions by its key hash.

    ``fractions`` must sum to 1 (insertion order fixes the bucket
    layout); the last split absorbs the bucket-rounding remainder so
    every row is labeled. Same key ⇒ same split, always.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    names = list(fractions)
    b = F.pmod(F.xxhash64(F.col(key)), F.lit(buckets))
    expr = None
    acc = 0.0
    for name in names[:-1]:
        acc += fractions[name]
        thr = int(round(acc * buckets))
        expr = F.when(b < thr, name) if expr is None else expr.when(b < thr, name)
    expr = F.lit(names[0]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", expr)


def hash_sample(
    df: DataFrame, key: str, rate: float, buckets: int = 1_000_000
) -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows by key hash —
    the resumable, cluster-size-independent form of ``df.sample``."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    thr = int(round(rate * buckets))
    return df.filter(F.pmod(F.xxhash64(F.col(key)), F.lit(buckets)) < thr)


def stratified_sample(
    df: DataFrame, key: str, group: str, n_per_group: int
) -> DataFrame:
    """Exact per-stratum quota sampling: keep the ``n_per_group`` rows
    of every ``group`` with the smallest ``xxhash64(key)`` (key
    tie-break) — the deterministic equivalent of equal-size stratified
    random sampling (balanced eval sets, per-domain caps). Unlike
    :func:`hash_sample`'s fraction filter, the quota is EXACT per
    stratum regardless of stratum size, and the kept set is stable
    under corpus growth for rows whose hash rank stays under the quota.

    Returns ``(key, group, hash_rank ≤ n_per_group)``. Scale shape: one
    hash-partitioned window per group (each stratum sorts only its own
    rows); the hash order means no upstream sort or skew key — a
    giant stratum is one partition, so for very hot groups raise the
    shuffle partition count or pre-thin with :func:`hash_sample` (the
    training_pairs skew-guard pattern)."""
    if n_per_group <= 0:
        raise ValueError(f"n_per_group must be > 0, got {n_per_group}")
    from pyspark.sql import Window

    w = Window.partitionBy(group).orderBy(
        F.xxhash64(F.col(key)).asc(), F.col(key).asc()
    )
    return (
        df.select(F.col(key), F.col(group))
        .withColumn("hash_rank", F.row_number().over(w))
        .filter(F.col("hash_rank") <= n_per_group)
    )


# --------------------------------------------------------------------------
# DSIR-style importance selection
# --------------------------------------------------------------------------

def _grams(text: str):
    """Lowercased word unigrams + space-joined bigrams, split on a
    single space (the family's NULL-as-empty contract: NULL text is the
    one-element [''] token list)."""
    toks = F.split(F.lower(F.coalesce(F.col(text), F.lit(""))), " ")
    n = F.size(toks)
    bi = F.transform(
        F.slice(toks, 1, F.greatest(n - F.lit(1), F.lit(0))),
        lambda x, i: F.concat_ws(" ", x, F.element_at(toks, i + F.lit(2))),
    )
    return F.concat(toks, bi)


def dsir_select(
    docs: DataFrame,
    target: DataFrame,
    k: int,
    n_buckets: int = 4096,
    alpha: float = 1.0,
    seed: int = 7,
    key: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """DSIR-style importance selection (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): fit
    hashed-ngram bag models over a target corpus and the raw corpus,
    score every raw document by its importance log-ratio, and select k
    documents by Gumbel-top-k (sampling without replacement ∝ the
    softmax of the scores, made deterministic by a hash-seeded uniform).

    Determinism/parity design: bucket weights are snapped to integer
    MICRO-units (round(log-ratio · 10^6) as long), so the per-document
    score is an exact integer sum — order-independent under Spark's
    nondeterministic partial-aggregation order and replayable
    value-for-value in SQL. The Gumbel noise derives from
    pmod(xxhash64(key, seed), 2^20) — the same bit-replayable RNG as
    ``hash_split``.

    Returns (doc_id, score_micro, sel_micro, selected) for EVERY raw
    doc. Scale shape: gram explode → groupBy(bucket) counts (map-side
    combinable, ≤ n_buckets result rows), weights broadcast back, and
    the top-k is orderBy+limit — Spark's distributed TakeOrdered, not a
    single-partition window sort.
    """
    import math

    if alpha <= 0:
        raise ValueError(f"alpha must be > 0 (smooths empty buckets), got {alpha}")
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    B = n_buckets

    def bucket(gcol):
        return F.pmod(F.xxhash64(gcol), F.lit(B))

    # ONE gram pass over the raw corpus: per-(doc, bucket) counts feed
    # the raw bag model, the per-doc scores, AND the totals. The target
    # corpus gets its own (usually much smaller) pass — it need not be
    # a subset of ``docs``.
    doc_b = (
        spread_if_narrow(docs, key)
        .select(F.col(key).alias("doc_id"), F.explode(_grams(text)).alias("g"))
        .groupBy("doc_id", bucket(F.col("g")).alias("b"))
        .agg(F.count("*").alias("c"))
        .localCheckpoint()
    )
    t_cnt = (
        target.select(F.explode(_grams(text)).alias("g"))
        .groupBy(bucket(F.col("g")).alias("b"))
        .agg(F.count("*").alias("tc"))
        .localCheckpoint()
    )
    r_cnt = doc_b.groupBy("b").agg(F.sum("c").alias("rc")).localCheckpoint()
    T = t_cnt.agg(F.sum("tc")).first()[0] or 0
    R = r_cnt.agg(F.sum("rc")).first()[0] or 0
    denom = math.log(T + alpha * B) - math.log(R + alpha * B)
    w = (
        t_cnt.join(r_cnt, "b", "full")
        .select(
            "b",
            F.round(
                (
                    F.log(F.coalesce(F.col("tc"), F.lit(0)) + F.lit(alpha))
                    - F.log(F.coalesce(F.col("rc"), F.lit(0)) + F.lit(alpha))
                    - F.lit(denom)
                )
                * F.lit(1_000_000.0)
            ).cast("long").alias("w_micro"),
        )
    )
    scores = (
        doc_b.join(F.broadcast(w), "b")
        .groupBy("doc_id")
        .agg(F.sum(F.col("c") * F.col("w_micro")).alias("score_micro"))
    )
    M = 1 << 20
    u = (
        F.pmod(
            F.xxhash64(F.col("doc_id"), F.lit(seed).cast("long")), F.lit(M)
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(M))
    gum = F.round(-F.log(-F.log(u)) * F.lit(1_000_000.0)).cast("long")
    sel = scores.withColumn("sel_micro", F.col("score_micro") + gum)
    topk = (
        sel.orderBy(F.col("sel_micro").desc(), F.col("doc_id"))
        .limit(k)
        .select("doc_id", F.lit(True).alias("selected"))
    )
    return (
        sel.join(topk, "doc_id", "left")
        .select(
            "doc_id",
            "score_micro",
            "sel_micro",
            F.coalesce("selected", F.lit(False)).alias("selected"),
        )
    )


# --------------------------------------------------------------------------
# Domain-mixture rebalancing (DoReMi-style targets, deterministic apply)
# --------------------------------------------------------------------------

def domain_mix(
    docs: DataFrame,
    weight_expr=None,
    buckets: int = 1_000_000,
    key: str = "doc_id",
    text: str = "text",
    source: str = "source",
) -> DataFrame:
    """Rebalance a multi-domain corpus toward integer target weights by
    deterministic downsampling — the mixture step every multi-source
    training-data pipeline runs (the public DoReMi / Pile recipe shape:
    per-domain target proportions applied as sampling rates).

    ``weight_expr`` is a Column of POSITIVE integer target weights per
    row (constant within a domain); domain ``s`` should end up with a
    token share ∝ ``w_s``. The binding domain ``m`` — the one whose
    current token share falls shortest of its target, i.e. argmax of
    ``w_s / tokens_s`` over domains with tokens (ties → lowest source
    string) — keeps everything; every other domain keeps the fraction
    ``(w_s * tokens_m) / (tokens_s * w_m)`` of its docs. The plan is
    EXACT integer arithmetic end to end (cross-multiplied argmax,
    floor-divided bucket thresholds: ``thr_s = buckets*w_s*tok_m //
    (tok_s*w_m)``), so the SQL oracle replays it without a single float;
    the apply is the family's resumable hash gate
    (``pmod(xxhash64(key), buckets) < thr_s`` — bit-replayable via
    xxh64_sql.hashlong_sql). Domains with zero tokens keep everything
    and never bind.

    Two passes, like any real mixer: a planning aggregate (one row per
    domain, collected driver-side — the broadcastable model, same
    pattern as the ANN centroids) and the gated re-aggregate. Returns
    one row per domain: ``(source, w, docs_in, tokens_in, thr,
    docs_out, tokens_out)``.
    """
    from . import textstats

    w = (weight_expr if weight_expr is not None else F.lit(1)).cast("long")
    tc = textstats.token_counts(docs, key=key, text=text).select(
        "doc_id", "ws_tokens"
    )
    d = docs.select(
        F.col(key).alias("doc_id"), F.col(source).alias("source"), w.alias("w")
    ).join(tc, "doc_id")
    stats = sorted(
        (r["source"], int(r["w"]), int(r["tokens_in"]))
        for r in d.groupBy("source", "w")
        .agg(F.sum("ws_tokens").alias("tokens_in"))
        .collect()
    )
    with_tok = [r for r in stats if r[2] > 0]
    m = None
    for r in with_tok:
        # exact rational argmax of w/tok: r beats m iff w_r*tok_m > w_m*tok_r
        if m is None or r[1] * m[2] > m[1] * r[2]:
            m = r
    thr = {
        s: buckets
        if tok == 0 or m is None
        else min(buckets, (buckets * wt * m[2]) // (tok * m[1]))
        for (s, wt, tok) in stats
    }
    spark = docs.sparkSession
    thr_df = spark.createDataFrame(
        [(s, int(t)) for s, t in sorted(thr.items())], "source string, thr long"
    )
    bkt = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(buckets))
    kept = F.col("bkt") < F.col("thr")
    return (
        d.join(F.broadcast(thr_df), "source")
        .withColumn("bkt", bkt)
        .groupBy("source", "w", "thr")
        .agg(
            F.count("*").alias("docs_in"),
            F.sum("ws_tokens").alias("tokens_in"),
            F.count(F.when(kept, 1)).alias("docs_out"),
            F.coalesce(
                F.sum(F.when(kept, F.col("ws_tokens"))), F.lit(0).cast("long")
            ).alias("tokens_out"),
        )
        .select(
            "source", "w", "docs_in", "tokens_in", "thr", "docs_out", "tokens_out"
        )
    )
