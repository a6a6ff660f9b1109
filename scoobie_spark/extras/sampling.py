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
