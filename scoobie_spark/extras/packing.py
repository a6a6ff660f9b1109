"""Sequence packing for pretraining pipelines.

GPT-style concat-and-chunk: documents are concatenated in a
deterministic hash-shuffled order and the resulting token stream is cut
into fixed-size context windows ("bins"); a document may span a bin
boundary. The operator computes each document's placement in that
stream — which requires a GLOBAL running total of token counts, the
classic anti-pattern if written as one unpartitioned window. Here it is
the same two-phase shape as ``kb.etl.dense_ids`` (range repartition →
tiny per-partition totals job → broadcast offsets → per-partition
window): every exchange is n-way parallel, no single-partition sort, so
the plan survives 10^9 documents by raising the partition count only.

The hash-shuffled order (xxhash64 of the key) is part of the contract:
packing in storage order would correlate neighboring training windows;
the hash order is a deterministic shuffle that is stable across runs,
cluster sizes and resumes — same reasoning as ``sampling.hash_split``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def running_total(
    df: DataFrame,
    weight: str,
    order_cols: list[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``_cum_before`` = sum of ``weight`` over all rows strictly
    before this row in the total order given by ``order_cols`` — with
    NO single-partition exchange (the weighted twin of
    ``kb.etl.dense_ids``; see its docstring for the two-phase scheme
    and the localCheckpoint rationale — a change to either copy of the
    skeleton should be mirrored in the other).

    ``order_cols`` must be a UNIQUE total order (append a key column
    as tie-break): the in-partition window uses the default RANGE
    frame, so tied rows would each absorb ALL their peers' weights."""
    spark = df.sparkSession
    if num_partitions:
        n = num_partitions
    else:
        try:
            n = int(spark.conf.get("spark.sql.shuffle.partitions"))
        except (ValueError, TypeError):
            n = spark.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n, *[F.col(c) for c in order_cols])
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    sums = sorted(
        (r["_pid"], r["s"])
        for r in ranged.groupBy("_pid")
        .agg(F.coalesce(F.sum(weight), F.lit(0)).alias("s"))
        .collect()
    )
    offsets, acc = [], 0
    for pid, s in sums:
        offsets.append((pid, acc))
        acc += int(s)
    off_df = spark.createDataFrame(offsets or [(0, 0)], "_pid int, _off long")
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        ranged.join(F.broadcast(off_df), "_pid")
        .withColumn(
            "_cum_before",
            (F.col("_off") + F.sum(weight).over(w) - F.col(weight)).cast("long"),
        )
        .drop("_pid", "_off")
    )


def pack_chunks(
    docs: DataFrame,
    cap: int = 2048,
    key: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Concat-and-chunk placement for every document: concatenate all
    documents in deterministic hash order and cut the token stream
    every ``cap`` tokens.

    Returns (doc_id, n_tokens, tok_start, bin_first, bin_last):
    ``tok_start`` is the document's offset in the global token stream,
    ``bin_first``/``bin_last`` the context windows it lands in (equal
    unless the document spans a boundary). Token counts use the
    family's single-space split with the NULL-as-empty contract
    (NULL text → the one-element [''] list → 1 token).
    """
    if cap <= 0:
        raise ValueError(f"cap must be > 0 tokens, got {cap}")
    n_tok = F.size(F.split(F.coalesce(F.col(text), F.lit("")), " "))
    base = docs.select(
        F.col(key).alias("doc_id"),
        n_tok.cast("long").alias("n_tokens"),
        F.xxhash64(F.col(key)).alias("_ord"),
    )
    cum = running_total(base, "n_tokens", ["_ord", "doc_id"])
    # DIV = exact integral division (a double `/` would round above
    # 2^53 tokens — real at 10^12-doc scale)
    return cum.select(
        "doc_id",
        "n_tokens",
        F.col("_cum_before").alias("tok_start"),
        F.expr(f"_cum_before DIV {cap}").alias("bin_first"),
        F.expr(f"(_cum_before + n_tokens - 1) DIV {cap}").alias("bin_last"),
    )
