"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns + typed metadata, processed by Arrow-batched UDFs.

The container ships no codec libraries, so the *decode* step is a
clearly-marked stub (deterministic fake features derived from the raw
bytes) — the Spark-side contract is real and tested: schemas,
``mapInPandas`` batch shapes, size-aware repartitioning, and the
feature-table output layout match what a production decode stage
(PIL/ffmpeg behind the same signatures) would use.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),      # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),    # opaque bytes
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURES_SCHEMA = "media_id long, kind string, n_bytes int, feature array<float>"


def synthesize_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes) for tests."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * (4 + i % 5)
        rows.append(
            (i, kind, f"application/x-fake-{kind}", bytearray(payload), 64 + i, 48 + i, 1000 * (1 + i % 7))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_stub(payload: bytes) -> np.ndarray:
    """STUB decoder — replace with PIL/ffmpeg in production.

    Deterministic: 16 floats derived from byte statistics, so tests can
    assert exact values. Raises on empty payload like a real decoder.
    """
    if not payload:
        raise ValueError("decode_stub: empty payload")
    arr = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.float32)
    chunks = np.array_split(arr, 16)
    return np.array([c.mean() if len(c) else 0.0 for c in chunks], dtype=np.float32) / 255.0


def extract_features(media: DataFrame, batch_target_bytes: int = 64 << 20) -> DataFrame:
    """Decode + featurize media rows (Arrow batches). Before the UDF the
    table is repartitioned so the EXPECTED bytes per partition stay at
    or below ``batch_target_bytes`` (one cheap sizing agg picks the
    partition count; the hash key spreads payloads uniformly across
    it) — one partition of 4K videos cannot straddle an executor's
    memory (the 100 TB concern; harmless at test scale). A single
    payload larger than the target is indivisible and still lands in
    one task."""
    import math

    sized = media.withColumn("n_bytes", F.octet_length("payload"))
    total = sized.agg(F.sum("n_bytes")).first()[0] or 0
    floor_parts = media.sparkSession.sparkContext.defaultParallelism
    n_parts = max(floor_parts, math.ceil(total / batch_target_bytes))
    # spread payloads uniformly so a run of big videos can't pin one task
    sized = sized.repartition(n_parts, F.xxhash64("media_id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_stub(p).tolist() for p in pdf["payload"].values]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "kind": pdf["kind"].values,
                    "n_bytes": pdf["n_bytes"].values,
                    "feature": pd.Series(feats, dtype="object"),
                }
            )

    return sized.select("media_id", "kind", "n_bytes", "payload").mapInPandas(
        gen, FEATURES_SCHEMA
    )


RESIZED_SCHEMA = (
    "media_id long, kind string, width int, height int, payload binary"
)


def resize_stub(payload: bytes, width: int, height: int) -> bytes:
    """STUB resize — replace with PIL ``Image.resize`` in production.

    Deterministic: re-samples the byte stream to ``width*height`` bytes
    by index mapping (nearest-neighbour over the 1-D stream), so the
    output length contract (payload size tracks target dims) and
    determinism are testable without codecs. A zero-byte payload maps
    to an all-zero target-size payload — raising here would abort the
    whole Arrow batch (and job) for one corrupt row."""
    if not payload:
        return b"\x00" * (width * height)
    arr = np.frombuffer(bytes(payload), dtype=np.uint8)
    idx = (np.arange(width * height) * len(arr) // (width * height)).clip(0, len(arr) - 1)
    return arr[idx].tobytes()


def resize_media(media: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Resize image rows to (width, height) — Arrow-batched, metadata
    columns updated alongside the payload; non-image rows pass through
    untouched paths upstream (filter before calling)."""
    imgs = media.filter(F.col("kind") == "image")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [resize_stub(p, width, height) for p in pdf["payload"].values]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "kind": pdf["kind"].values,
                    "width": np.full(len(pdf), width, dtype="int32"),
                    "height": np.full(len(pdf), height, dtype="int32"),
                    "payload": pd.Series(out, dtype="object"),
                }
            )

    return imgs.select("media_id", "kind", "payload").mapInPandas(gen, RESIZED_SCHEMA)


def audio_window_plan(
    media: DataFrame, window_ms: int = 1000, hop_ms: int = 500
) -> DataFrame:
    """Audio windowing plan: (media_id, win_start_ms, win_end_ms) rows
    via JVM-side sequence/explode — the per-window decode/feature step
    consumes this plan in the same Arrow pass as extract_features
    (overlapping windows when hop < window, standard STFT framing).
    Zero/negative/null durations yield zero windows (F.sequence raises
    on an empty 0..-1 range rather than returning an empty array)."""
    aud = media.filter((F.col("kind") == "audio") & (F.col("duration_ms") > 0))
    return aud.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(hop_ms))
        ).alias("win_start_ms"),
        F.col("duration_ms"),
    ).select(
        "media_id",
        "win_start_ms",
        F.least(F.col("win_start_ms") + window_ms, F.col("duration_ms")).alias(
            "win_end_ms"
        ),
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame-sampling *plan*: (media_id, frame_ts_ms) rows via
    JVM-side sequence/explode — the decode of each frame would consume
    this plan in the same Arrow pass as extract_features. Same
    zero-duration guard as :func:`audio_window_plan`."""
    vids = media.filter((F.col("kind") == "video") & (F.col("duration_ms") > 0))
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
