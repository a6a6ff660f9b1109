"""Structured Streaming surface.

The reference is strictly batch (SURVEY.md §1: no streaming operator
anywhere), so streaming here is an *ingestion mode*, not a parity
requirement: a corpus that arrives as files/Kafka can flow through the
same extraction pipeline.

* :func:`streaming_extract` — readStream source → ``foreachBatch`` that
  runs the full batch pipeline per micro-batch and appends triples to a
  partitioned sink. foreachBatch is the right tool because the pipeline
  contains multi-stage joins and grouped-map stages that Structured
  Streaming cannot express incrementally; each micro-batch is a bounded
  DataFrame, so the whole operator library applies unchanged, and the
  sink stays exactly-once under the streaming checkpoint.
* :func:`windowed_event_counts` / :func:`sessionized_events` — native
  incremental operators (watermark + tumbling window / session_window)
  for the events-stream shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .kb.model import KB
from .pipeline import PipelineConfig, extract_triples


def streaming_extract(
    spark: SparkSession,
    stream_docs: DataFrame,
    kb: KB,
    out_dir: str,
    checkpoint_dir: str,
    trigger_seconds: int | None = None,
    config: PipelineConfig | None = None,
):
    """Run the KG-construction pipeline continuously over a streaming
    corpus; returns the StreamingQuery. Triples land in ``out_dir``
    partitioned by (batch_id, graph); restart-safe: foreachBatch may
    REPLAY a batch whose write finished but whose offset commit did
    not, so the write is a dynamic partition OVERWRITE of that batch's
    own partitions — a replayed batch rewrites exactly its previous
    output instead of appending duplicates (the idempotence the
    batch_id contract requires of the sink).

    ``config`` carries the full batch-pipeline surface (resolver,
    SPARQL template, trained NP-chunker gate, ...) into every
    micro-batch; ``materialize_kb`` is forced off (the KB is cut once
    here, not per batch) and per-stage ``checkpoint_dir`` resume is
    unsupported inside foreachBatch (batches would collide on the same
    stage files), so it is rejected."""
    import dataclasses

    if config is not None and config.checkpoint_dir is not None:
        raise ValueError(
            "PipelineConfig.checkpoint_dir is not supported under "
            "streaming_extract — batches would collide on stage files; "
            "use the streaming checkpoint_dir argument instead"
        )
    # one up-front KB cut replaces the per-batch cut — but honor an
    # explicit materialize_kb=False opt-out (a parquet-backed KB needs
    # no lineage cut, and eagerly localCheckpointing its tables would
    # pin executor storage for the stream's lifetime)
    if config is None or config.materialize_kb:
        kb = kb.materialize()

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        # fresh metrics list per micro-batch: dataclasses.replace keeps
        # field references, so reusing the caller's list would interleave
        # every batch's stage records and grow without bound on a
        # long-running stream
        cfg = dataclasses.replace(
            config or PipelineConfig(), materialize_kb=False, metrics=[]
        )
        triples = extract_triples(spark, batch_df, kb, cfg)
        (
            triples.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id", "graph")
            .parquet(out_dir)
        )

    writer = stream_docs.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


DEDUP_OUT_SCHEMA = "sha256 string, repo string, path string, commit string"


def streaming_dedup_first(stream_docs: DataFrame) -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``): emit each
    content hash the FIRST time it is seen across the whole stream —
    streaming exact-dedup for a training-data ingest pipeline. State per
    sha256 group is one int flag; output mode 'append'.

    At scale the state store shards by the group key across executors
    (RocksDB state backend on a real cluster); the operator is the
    streaming twin of ``extras.dedup.exact_duplicates``."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def first_seen(key, pdfs, state: GroupState):
        import pandas as pd

        seen = state.get[0] if state.exists else 0
        first = None
        for pdf in pdfs:
            if seen == 0 and len(pdf):
                first = pdf.iloc[:1][["sha256", "repo", "path", "commit"]]
                seen = 1
        state.update((seen,))
        if first is not None:
            yield first

    return (
        stream_docs.select("sha256", "repo", "path", "commit")
        .groupBy("sha256")
        .applyInPandasWithState(
            first_seen,
            outputStructType=DEDUP_OUT_SCHEMA,
            stateStructType="seen int",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling/sliding-window counts per event_type —
    works on both static and streaming DataFrames."""
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    df = events.withWatermark("ts", watermark) if events.isStreaming else events
    return df.groupBy(w.alias("win"), "event_type").agg(
        F.count("*").alias("n"), F.sum("value").alias("total")
    )


def sessionized_events(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """session_window-based sessionization (the streaming-native twin of
    queries.q_events_sessionize)."""
    df = events.withWatermark("ts", watermark) if events.isStreaming else events
    return df.groupBy(
        F.session_window("ts", gap).alias("session"), "user_id"
    ).agg(F.count("*").alias("n_events"), F.sum("value").alias("total"))


def streaming_code_edges(
    stream_files: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    trigger_seconds: int | None = None,
):
    """Incrementally maintain the code-KG import-edge table
    (extras.codegraph.import_edges) over a streaming repo-file source;
    returns the StreamingQuery. Extraction is strictly per-file, so
    each micro-batch is independent and the union of batch outputs IS
    the batch-mode edge set — the streaming twin of a 100 TB
    continuously-refreshing corpus. Same restart-safe sink contract as
    :func:`streaming_extract`: a replayed batch dynamically OVERWRITES
    its own batch_id partition instead of appending duplicates."""
    from .extras.codegraph import import_edges

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        (
            import_edges(batch_df)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    writer = stream_files.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_latest_snapshot(
    stream_files: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    trigger_seconds: int | None = None,
):
    """Merge-on-read streaming twin of
    ``extras.codestats.latest_snapshot``: as commits stream in, each
    micro-batch reduces ITSELF to per-(repo, path) newest-version rows
    (the same struct-max rule, digests only — file text never reaches
    the sink) and appends them to a ``batch_id``-partitioned log;
    :func:`read_latest_snapshot` folds the log back to the live
    HEAD-snapshot view with the same rule. This is precisely the
    Iceberg ``MERGE INTO`` / equality-delete pattern expressed as the
    repo's documented parquet stand-in (append-only writes, compaction
    deferred to the read — the lakehouse merge-on-read contract;
    swap note in kb/model.py applies here too).

    Restart safety matches :func:`streaming_code_edges`: a replayed
    batch dynamically OVERWRITES its own batch_id partition, so the
    log stays exactly-once under retries. Each version row of the
    stream lands in exactly one batch, so the folded n_versions equals
    batch-mode's count."""
    from .extras.codestats import latest_snapshot

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        (
            latest_snapshot(batch_df)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    writer = stream_files.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_latest_snapshot(spark, out_dir: str) -> DataFrame:
    """Fold the :func:`streaming_latest_snapshot` log to the live view
    ``(repo, path, commit, n_versions, content_sha256)`` — the
    merge-on-read step. The cross-batch fold breaks commit ties by the
    DIGEST string where batch mode breaks them by content text;
    identical whenever commit ids are unique per (repo, path) version
    (the table contract — a tie means the same commit re-delivered,
    which dynamic partition overwrite already deduplicates)."""
    log = spark.read.parquet(out_dir)
    m = F.max(
        F.struct(
            F.col("commit").alias("c"), F.col("content_sha256").alias("v")
        )
    )
    return (
        log.groupBy("repo", "path")
        .agg(m.alias("m"), F.sum("n_versions").cast("long").alias("n_versions"))
        .select(
            "repo",
            "path",
            F.col("m.c").alias("commit"),
            "n_versions",
            F.col("m.v").alias("content_sha256"),
        )
    )
