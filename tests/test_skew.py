"""Skew handling (north_rule: "handle skew from giant repos via salted
repartitioning and AQE").

The pipeline spreads input by ``xxhash64(repo, path, commit)`` before
the Arrow stages when the source is under-parallel or when
``salt_partitions`` forces it (an already-parallel parquet scan passes
through unshuffled — pipeline.spread_input). When the spread runs, one
giant repo cannot pin a partition: the hash includes path+commit,
which differ per file even inside a single repo.
"""

from pyspark.sql import functions as F

from scoobie_spark.fixtures import synth_corpus


def test_giant_repo_spreads_across_partitions(spark):
    # synth corpus plants one "repo-giant" holding ~1/3 of all rows
    corpus = synth_corpus(spark, n_docs=3000, n_instances=50)
    giant_frac = (
        corpus.filter(F.col("repo") == "repo-giant").count() / corpus.count()
    )
    assert giant_frac > 0.25  # the skew is real

    n_parts = 16
    spread = corpus.repartition(n_parts, F.xxhash64("repo", "path", "commit"))
    sizes = [
        r["count"]
        for r in spread.groupBy(F.spark_partition_id().alias("pid")).count().collect()
    ]
    assert len(sizes) == n_parts
    mean = sum(sizes) / len(sizes)
    assert max(sizes) / mean < 1.5, f"skewed partitions: {sorted(sizes)}"

    # naive partitioning by repo alone WOULD skew (sanity contrast)
    naive = corpus.repartition(n_parts, F.col("repo"))
    nsizes = [
        r["count"]
        for r in naive.groupBy(F.spark_partition_id().alias("pid")).count().collect()
    ]
    assert max(nsizes) / (sum(nsizes) / len(nsizes)) > 2.0


def test_input_spread_is_adaptive(spark):
    """spread_input shuffles an under-parallel source, passes an
    already-parallel one through untouched (at 100 TB a blanket
    full-input shuffle ahead of a narrow Arrow pass would dominate the
    job), and always spreads when salt_partitions forces it."""
    from scoobie_spark.pipeline import PipelineConfig, spread_input

    corpus = synth_corpus(spark, n_docs=200, n_instances=20)
    target = spark.sparkContext.defaultParallelism * 2

    narrow = corpus.coalesce(1)
    spread = spread_input(spark, narrow, PipelineConfig())
    assert spread.rdd.getNumPartitions() == target

    wide = corpus.repartition(target + 4)
    passed = spread_input(spark, wide, PipelineConfig())
    assert passed is wide  # no shuffle node added at all

    forced = spread_input(spark, wide, PipelineConfig(salt_partitions=8))
    assert forced is not wide and forced.rdd.getNumPartitions() == 8


def test_source_parallelism_probe_runs_no_job(spark):
    """_source_parallelism must not execute upstream stages: under AQE,
    Dataset.rdd materializes every query stage just to read a runtime
    partition count — the probe reads the pre-adaptive sparkPlan
    instead, where counts are static."""
    from scoobie_spark.pipeline import _source_parallelism

    wide = (
        spark.range(0, 100_000, 1, 4)
        .withColumn("s", F.sha2(F.col("id").cast("string"), 256))
        .repartition(12, "s")
    )
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    assert _source_parallelism(wide) == 12
    after = len(tracker.getJobIdsForGroup(None) or [])
    # no shuffle map stage ran (broadcast-bearing plans may still
    # collect their tiny dim sides at prepare() — see the docstring)
    assert after == before, "the parallelism probe executed a job"
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_source_parallelism_probe_never_touches_conf(spark, monkeypatch):
    """The r3 probe toggled spark.sql.adaptive.enabled session-wide —
    a concurrent query planned inside the probe window (streaming
    foreachBatch is in-repo) would silently run without AQE. The probe
    must now read the static plan without ANY conf write, so a query
    planned at any instant during the probe sees AQE on."""
    from scoobie_spark.pipeline import _source_parallelism

    calls = []
    real_set = spark.conf.set
    monkeypatch.setattr(
        spark.conf, "set", lambda *a, **k: (calls.append(a), real_set(*a, **k))
    )
    wide = (
        spark.range(0, 10_000, 1, 4)
        .withColumn("s", F.sha2(F.col("id").cast("string"), 256))
        .repartition(12, "s")
    )
    assert _source_parallelism(wide) == 12
    assert calls == [], f"probe wrote session conf: {calls}"
