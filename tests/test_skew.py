"""Skew handling (north_rule: "handle skew from giant repos via salted
repartitioning and AQE").

The pipeline spreads input by ``xxhash64(repo, path, commit)`` before
the Arrow stages, so one giant repo cannot pin a partition: the hash
includes path+commit, which differ per file even inside a single repo.
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
