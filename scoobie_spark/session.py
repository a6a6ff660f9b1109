"""SparkSession factory with scale-oriented defaults.

Local-mode testing stands in for a multi-executor cluster; every knob
below is one we would also set via spark-submit on a real cluster:
AQE (runtime re-planning + skew-join splitting), Arrow for pandas UDF
transfer, UTC timezone (so DuckDB oracle comparisons are stable), and
shuffle partitions sized to cores rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_local_dir(min_free_bytes: int = 16 << 30) -> str:
    """/dev/shm when it exists with ≥16 GiB free, else /tmp."""
    try:
        st = os.statvfs("/dev/shm")
        if st.f_bavail * st.f_frsize >= min_free_bytes:
            return "/dev/shm/spark-local"
    except OSError:
        pass
    return "/tmp"


def get_spark(
    app_name: str = "scoobie_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` defaults to $SPARK_GRAFT_CPUS or all local cores. On a
    real cluster the master/memory flags come from spark-submit; only
    the ``spark.sql.*`` settings below carry over unchanged.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(4, cores)

    # Make the preload daemon (spark.python.daemon.module below)
    # importable by the worker daemon process no matter the cwd: the
    # JVM gateway inherits this env when the first session launches it.
    # On a real cluster --py-files ships the package instead. If a JVM
    # gateway ALREADY exists (some other code started Spark first), its
    # environment is frozen without our path — configuring the custom
    # daemon then would make every Python-UDF task die on
    # ModuleNotFoundError, so we fall back to the stock daemon.
    from pyspark import SparkContext

    fresh_jvm = SparkContext._gateway is None
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if pkg_parent not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_parent + (os.pathsep + pp if pp else "")
        )

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bigger Arrow batches = fewer python round-trips for the
        # batch-vectorized stages (they amortize per-batch numpy setup)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        # shuffle/spill to tmpfs when available: the single-box analogue
        # of cluster executors' local NVMe — keeps shuffle I/O off the
        # one shared system disk. Guarded: tmpfs shuffle consumes RAM,
        # so a spill bigger than the free tmpfs would ENOSPC a job that
        # plain disk would finish — only use /dev/shm when it has
        # comfortable headroom (≥16 GiB free), and always honor
        # SPARK_LOCAL_DIRS as the explicit override either way.
        .config("spark.local.dir", os.environ.get("SPARK_LOCAL_DIRS", _default_local_dir()))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # deep multi-stage plans re-embed lineage at every reuse; don't let
        # AQE's plan-change logging materialize a gigabyte explain string
        .config("spark.sql.maxPlanStringLength", str(256 * 1024))
    )
    if fresh_jvm:
        # preload pandas/pyarrow (numpy comes free: the stock daemon's
        # pyspark.worker import chain already pulls it) in the worker
        # daemon so the per-core worker forks inherit them
        # copy-on-write instead of each paying the import on its first
        # Arrow task (an O(cores) slice of session cold-start);
        # see scoobie_spark/daemon.py
        builder = builder.config(
            "spark.python.daemon.module", "scoobie_spark.daemon"
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def warm_up(spark: SparkSession) -> None:
    """Steady-state warm-up (JMH convention, documented in BASELINE.md):
    the first jobs of a fresh session pay JVM codegen JIT plus one
    Python/Arrow worker spin-up per core — measured 18.6 s cold vs
    6.7 s warm for the IDENTICAL flagship plan at sf0.1/local[32].
    Shared by bench.py and scripts/scaling_bench.py so the two harnesses
    cannot drift apart."""
    from pyspark.sql import functions as F

    warm = spark.range(0, 1 << 14, 1, 64).toDF("i")
    warm.groupBy((F.col("i") % 97).alias("k")).count().count()

    def _imports(batches):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        yield from batches

    warm.mapInPandas(_imports, "i long").count()
