"""Worker-daemon preload (scoobie_spark/daemon.py): the per-core Python
workers are forked from a daemon that imports numpy/pandas first, so
every worker starts with the heavy modules already loaded (measured
~14% off cold 32-core flagship latency — BASELINE.md)."""


def test_workers_inherit_preloaded_modules(spark):
    assert (
        spark.conf.get("spark.python.daemon.module") == "scoobie_spark.daemon"
    )

    def probe(batches):
        import sys

        preloaded = "numpy" in sys.modules and "pandas" in sys.modules
        for b in batches:
            import pandas as pd

            yield pd.DataFrame({"ok": [bool(preloaded)] * len(b)})

    df = spark.range(0, 8, 1, 4).toDF("i")
    rows = df.mapInPandas(probe, "ok boolean").collect()
    assert rows and all(r["ok"] for r in rows)
