"""Worker-daemon preload (scoobie_spark/daemon.py): the per-core Python
workers are forked from a daemon that imports pandas first, so every
worker starts with the heavy modules already loaded (measured ~14% off
cold 32-core flagship latency — BASELINE.md).

The probe runs in a SUBPROCESS with a fresh JVM: inside the shared test
session the check would be vacuous, because any earlier pandas-UDF test
leaves pandas imported in the reused workers regardless of the daemon
(and the stock daemon already preloads numpy via pyspark.worker's
import chain).
"""

import os
import subprocess
import sys

_PROBE = r"""
import sys
sys.path.insert(0, {repo!r})
from scoobie_spark.session import get_spark
spark = get_spark("daemon_probe", cores=2, shuffle_partitions=2)
assert spark.conf.get("spark.python.daemon.module") == "scoobie_spark.daemon"

def probe(batches):
    import sys
    preloaded = "pandas" in sys.modules
    for b in batches:
        import pandas as pd
        yield pd.DataFrame({{"ok": [bool(preloaded)] * len(b)}})

rows = spark.range(0, 4, 1, 2).toDF("i").mapInPandas(probe, "ok boolean").collect()
assert rows and all(r["ok"] for r in rows), rows
print("DAEMON_PRELOAD_OK")
"""


def test_workers_inherit_preloaded_modules(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", _PROBE.format(repo=repo)],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # foreign cwd: PYTHONPATH propagation must cover it
        timeout=300,
    )
    assert "DAEMON_PRELOAD_OK" in out.stdout, out.stderr[-2000:]
