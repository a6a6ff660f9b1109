"""N-vs-4N scaling measurement (BASELINE.md protocol).

Runs the flagship KG-construction job at two (or more) parallelism
levels on identical input, several runs each, and prints per-run +
median throughput and the scaling efficiency between consecutive
levels. Each run is a fresh JVM (os.fork-free: subprocess) so
driver-memory and core counts actually apply.

Usage: python scripts/scaling_bench.py [runs] [cores...]
Env: SPARK_GRAFT_CORPUS_FACTOR / SPARK_GRAFT_FILLER_REPEAT / SF_DIR.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

RUN_SNIPPET = r"""
import time, os, sys
sys.path.insert(0, ".")
from scoobie_spark.session import get_spark
from scoobie_spark import queries as q
cores = int(os.environ["BENCH_CORES"])
spark = get_spark("scaling", cores=cores, shuffle_partitions=cores)
sf = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
t0 = time.time()
n = q.q_flagship_triples(spark, sf).count()
dt = time.time() - t0
print("\nBENCHROW " + __import__("json").dumps({"cores": cores, "sec": round(dt,1), "triples": n, "tps": round(n/dt,1)}))
"""


def one_run(cores: int) -> dict:
    env = dict(os.environ, BENCH_CORES=str(cores))
    out = subprocess.run(
        [sys.executable, "-c", RUN_SNIPPET], capture_output=True, text=True, env=env
    )
    for line in (out.stdout + out.stderr).replace("\r", "\n").splitlines():
        if line.startswith("BENCHROW "):
            return json.loads(line[len("BENCHROW "):])
    raise RuntimeError(f"run failed (cores={cores}):\n{out.stderr[-2000:]}")


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    levels = [int(c) for c in sys.argv[2:]] or [8, 32]
    os.environ.setdefault("SPARK_GRAFT_CORPUS_FACTOR", "80")
    os.environ.setdefault("SPARK_GRAFT_FILLER_REPEAT", "50")

    results: dict[int, list[dict]] = {}
    for cores in levels:
        results[cores] = []
        for i in range(runs):
            r = one_run(cores)
            results[cores].append(r)
            print(f"run cores={cores} #{i+1}: {r['sec']}s {r['tps']} t/s", flush=True)

    medians = {
        c: statistics.median(r["sec"] for r in rs) for c, rs in results.items()
    }
    report = {
        "config": {
            "corpus_factor": os.environ["SPARK_GRAFT_CORPUS_FACTOR"],
            "filler_repeat": os.environ["SPARK_GRAFT_FILLER_REPEAT"],
            "sf_dir": os.environ.get("SF_DIR", "/root/testdata/sf0.1"),
            "runs": runs,
        },
        "median_sec": medians,
        "median_tps": {
            c: round(statistics.median(r["tps"] for r in rs), 1)
            for c, rs in results.items()
        },
        "runs": results,
    }
    for lo, hi in zip(levels, levels[1:]):
        eff = (medians[lo] / medians[hi]) / (hi / lo)
        report[f"efficiency_{lo}to{hi}"] = round(eff, 3)
    print("SCALING " + json.dumps(report))


if __name__ == "__main__":
    main()
