"""N-vs-4N scaling measurement (BASELINE.md protocol).

Runs the flagship KG-construction job at two (or more) parallelism
levels on identical input, several runs each, and prints per-run +
median throughput and the scaling efficiency between consecutive
levels.

Fidelity details:

* Each run is a fresh JVM (subprocess) so core counts actually apply.
* Each run is **pinned with taskset** to exactly N CPUs — ``local[N]``
  alone is NOT an N-core machine (GC/shuffle/Python workers would
  overflow onto the idle cores and flatter the small-N runs).
* A pure-CPU burn benchmark runs at each level first (also pinned).
  On this sandbox's shared VM the burn itself scales sub-linearly
  (host steal + full-load frequency scaling), so the report carries
  BOTH the raw job efficiency and the efficiency normalized by the
  same-machine hardware ceiling: eff_norm = job_speedup / burn_speedup.

Usage: python scripts/scaling_bench.py [runs] [cores...]
Env: SPARK_GRAFT_CORPUS_FACTOR / SPARK_GRAFT_FILLER_REPEAT / SF_DIR.
     SPARK_GRAFT_INTERLEAVE=1 alternates the levels per round (1,4,1,4
     instead of 1,1,4,4) and re-probes the pure-CPU burn immediately
     before EVERY run: the shared VM's speed drifts on ~10-minute
     scales (measured: the 4-core burn moved −20% between two ladders
     an hour apart), so blocked ordering lets drift masquerade as
     (in)efficiency. Per-run burns also yield a drift-corrected
     efficiency: each run's tps is normalized by its own same-minute
     burn before the cross-level ratio.
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
from scoobie_spark.session import get_spark, warm_up
from scoobie_spark import queries as q
cores = int(os.environ["BENCH_CORES"])
spark = get_spark("scaling", cores=cores, shuffle_partitions=cores)
sf = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
# Steady-state warm-up, THE SAME code as bench.py (session.warm_up —
# one definition, the harnesses cannot drift): JVM JIT + per-core
# Python worker spin-up are per-SESSION costs that amortize to nothing
# on a real cluster job, but at small N-vs-4N core counts they are an
# O(cores) constant that would be billed to the throughput ratio.
warm_up(spark)
# plan-family warm-up, same convention as bench.py: one untimed
# tiny-scale flagship pass absorbs the ~6 s one-time Catalyst/Janino/
# worker-import cost that is per-session, not per-query (measured
# data-size-independent; see BASELINE.md)
tiny = os.path.join(os.path.dirname(sf.rstrip("/")), "sf0.001")
if os.path.exists(tiny):
    q.q_flagship_triples(spark, tiny).count()
t0 = time.time()
n = q.q_flagship_triples(spark, sf).count()
dt = time.time() - t0
print("\nBENCHROW " + __import__("json").dumps({"cores": cores, "sec": round(dt,1), "triples": n, "tps": round(n/dt,1)}))
"""

BURN_SNIPPET = r"""
import multiprocessing as mp, time, os, json
def burn(_):
    t0 = time.time(); x = 0
    while time.time() - t0 < 4: x += 1
    return x
if __name__ == "__main__":
    n = int(os.environ["BENCH_CORES"])
    with mp.Pool(n) as p:
        r = p.map(burn, range(n))
    print("BURNROW " + json.dumps({"cores": n, "iters_per_sec": sum(r) / 4}))
"""


def _pinned(cores: int) -> list[str]:
    return ["taskset", "-c", f"0-{cores - 1}"]


def one_run(cores: int) -> dict:
    env = dict(os.environ, BENCH_CORES=str(cores))
    out = subprocess.run(
        [*_pinned(cores), sys.executable, "-c", RUN_SNIPPET],
        capture_output=True, text=True, env=env,
    )
    for line in (out.stdout + out.stderr).replace("\r", "\n").splitlines():
        if line.startswith("BENCHROW "):
            return json.loads(line[len("BENCHROW "):])
    raise RuntimeError(f"run failed (cores={cores}):\n{out.stderr[-2000:]}")


def burn_run(cores: int) -> float:
    env = dict(os.environ, BENCH_CORES=str(cores))
    out = subprocess.run(
        [*_pinned(cores), sys.executable, "-c", BURN_SNIPPET],
        capture_output=True, text=True, env=env,
    )
    for line in out.stdout.splitlines():
        if line.startswith("BURNROW "):
            return json.loads(line[len("BURNROW "):])["iters_per_sec"]
    raise RuntimeError(f"burn failed (cores={cores}):\n{out.stderr[-500:]}")


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    levels = [int(c) for c in sys.argv[2:]] or [8, 32]
    interleave = os.environ.get("SPARK_GRAFT_INTERLEAVE") == "1"
    os.environ.setdefault("SPARK_GRAFT_CORPUS_FACTOR", "240")
    os.environ.setdefault("SPARK_GRAFT_FILLER_REPEAT", "5")

    burn = {c: statistics.median(burn_run(c) for _ in range(3)) for c in levels}
    print(f"burn iters/s: {burn}", flush=True)

    results: dict[int, list[dict]] = {c: [] for c in levels}
    order = (
        [c for _ in range(runs) for c in levels]  # 1,4,1,4 — drift-fair
        if interleave
        else [c for c in levels for _ in range(runs)]
    )
    for cores in order:
        if interleave:
            # same-minute hardware probe: one burn right before the run
            pre_burn = burn_run(cores)
        r = one_run(cores)
        if interleave:
            r["pre_burn"] = pre_burn
            r["tps_per_burn"] = round(r["tps"] / pre_burn * 1e6, 3)
        results[cores].append(r)
        i = len(results[cores])
        extra = f" (burn {r['pre_burn']/1e6:.1f}M)" if interleave else ""
        print(f"run cores={cores} #{i}: {r['sec']}s {r['tps']} t/s{extra}", flush=True)

    medians = {
        c: statistics.median(r["sec"] for r in rs) for c, rs in results.items()
    }
    report = {
        "config": {
            "corpus_factor": os.environ["SPARK_GRAFT_CORPUS_FACTOR"],
            "filler_repeat": os.environ["SPARK_GRAFT_FILLER_REPEAT"],
            "sf_dir": os.environ.get("SF_DIR", "/root/testdata/sf0.1"),
            "runs": runs,
            "pinned": True,
            "interleaved": interleave,
        },
        "median_sec": medians,
        "median_tps": {
            c: round(statistics.median(r["tps"] for r in rs), 1)
            for c, rs in results.items()
        },
        "burn_iters_per_sec": burn,
        "runs": results,
    }
    for lo, hi in zip(levels, levels[1:]):
        speedup = medians[lo] / medians[hi]
        ceiling = burn[hi] / burn[lo]
        report[f"speedup_{lo}to{hi}"] = round(speedup, 3)
        report[f"hw_ceiling_{lo}to{hi}"] = round(ceiling, 3)
        report[f"efficiency_{lo}to{hi}"] = round(speedup / (hi / lo), 3)
        report[f"efficiency_norm_{lo}to{hi}"] = round(speedup / ceiling, 3)
        if interleave:
            # drift-corrected analogue of efficiency_norm: each run's
            # tps normalized by its own same-minute burn; if the job
            # scaled exactly like the hardware ceiling the ratio is 1.0
            npb_lo = statistics.median(r["tps_per_burn"] for r in results[lo])
            npb_hi = statistics.median(r["tps_per_burn"] for r in results[hi])
            report[f"efficiency_norm_dc_{lo}to{hi}"] = round(npb_hi / npb_lo, 3)
    print("SCALING " + json.dumps(report))


if __name__ == "__main__":
    main()
