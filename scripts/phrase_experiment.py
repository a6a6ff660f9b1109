"""PhraseExperiment replay: gazetteer probe cost vs literal-prefix length.

Reference protocol (``experiments/PhraseExperiment.java:272-342``): for
prefix sizes 1..10, collect the document's distinct word prefixes and
time the KB probe that matches literals on that prefix — the CSV it
wrote (unpublished) motivated the production 4-char prefix hash.

Spark replay: same sweep over the synthetic corpus + KB. For each
size, the document side emits distinct ``substr(token, 1, SIZE)``
prefixes, the KB side buckets literals by the same substring, and the
probe is the equi-join count. Reported per size: distinct probe keys,
matched (candidate) rows, join wall time — the selectivity/latency
trade the reference measured: short prefixes explode candidates, long
prefixes barely improve over 4.

Usage: python scripts/phrase_experiment.py [n_docs]
Prints one CSV block + a JSON summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000

    from pyspark.sql import functions as F

    from scoobie_spark.fixtures import synth_corpus, synth_kb
    from scoobie_spark.session import get_spark

    spark = get_spark("phrase_experiment")
    kb = synth_kb(spark, n_instances=200)
    docs = synth_corpus(spark, n_docs=n_docs, n_instances=200)

    tokens = (
        docs.select(F.explode(F.split(F.lower("content"), r"\s+")).alias("tok"))
        .filter(F.length("tok") > 0)
        .localCheckpoint()
    )
    lits = kb.literals.select(F.lower("literal").alias("lit")).localCheckpoint()

    print("prefix_size,n_probe_keys,n_matches,join_sec")
    rows = []
    for size in range(1, 11):
        probes = tokens.select(
            F.substring("tok", 1, size).alias("pfx")
        ).distinct()
        keyed = lits.select("lit", F.substring("lit", 1, size).alias("pfx"))
        t0 = time.time()
        n_matches = probes.join(keyed, "pfx").count()
        dt = time.time() - t0
        n_keys = probes.count()
        rows.append(
            {"prefix_size": size, "n_probe_keys": n_keys,
             "n_matches": n_matches, "join_sec": round(dt, 3)}
        )
        print(f"{size},{n_keys},{n_matches},{dt:.3f}")

    print("PHRASE_EXPERIMENT " + json.dumps({"n_docs": n_docs, "rows": rows}))


if __name__ == "__main__":
    main()
