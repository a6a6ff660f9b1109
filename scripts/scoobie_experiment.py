"""CLI replay of ScoobieExperiment.testSystem (experiments.py): per-doc
P/R/F1 lines (the reference's scoobie3.csv) + a JSON summary.

Usage: python scripts/scoobie_experiment.py [corpus.zip] [k]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    corpus = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "/root/reference/corpora/wikinews/wikinews_text_labels.zip"
    )
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 1000

    from pyspark.sql import functions as F

    from scoobie_spark import experiments as E
    from scoobie_spark.session import get_spark

    spark = get_spark("scoobie_experiment")
    res = E.scoobie_experiment(spark, corpus, k=k).cache()
    for r in res.orderBy("uri").collect():
        print(f"{r['precision']:.5f}\t{r['recall']:.5f}\t{r['f1']:.5f}\t"
              f"{r['n_gt']}\t{r['n_found']}\t{r['uri'].rsplit('/', 1)[-1]}")
    agg = res.agg(
        F.avg("precision").alias("p"), F.avg("recall").alias("r"),
        F.avg("f1").alias("f1"), F.count("*").alias("docs"),
    ).first()
    print(json.dumps({
        "metric": "wikinews_prf1", "docs": agg["docs"], "k": k,
        "precision": round(agg["p"], 5), "recall": round(agg["r"], 5),
        "f1": round(agg["f1"], 5),
    }))


if __name__ == "__main__":
    main()
