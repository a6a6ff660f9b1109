"""Replay PhraseExperiment.analyseTokenPhraseFrequencies, reuters leg
(``PhraseExperiment.java:165-260``): token/NP frequency profile of the
bundled reuters corpus (``corpora/reuters/reuters.zip``, 1471 news
texts) through tokenize → trained B5 POS → trained B6 NP chunk.

The reference wrote the per-document rows to
``results/token_phrase_frequency_reuters.csv`` (unpublished values);
this replay prints the same five columns' corpus totals plus a JSON
summary line, and the frozen numbers live in
tests/test_experiment_replay.py::test_phrase_frequency_reuters_frozen.

Usage: python scripts/reuters_phrase_frequency.py [zip_path]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "/root/reference/corpora/reuters/reuters.zip"
    )

    from pyspark.sql import functions as F

    from scoobie_spark import experiments as E
    from scoobie_spark.session import get_spark

    spark = get_spark("reuters_phrase_frequency")
    t0 = time.time()
    freq = E.phrase_frequency_experiment(spark, path).cache()
    totals = freq.agg(
        F.count("*").alias("docs"),
        F.sum("tokens").alias("tokens"),
        F.sum("noun_phrases").alias("noun_phrases"),
        F.sum("tokens_in_nps").alias("tokens_in_nps"),
        F.avg(F.col("tokens_in_nps") / F.col("tokens")).alias("np_token_ratio"),
        F.avg(
            F.col("distinct_tokens_in_nps") / F.col("distinct_tokens")
        ).alias("np_vocab_ratio"),
    ).first()
    wall = time.time() - t0
    print(freq.orderBy("path").limit(5).toPandas().to_string())
    print(
        "SUMMARY "
        + json.dumps({**totals.asDict(), "wall_sec": round(wall, 1)})
    )
    spark.stop()


if __name__ == "__main__":
    main()
