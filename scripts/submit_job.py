"""spark-submit entry point for the KG-construction pipeline.

Packages the library as a zip and runs the flagship extraction job the
way a real cluster deployment would (north_rule: "run via spark-submit
--py-files on a multi-executor cluster"):

    python scripts/make_pyfiles.py               # → dist/scoobie_spark.zip
    spark-submit --master <cluster> \
        --py-files dist/scoobie_spark.zip \
        scripts/submit_job.py \
        --input  <iceberg-or-parquet path of (repo,path,commit,lang,content,sha256)> \
        --kb     <kb root with relations/symbols/resources/literals parquet> \
        --output <triples sink path> \
        [--checkpoint-dir <resumable stage dir>] [--resolver degree]

In this sandbox the same file doubles as a local smoke run:
    python scripts/submit_job.py --demo
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input")
    ap.add_argument("--kb")
    ap.add_argument("--output")
    ap.add_argument("--checkpoint-dir")
    ap.add_argument("--resolver", default="degree")
    ap.add_argument("--template", help="SPARQL extraction template file")
    ap.add_argument("--demo", action="store_true", help="run on the built-in micro fixture")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("scoobie-spark-extract").getOrCreate()
    # AQE + skew handling are part of the job contract, not the cluster's
    # defaults (north_rule: skew from giant repos via salting + AQE)
    for k, v in {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
    }.items():
        spark.conf.set(k, v)

    from scoobie_spark.pipeline import PipelineConfig, extract_triples

    if args.demo or not args.input:
        from scoobie_spark.fixtures import micro_docs, micro_kb

        docs, kb = micro_docs(spark), micro_kb(spark)
        materialize = False
    else:
        from scoobie_spark.kb.model import KB

        docs = spark.read.parquet(args.input)
        kb = KB.read(spark, args.kb)
        materialize = True

    template = None
    if args.template:
        with open(args.template) as fh:
            template = fh.read()

    cfg = PipelineConfig(
        checkpoint_dir=args.checkpoint_dir,
        resolver=args.resolver,
        template=template,
        materialize_kb=materialize,
    )
    t0 = time.time()
    triples = extract_triples(spark, docs, kb, cfg)
    if args.output:
        from scoobie_spark.serialize import write_triples

        write_triples(triples, args.output)
        n = spark.read.parquet(args.output).count()
    else:
        n = triples.count()
    dt = time.time() - t0
    print(
        json.dumps(
            {
                "triples": n,
                "sec": round(dt, 2),
                "triples_per_sec": round(n / dt, 1),
                "stages": cfg.metrics,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
