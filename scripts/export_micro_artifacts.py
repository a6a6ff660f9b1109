"""Train the micro-pipeline artifacts (A14 type clusters + 400-epoch
maxent over cluster-labeled literal pairs) on the synthetic KB and
freeze them as the oracle artifacts (micro_sql.CLUSTERS_PARQUET /
WEIGHTS_PARQUET / META_JSON). Both are bit-deterministic (see
micro_sql.train_micro), so re-running this script reproduces the
artifacts byte-for-byte — tests/test_micro_sql.py enforces exactly
that against a live recompute."""

import sys

sys.path.insert(0, ".")

from scoobie_spark.micro_sql import CLUSTERS_PARQUET, WEIGHTS_PARQUET, export_micro
from scoobie_spark.session import get_spark

if __name__ == "__main__":
    spark = get_spark("export-micro")
    export_micro(spark)
    print(f"wrote {CLUSTERS_PARQUET}\nwrote {WEIGHTS_PARQUET}")
    spark.stop()
