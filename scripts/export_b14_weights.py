"""Train the b14 maxent entity classifier on the synthetic KB and
freeze its weights as the oracle artifact (b14_sql.WEIGHTS_PARQUET +
META_JSON). Training is bit-deterministic (see b14_sql.train_b14), so
re-running this script reproduces the artifact byte-for-byte —
tests/test_b14_sql.py enforces exactly that against a live retrain."""

import sys

sys.path.insert(0, ".")

from scoobie_spark.b14_sql import WEIGHTS_PARQUET, export_weights
from scoobie_spark.session import get_spark

if __name__ == "__main__":
    spark = get_spark("export-b14")
    export_weights(spark)
    print(f"wrote {WEIGHTS_PARQUET}")
    spark.stop()
