"""Train the IVF coarse quantizer on the sf0.01 embeddings and freeze
the centroids as the oracle artifact (ivf_sql.CENTROIDS_PARQUET).
Training is bit-deterministic (total-order k-means sample + seeded
init, see ivf_sql.train_ivf), so re-running this script reproduces the
artifact byte-for-byte — tests/test_ivf_sql.py enforces exactly that
against a live retrain."""

import sys

sys.path.insert(0, ".")

from scoobie_spark.ivf_sql import CENTROIDS_PARQUET, export_centroids
from scoobie_spark.session import get_spark

if __name__ == "__main__":
    spark = get_spark("export-ivf")
    export_centroids(spark)
    print(f"wrote {CENTROIDS_PARQUET}")
    spark.stop()
