"""Export the trained EN perceptron weight matrices to parquet so the
DuckDB oracle (scoobie_spark/perceptron_sql.py) can replay the decode.

The vectorized weights are int32 (average() rounds to 6 decimals, ×1e6
is lossless — perceptron.VectorizedPerceptron), so the exported table
(feature, c0..c{nc-1}) makes the greedy decode pure integer arithmetic
on both sides. Row 0 (the all-zero unknown-feature row) is implicit:
the oracle LEFT-JOINs and coalesces to 0.

Run after retraining: python scripts/export_weights_parquet.py
"""
import sys

sys.path.insert(0, ".")

import pyarrow as pa
import pyarrow.parquet as pq

from scoobie_spark import perceptron as P


def export(model_path: str, out_path: str) -> None:
    vm = P._vectorize(P._load(model_path))
    feats = sorted(vm.feat_index, key=vm.feat_index.get)
    w = vm.W[1:]  # row 0 = zero row for unknown features
    assert len(feats) == len(w)
    cols = {"feature": pa.array(feats)}
    for k in range(vm.nc):
        cols[f"c{k}"] = pa.array(w[:, k].astype("int64"))
    pq.write_table(pa.table(cols), out_path, compression="zstd")
    print(f"{out_path}: {len(feats)} features x {vm.nc} classes "
          f"(classes: {vm.classes})")


if __name__ == "__main__":
    export(P.POS_MODEL, P.POS_MODEL.replace(".json.gz", "_weights.parquet"))
    export(P.CHUNK_MODEL, P.CHUNK_MODEL.replace(".json.gz", "_weights.parquet"))
