"""The micro-pipeline classification oracle (scoobie_spark/micro_sql.py):

1. the engine's query-time recompute reproduces BOTH frozen artifacts
   bit-for-bit — the A14 type clusters and the 400-epoch maxent
   weights (the premise that lets the oracle read frozen models while
   the engine retrains);
2. every accept/class decision the resolver's classify step makes on
   the actually-spotted surfaces carries slack that dwarfs the
   float32(engine)/float64(oracle) deviation — the margin here is 0.0,
   so the accept rule only abstains on an exact top-2 tie;
3. end-to-end parity: DuckDB running the oracle SQL over the sf0.01
   documents produces the same (subject, n_mentions) table as
   q_micro_pipeline_classification.
"""

import json

import duckdb
import numpy as np
import pandas as pd
import pytest

from scoobie_spark.micro_sql import (
    CLUSTERS_PARQUET,
    META_JSON,
    WEIGHTS_PARQUET,
    micro_pipeline_sql,
    micro_sql_available,
    spotted_surfaces_sql,
    train_micro,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def model(spark):
    return train_micro(spark)


def _docs_con():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    return con


def test_artifacts_present():
    assert micro_sql_available(), "run scripts/export_micro_artifacts.py"


def test_recompute_reproduces_frozen_artifacts(model):
    """Bit-exact for clusters (integer ids from a deterministic merge
    loop) and weights (total-order collect + seeded full-batch GD); if
    this ever fails the oracle must be re-exported, not loosened."""
    _, clusters, clf = model
    fz_cl = pd.read_parquet(CLUSTERS_PARQUET)
    live = (
        clusters.toPandas()
        .sort_values("type")
        .reset_index(drop=True)
        .astype({"type": "int64", "cluster": "int64"})
    )
    assert fz_cl.equals(live)
    fz_w = pd.read_parquet(WEIGHTS_PARQUET)
    k = clf.weights.shape[1]
    w = fz_w[[f"c{j}" for j in range(k)]].to_numpy()
    assert np.array_equal(w, clf.weights.astype("float64"))
    meta = json.load(open(META_JSON))
    assert meta["classes"] == [int(c) for c in clf.classes]
    assert meta["bias"] == [float(b) for b in clf.bias]


def _float64_decode(clf, texts):
    """The oracle's arithmetic: exact integer counts, float64 norm /
    scores / softmax over the same (frozen) weights."""
    from scoobie_spark.classify import _featurize_row

    xc = np.zeros((len(texts), clf.weights.shape[0]), dtype=np.float64)
    for i, t in enumerate(texts):
        _featurize_row(f"^{t.lower()}$", xc[i], clf.weights.shape[0])
    nrm = np.sqrt((xc * xc).sum(axis=1, keepdims=True))
    z = (xc / nrm) @ clf.weights.astype(np.float64) + clf.bias.astype(np.float64)
    e = np.exp(z - z.max(axis=1, keepdims=True))
    return e / e.sum(axis=1, keepdims=True)


def test_decision_slack_on_spotted_surfaces(model):
    """The classify step's decisions on the surfaces the pipeline
    actually spots: same argmax class under f32 and f64, and the
    top1−top2 gap (the margin-0.0 accept rule's distance to its
    boundary) dwarfs the measured precision deviation."""
    _, _, clf = model
    surfaces = sorted(
        r[0] for r in _docs_con().execute(spotted_surfaces_sql()).fetchall()
    )
    assert surfaces, "spotting found no surfaces — fixture drift"
    p32 = clf.predict_proba(surfaces).astype(np.float64)
    p64 = _float64_decode(clf, surfaces)
    assert (np.argmax(p32, axis=1) == np.argmax(p64, axis=1)).all()
    s32, s64 = np.sort(p32, axis=1), np.sort(p64, axis=1)
    m32, m64 = s32[:, -1] - s32[:, -2], s64[:, -1] - s64[:, -2]
    dev = float(np.max(np.abs(m32 - m64)))
    assert float(m64.min()) > 50 * dev, (float(m64.min()), dev)


def test_end_to_end_oracle_parity(spark):
    from scoobie_spark import queries as q

    eng = sorted(
        (r["subject"], r["n_mentions"])
        for r in q.q_micro_pipeline_classification(spark, SF_DIR).collect()
    )
    orc = sorted(
        (int(a), int(b))
        for a, b in _docs_con().execute(micro_pipeline_sql()).fetchall()
    )
    assert eng and eng == orc
