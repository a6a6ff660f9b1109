"""The k-means IVF ANN oracle (scoobie_spark/ivf_sql.py):

1. the engine's query-time quantizer retrain reproduces the frozen
   centroid artifact BIT-FOR-BIT (the premise that lets the oracle use
   frozen centroids while the engine retrains);
2. every cell decision the search makes on the sf0.01 corpus carries
   slack that dwarfs the float32(engine)/float64(oracle) deviation —
   assignment top1−top2 margins and the probe's 4|5 boundary margin;
3. end-to-end parity: DuckDB running the oracle SQL over the sf0.01
   embeddings produces the same (query, neighbor, cosine, rank) table
   as q_ann_ivf_topk.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

from scoobie_spark.ivf_sql import (
    CENTROIDS_PARQUET,
    IVF_N_PROBE,
    IVF_SF_DIR,
    ann_ivf_sql,
    ivf_sql_available,
    train_ivf,
)

SF_EMB = f"{IVF_SF_DIR}/embeddings.parquet"


@pytest.fixture(scope="module")
def cents(spark):
    return train_ivf(spark)


@pytest.fixture(scope="module")
def emb():
    pdf = pd.read_parquet(SF_EMB).sort_values("vec_id")
    x = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    return pdf["vec_id"].to_numpy(), x


def test_artifact_present():
    assert ivf_sql_available(), "run scripts/export_ivf_centroids.py"


def test_retrain_reproduces_frozen_centroids(cents):
    """Bit-exact: the k-means sample is collected in a total order and
    the init RNG is seeded, so the f32 Lloyd path has no run-to-run
    freedom; if this ever fails the oracle must be re-exported, not
    loosened."""
    frozen = pd.read_parquet(CENTROIDS_PARQUET)
    assert np.array_equal(frozen["cell"].to_numpy(), np.arange(len(cents)))
    fz = np.stack([np.asarray(v, dtype=np.float64) for v in frozen["cv"]])
    assert np.array_equal(fz, cents.astype(np.float64))


def test_cell_decisions_carry_slack(cents, emb):
    """Engine decisions (f32 normalized-row × centroid argmax) equal
    the oracle's f64 inner-product argmax on every corpus row, with
    top1−top2 margins far above f32 rounding noise; same for the
    probe's 4th-vs-5th cell boundary on every query (inside the top-4
    the probed cells act as a set, so only that boundary decides)."""
    ids, x64 = emb
    # engine arithmetic (assign_cells): f32, rows normalized
    x32 = x64.astype(np.float32)
    x32n = x32 / np.maximum(np.linalg.norm(x32, axis=1, keepdims=True), 1e-9)
    s32 = x32n @ cents.T
    # oracle arithmetic: f64 inner product, unnormalized rows — a
    # positive per-row scale, so ordering must agree
    s64 = x64 @ cents.astype(np.float64).T
    assert (s32.argmax(axis=1) == s64.argmax(axis=1)).all()
    # measured precision gap: the SAME normalized-row product in f64
    # (s64n) vs the engine's f32 — the margins must dwarf it (b14's
    # 50× convention; measured ~130× on this corpus)
    x64n = x64 / np.maximum(np.linalg.norm(x64, axis=1, keepdims=True), 1e-9)
    s64n = x64n @ cents.astype(np.float64).T
    dev = float(np.max(np.abs(s32.astype(np.float64) - s64n)))
    m32 = np.sort(s32, axis=1)[:, -1] - np.sort(s32, axis=1)[:, -2]
    assert float(m32.min()) > 50 * dev, (float(m32.min()), dev)
    # probe boundary: queries are vec_id < 3; inside the top-4 the
    # probed cells act as a set, so only the 4|5 gap decides
    qmask = np.isin(ids, [0, 1, 2])
    sq = np.sort(s64n[qmask], axis=1)
    gap45 = sq[:, -IVF_N_PROBE] - sq[:, -IVF_N_PROBE - 1]
    assert float(gap45.min()) > 50 * dev, (float(gap45.min()), dev)


def test_end_to_end_oracle_parity(spark):
    from scoobie_spark import queries as q

    eng = sorted(
        (r["query_id"], r["neighbor_id"], round(r["cosine"], 4), r["rank"])
        for r in q.q_ann_ivf_topk(spark, IVF_SF_DIR).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF_EMB}')"
    )
    orc = sorted(
        (int(a), int(b), round(float(c), 4), int(r))
        for a, b, c, r in con.execute(ann_ivf_sql()).fetchall()
    )
    assert eng == orc
