"""The trained-b14 maxent decode oracle (scoobie_spark/b14_sql.py):

1. the engine's query-time retrain reproduces the frozen weight
   artifact BIT-FOR-BIT (training determinism — the premise that lets
   the oracle use frozen weights while the engine retrains);
2. every decision the decode makes on the fixture carries slack that
   dwarfs the float32(engine)/float64(oracle) deviation (the premise
   that lets a float64 SQL replay verify a float32 engine);
3. per-phrase and aggregate parity: DuckDB running the oracle SQL
   produces the same predictions and the same final table as
   q_b14_classify.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

from scoobie_spark import b14_sql
from scoobie_spark.b14_sql import (
    B14_MARGIN,
    META_JSON,
    WEIGHTS_PARQUET,
    b14_classify_sql,
    b14_sql_available,
    train_b14,
)


@pytest.fixture(scope="module")
def model(spark):
    kb, clf = train_b14(spark)
    return kb, clf


@pytest.fixture(scope="module")
def phrases(spark, model):
    kb, _ = model
    rows = (
        kb.symbols.join(kb.literals.withColumnRenamed("id", "lit"), "lit")
        .select("literal")
        .distinct()
        .collect()
    )
    return sorted(r["literal"] for r in rows)


def test_artifact_present():
    assert b14_sql_available(), "run scripts/export_b14_weights.py"


def test_retrain_reproduces_frozen_weights(model):
    """Bit-exact: sorted collect order + seeded full-batch GD leave no
    nondeterminism; if this ever fails the oracle must be re-exported,
    not loosened."""
    _, clf = model
    frozen = pd.read_parquet(WEIGHTS_PARQUET)
    k = clf.weights.shape[1]
    w_frozen = frozen[[f"c{j}" for j in range(k)]].to_numpy()
    assert np.array_equal(frozen["bucket"].to_numpy(), np.arange(clf.weights.shape[0]))
    assert np.array_equal(w_frozen, clf.weights.astype("float64"))
    import json

    meta = json.load(open(META_JSON))
    assert meta["classes"] == [int(c) for c in clf.classes]
    assert meta["bias"] == [float(b) for b in clf.bias]


def test_retrain_is_partition_count_invariant(spark, model):
    """The total (literal, cls) sort makes the collected training order
    independent of how the pairs DataFrame is partitioned."""
    from scoobie_spark.classify import train_entity_classifier, training_pairs
    from scoobie_spark.fixtures import synth_kb

    _, clf = model
    kb = synth_kb(spark, n_instances=b14_sql.B14_N_INSTANCES)
    pairs = training_pairs(kb).repartition(7).orderBy("literal", "cls")
    clf2 = train_entity_classifier(pairs, epochs=b14_sql.B14_EPOCHS)
    assert np.array_equal(clf.weights, clf2.weights)
    assert np.array_equal(clf.bias, clf2.bias)


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


def test_decision_slack_dwarfs_precision_gap(model, phrases):
    """min distance to EITHER decision boundary (accept margin, argmax
    pick) must exceed the measured float32-vs-float64 deviation by a
    wide factor — measured ~675× at export time; assert ≥ 50×."""
    _, clf = model
    p32 = clf.predict_proba(phrases).astype(np.float64)
    p64 = _float64_decode(clf, phrases)
    assert (np.argmax(p32, axis=1) == np.argmax(p64, axis=1)).all()
    s32 = np.sort(p32, axis=1)
    s64 = np.sort(p64, axis=1)
    m32, m64 = s32[:, -1] - s32[:, -2], s64[:, -1] - s64[:, -2]
    dev = float(np.max(np.abs(m32 - m64)))
    margin_slack = float(np.min(np.abs(m64 - B14_MARGIN)))
    argmax_slack = float(np.min(m64))  # top1-top2 prob gap bounds class flips
    assert margin_slack > 50 * dev, (margin_slack, dev)
    assert argmax_slack > 50 * dev, (argmax_slack, dev)


def test_per_phrase_parity(model, phrases):
    """DuckDB's featurize+score+softmax agrees with the engine on every
    phrase: same predicted class, probabilities within the slack."""
    _, clf = model
    rows = duckdb.connect().execute(b14_classify_sql(per_phrase=True)).fetchall()
    sql = {r[0]: (r[1], r[2], r[3]) for r in rows}
    assert set(sql) == set(phrases)
    p32 = clf.predict_proba(phrases)
    order = np.argsort(-p32, axis=1)
    for i, t in enumerate(phrases):
        cls, p1, p2 = sql[t]
        assert cls == int(clf.classes[order[i, 0]]), t
        assert abs(p1 - float(p32[i, order[i, 0]])) < 1e-4
        assert abs(p2 - float(p32[i, order[i, 1]])) < 1e-4


def test_aggregate_oracle_matches_engine(spark):
    from scoobie_spark import queries as q

    eng = sorted(
        (r["cls"], r["n_accepted"])
        for r in q.q_b14_classify(spark, "/root/testdata/sf0.001").collect()
    )
    orc = sorted(
        (int(a), int(b))
        for a, b in duckdb.connect().execute(b14_classify_sql()).fetchall()
    )
    assert eng == orc
    assert sum(n for _, n in eng) > 0  # non-degenerate acceptance
