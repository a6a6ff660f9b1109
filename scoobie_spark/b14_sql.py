"""DuckDB replay of the TRAINED b14 maxent entity-classification decode.

Converts ``b14_classify`` from a rows-only driver check into a full
value oracle, the same move :mod:`scoobie_spark.perceptron_sql` made
for the trained B5/B6 perceptrons. Unlike the perceptrons the maxent
weights are genuinely float-iterative (1200 epochs of full-batch
gradient descent, classify.fit_maxent), so the perceptron's
exact-integer argument does not apply. What makes the decode
oracle-able anyway:

* **Training is removed from the comparison.** The model is trained
  once by ``scripts/export_b14_weights.py`` and frozen as a parquet
  artifact next to the perceptron models; the oracle reads the frozen
  weights. The engine retrains at query time, but the training path is
  bit-deterministic (seeded rng, full-batch — no minibatch order
  dependence — and the training pairs are collected in a TOTAL order:
  q_b14_classify sorts them by (literal, cls) before the driver-side
  fit, precisely so the collected row order cannot depend on partition
  count; tests/test_b14_sql.py asserts the retrained weights equal the
  artifact bit-for-bit).
* **The decode's decisions carry measured slack.** The engine scores in
  float32, the oracle in float64; both compute softmax margins from
  EXACT integer n-gram counts (FNV-1a bucket hashing replayed in
  UBIGINT wraparound arithmetic via :mod:`scoobie_spark.xxh64_sql`
  helpers) over the same frozen weights, so they can only disagree
  within float32 rounding (~1e-6 relative). tests/test_b14_sql.py
  measures the minimum distance of any phrase to EITHER decision
  boundary (the top1−top2 > margin accept rule and the argmax class
  pick) and asserts it exceeds that noise floor by orders of
  magnitude — on this deterministic fixture the decisions are stable
  under both precisions, and the per-phrase predictions are asserted
  identical end-to-end.

Reference: EntityClassification.java:56-147 (score + margin rule);
the feature space is classify._featurize's hashed char-ngram bag
(FNV-1a over 2/3-grams of ``^lower(phrase)$``, mod 4096, L2-normalized
rows).
"""

from __future__ import annotations

import json
import os

from .xxh64_sql import mul64

MODELS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "models")
WEIGHTS_PARQUET = os.path.join(MODELS_DIR, "b14_maxent_weights.parquet")
META_JSON = os.path.join(MODELS_DIR, "b14_maxent_meta.json")

# q_b14_classify's exact configuration (queries.py): the artifact is
# only valid for this (fixture, hyperparameter) pair, recorded in the
# meta file and re-checked by the parity test.
B14_N_INSTANCES = 100
B14_EPOCHS = 1200
B14_MARGIN = 0.3

_FNV_OFFSET = 0xCBF29CE484222325  # 14695981039346656037
_FNV_PRIME = 0x100000001B3        # 1099511628211


def train_b14(spark):
    """The engine's b14 model: synth_kb(100) literal→type pairs,
    collected in (literal, cls) order — a total order, so the
    driver-side fit sees the same row sequence at any partition count —
    then 1200 full-batch epochs (seed 13). Shared by q_b14_classify,
    the weight exporter and the parity tests: one definition, the three
    consumers cannot drift."""
    from .classify import train_entity_classifier, training_pairs
    from .fixtures import synth_kb

    kb = synth_kb(spark, n_instances=B14_N_INSTANCES)
    pairs = training_pairs(kb).orderBy("literal", "cls")
    return kb, train_entity_classifier(pairs, epochs=B14_EPOCHS)


def export_weights(spark) -> None:
    """Freeze the trained model: dense (4096 × k) weight matrix as
    parquet (float32 values widened losslessly to float64), bias +
    class ids + config in a JSON sidecar."""
    import pandas as pd

    _, clf = train_b14(spark)
    w = clf.weights.astype("float64")  # float32 → float64 is exact
    cols = {"bucket": range(w.shape[0])}
    for k in range(w.shape[1]):
        cols[f"c{k}"] = w[:, k]
    pd.DataFrame(cols).to_parquet(WEIGHTS_PARQUET, index=False)
    meta = {
        "classes": [int(c) for c in clf.classes],
        "bias": [float(b) for b in clf.bias],  # exact float32→double
        "n_buckets": int(w.shape[0]),
        "n_instances": B14_N_INSTANCES,
        "epochs": B14_EPOCHS,
        "margin": B14_MARGIN,
    }
    with open(META_JSON, "w") as f:
        json.dump(meta, f, indent=1)


def b14_sql_available() -> bool:
    return os.path.exists(WEIGHTS_PARQUET) and os.path.exists(META_JSON)


def _fnv_expr(g: str, n: int) -> str:
    """FNV-1a over the ``n`` ASCII bytes of column ``g`` — the exact
    hash of classify._featurize (labels are ASCII, so byte == char ==
    codepoint and ``ascii()`` reads the byte)."""
    h = f"CAST({_FNV_OFFSET} AS UBIGINT)"
    for j in range(1, n + 1):
        b = f"CAST(ascii(substring({g}, {j}, 1)) AS UBIGINT)"
        h = mul64(f"xor({h}, {b})", _FNV_PRIME)
    return h


def maxent_decode_ctes(
    weights_parquet: str,
    classes: list[int],
    bias: list[float],
    nb: int,
    src_cte: str = "phr",
) -> str:
    """Parameterized maxent-decode CTE chain: score every DISTINCT
    ``phrase`` from ``{src_cte}(phrase, ...)`` against the frozen
    weight parquet in float64 — FNV-1a hashed 2/3-gram featurize,
    L2 norm, softmax — ending in ``dec(phrase, p1, p2, j)`` (top-2
    probabilities + winning column) and ``clsmap(j, cls)``. Shared by
    the b14 oracle and the micro-pipeline classification oracle
    (:mod:`scoobie_spark.micro_sql`), which freeze different models."""
    k = len(classes)
    sums = ", ".join(f"sum(f.c * w.c{j}) AS s{j}" for j in range(k))
    zs = ", ".join(f"s.s{j} / n.nv + {bias[j]!r} AS z{j}" for j in range(k))
    zmax = "greatest(" + ", ".join(f"z{j}" for j in range(k)) + ")"
    es = ", ".join(f"exp(z{j} - {zmax}) AS e{j}" for j in range(k))
    etot = " + ".join(f"e{j}" for j in range(k))
    plist = "[" + ", ".join(f"e{j} / ({etot})" for j in range(k)) + "]"
    clsmap = ", ".join(f"({j + 1}, CAST({c} AS BIGINT))" for j, c in enumerate(classes))
    return f"""w AS MATERIALIZED (SELECT * FROM '{weights_parquet}'),
ptxt AS (SELECT DISTINCT phrase, '^' || lower(phrase) || '$' AS t FROM {src_cte}),
-- hashed char-ngram bag (classify._featurize): FNV-1a of each 2/3-gram
g2 AS (SELECT phrase, substring(t, CAST(i AS INTEGER), 2) AS g
       FROM ptxt, unnest(generate_series(1, length(t) - 1)) AS u(i)),
g3 AS (SELECT phrase, substring(t, CAST(i AS INTEGER), 3) AS g
       FROM ptxt, unnest(generate_series(1, length(t) - 2)) AS u(i)),
grams AS (
  SELECT phrase, CAST({_fnv_expr('g', 2)} % {nb} AS INTEGER) AS bucket FROM g2
  UNION ALL
  SELECT phrase, CAST({_fnv_expr('g', 3)} % {nb} AS INTEGER) AS bucket FROM g3
),
feat AS (SELECT phrase, bucket, CAST(count(*) AS DOUBLE) AS c
         FROM grams GROUP BY 1, 2),
nrm AS (SELECT phrase, sqrt(sum(c * c)) AS nv FROM feat GROUP BY 1),
sc AS (SELECT f.phrase, {sums}
       FROM feat f JOIN w ON w.bucket = f.bucket GROUP BY 1),
zt AS (SELECT s.phrase, {zs} FROM sc s JOIN nrm n ON n.phrase = s.phrase),
sm AS (SELECT phrase, {es} FROM zt),
dec AS (
  SELECT phrase,
         list_sort({plist}, 'DESC')[1] AS p1,
         list_sort({plist}, 'DESC')[2] AS p2,
         list_position({plist}, list_sort({plist}, 'DESC')[1]) AS j
  FROM sm
),
clsmap(j, cls) AS (VALUES {clsmap})"""


def b14_classify_sql(per_phrase: bool = False) -> str:
    """The oracle: rebuild the synthetic KB (shared CTE block with the
    flagship oracle), featurize every distinct label phrase with the
    replayed FNV-1a bucket hash, score against the frozen weights in
    float64, apply softmax + the top1−top2 > margin accept rule, and
    count accepted rows per predicted class — value-for-value against
    q_b14_classify's groupBy("cls").count. ``per_phrase=True`` returns
    the pre-aggregation decisions instead (phrase, predicted cls,
    top1/top2 probabilities) for the test-side per-row parity check."""
    from .flagship_sql import kb_synthesis_ctes

    with open(META_JSON) as f:
        meta = json.load(f)
    classes, bias = meta["classes"], meta["bias"]
    nb = meta["n_buckets"]
    assert meta["n_instances"] == B14_N_INSTANCES and meta["epochs"] == B14_EPOCHS

    return f"""
WITH
{kb_synthesis_ctes(B14_N_INSTANCES)},
-- q_b14 phrase rows: DISTINCT (subject, label literal)
phr AS (
  SELECT DISTINCT st.subject AS doc_id, l.literal AS phrase
  FROM symtab st JOIN litid l ON l.lit_id = st.lit_id
),
{maxent_decode_ctes(WEIGHTS_PARQUET, classes, bias, nb)}
{"SELECT dec.phrase, m.cls AS cls, dec.p1, dec.p2 FROM dec JOIN clsmap m ON m.j = dec.j"
 if per_phrase else
 f'''SELECT m.cls AS cls, count(*) AS n_accepted
FROM phr JOIN dec USING (phrase) JOIN clsmap m ON m.j = dec.j
WHERE dec.p1 - dec.p2 > {B14_MARGIN!r}
GROUP BY 1'''}
"""
