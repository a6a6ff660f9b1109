"""DuckDB replay of the full spot→link→classify micro pipeline
(q_micro_pipeline_classification) — the LAST rows-only driver row.

The query is the staged pipeline over the synthetic corpus with the
B20 classification resolver (ClassificationBasedResolver.java:44-105):
spotting + span filters, per-doc components over the bipartite phrase
edges, then — inside each ambiguous component — keep the subjects
whose maxent-PREDICTED type cluster equals their KNOWN majority
cluster, drop the rest; output = surviving candidate-row count per
subject.

Everything relational reuses the already-hash-verified flagship CTE
machinery (:mod:`scoobie_spark.flagship_sql`): KB + corpus synthesis,
chained-xxhash64 doc ids, positional spotting, B10-B12 span filters,
the components recursive CTE. The two driver-side trained artifacts
follow the frozen-artifact pattern of :mod:`scoobie_spark.b14_sql`:

* **type clusters** (A14 average-link clustering over Pearson type
  correlation — driver-side numpy): frozen as a (type, cluster)
  parquet; deterministic because the correlation matrix is built from
  a canonically-ordered co-occurrence collect and the clustering is
  a deterministic merge loop. tests/test_micro_sql.py asserts a live
  recompute equals the artifact exactly.
* **maxent weights** (400-epoch full-batch GD over cluster-labeled
  literal pairs): frozen as weights parquet + meta JSON; training is
  bit-deterministic (total (literal, cls) collect order, seeded init —
  the b14 argument). The decode replays through the SAME parameterized
  float64 SQL (:func:`scoobie_spark.b14_sql.maxent_decode_ctes`); the
  margin here is 0.0 (accept unless top-2 probabilities tie exactly),
  and the parity test measures the minimum top1−top2 gap over every
  spotted surface to show the f32(engine)/f64(oracle) split cannot
  flip an accept or a class pick.

Reference chain: RDFLiteralSpotting (B7-B12), EntityDisambiguation
componentLiterals (B16), ClassificationBasedResolver.resolve (B20) —
file:line cites in the corresponding engine modules.
"""

from __future__ import annotations

import json
import os

MODELS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "models")
CLUSTERS_PARQUET = os.path.join(MODELS_DIR, "micro_type_clusters.parquet")
WEIGHTS_PARQUET = os.path.join(MODELS_DIR, "micro_maxent_weights.parquet")
META_JSON = os.path.join(MODELS_DIR, "micro_maxent_meta.json")

# q_micro_pipeline_classification's exact configuration (queries.py).
MICRO_N_INSTANCES = 100
MICRO_EPOCHS = 400
MICRO_MARGIN = 0.0


def train_micro(spark):
    """The engine's micro-pipeline model pair: A14 type clusters of the
    synth_kb(100) and the 400-epoch maxent over cluster-labeled literal
    pairs, collected in (literal, cls) total order. Shared by
    q_micro_pipeline_classification, the exporter and the parity tests
    — one definition, the consumers cannot drift."""
    from .classify import train_entity_classifier, training_pairs
    from .fixtures import synth_kb
    from .kb.stats import type_clusters

    kb = synth_kb(spark, n_instances=MICRO_N_INSTANCES)
    clusters = type_clusters(kb, sample_per_type=None)
    pairs = training_pairs(kb, clusters).orderBy("literal", "cls")
    return kb, clusters, train_entity_classifier(pairs, epochs=MICRO_EPOCHS)


def export_micro(spark) -> None:
    """Freeze both artifacts: (type, cluster) parquet sorted by type,
    dense weight matrix parquet (f32 widened losslessly to f64) +
    bias/classes/config JSON sidecar."""
    import pandas as pd

    _, clusters, clf = train_micro(spark)
    cl = (
        clusters.toPandas()
        .sort_values("type")
        .reset_index(drop=True)
        .astype({"type": "int64", "cluster": "int64"})
    )
    cl.to_parquet(CLUSTERS_PARQUET, index=False)
    w = clf.weights.astype("float64")
    cols = {"bucket": range(w.shape[0])}
    for k in range(w.shape[1]):
        cols[f"c{k}"] = w[:, k]
    pd.DataFrame(cols).to_parquet(WEIGHTS_PARQUET, index=False)
    meta = {
        "classes": [int(c) for c in clf.classes],
        "bias": [float(b) for b in clf.bias],
        "n_buckets": int(w.shape[0]),
        "n_instances": MICRO_N_INSTANCES,
        "epochs": MICRO_EPOCHS,
        "margin": MICRO_MARGIN,
    }
    with open(META_JSON, "w") as f:
        json.dump(meta, f, indent=1)


def micro_sql_available() -> bool:
    return all(
        os.path.exists(p) for p in (CLUSTERS_PARQUET, WEIGHTS_PARQUET, META_JSON)
    )


def spotted_surfaces_sql() -> str:
    """Test support: the DISTINCT spotted surfaces the classification
    step sees (the maxent's real input domain), via the same verified
    spotting CTEs — so the decision-slack test measures margins on
    exactly the phrases whose predictions the oracle must reproduce."""
    from .flagship_sql import corpus_ctes, kb_synthesis_ctes, spot_component_ctes

    return f"""
WITH RECURSIVE
{kb_synthesis_ctes(MICRO_N_INSTANCES)},
{corpus_ctes(MICRO_N_INSTANCES)},
{spot_component_ctes()}
SELECT DISTINCT surface FROM f12
"""


def micro_pipeline_sql() -> str:
    """The oracle: flagship corpus/KB/spotting/components CTEs at
    n_instances=100, frozen type clusters + maxent weights, the
    classification-resolver keep/drop rule, and the surviving
    candidate-row count per subject — value-for-value against
    q_micro_pipeline_classification."""
    from .b14_sql import maxent_decode_ctes
    from .flagship_sql import corpus_ctes, kb_synthesis_ctes, spot_component_ctes

    with open(META_JSON) as f:
        meta = json.load(f)
    assert meta["n_instances"] == MICRO_N_INSTANCES and meta["epochs"] == MICRO_EPOCHS

    return f"""
WITH RECURSIVE
{kb_synthesis_ctes(MICRO_N_INSTANCES)},
{corpus_ctes(MICRO_N_INSTANCES)},
{spot_component_ctes()},
clus AS MATERIALIZED (SELECT type, cluster FROM '{CLUSTERS_PARQUET}'),
-- maxent input: the engine classifies DISTINCT spans but the model
-- only sees the surface text, so DISTINCT surfaces suffice
phr AS (SELECT DISTINCT surface AS phrase FROM f12),
{maxent_decode_ctes(WEIGHTS_PARQUET, meta["classes"], meta["bias"], meta["n_buckets"])},
-- known majority cluster per candidate subject (facts.majority_cluster:
-- vote over rdf:type clusters, ties → lowest cluster id)
kcl AS MATERIALIZED (
  SELECT subject, cluster AS kcluster FROM (
    SELECT s.subject, c.cluster,
           row_number() OVER (PARTITION BY s.subject
                              ORDER BY count(*) DESC, c.cluster ASC) AS rn
    FROM (SELECT DISTINCT subject FROM f12) s
    JOIN rel r ON r.s = s.subject AND r.p = (SELECT id FROM tid)
    JOIN clus c ON c.type = r.o
    GROUP BY s.subject, c.cluster)
  WHERE rn = 1
),
-- margin-gated span predictions (classify_phrases, margin={MICRO_MARGIN!r}):
-- strict >, so an exact top-2 tie abstains on both sides
pred AS (
  SELECT f.doc_id, f."begin", f."end", m.cls AS pred_cluster
  FROM (SELECT DISTINCT doc_id, "begin", "end", surface FROM f12) f
  JOIN dec d ON d.phrase = f.surface
  JOIN clsmap m ON m.j = d.j
  WHERE d.p1 - d.p2 > {MICRO_MARGIN!r}
),
cand_pred AS (
  SELECT DISTINCT f.doc_id, f.subject, p.pred_cluster
  FROM f12 f JOIN pred p ON p.doc_id = f.doc_id
                        AND p."begin" = f."begin" AND p."end" = f."end"
),
-- ham: positively-confirmed subjects inside ambiguous components
ham AS MATERIALIZED (
  SELECT DISTINCT a.doc_id, a.component, a.subject
  FROM amb_subj a
  JOIN kcl k ON k.subject = a.subject
  JOIN cand_pred cp ON cp.doc_id = a.doc_id AND cp.subject = a.subject
  WHERE cp.pred_cluster = k.kcluster
),
-- losers: unconfirmed subjects of components with ≥1 confirmed subject
-- (the engine's removal guard: abstaining components stay intact)
losers AS MATERIALIZED (
  SELECT DISTINCT a.doc_id, a.subject
  FROM amb_subj a
  JOIN (SELECT DISTINCT doc_id, component FROM ham) h
    USING (doc_id, component)
  WHERE NOT EXISTS (SELECT 1 FROM ham x
                    WHERE x.doc_id = a.doc_id AND x.component = a.component
                      AND x.subject = a.subject)
)
SELECT f.subject, count(*) AS n_mentions
FROM f12 f
WHERE NOT EXISTS (SELECT 1 FROM losers l
                  WHERE l.doc_id = f.doc_id AND l.subject = f.subject)
GROUP BY f.subject
"""
