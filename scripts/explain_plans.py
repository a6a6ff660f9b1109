"""Dump physical plans for the headline queries — the .explain audit.

Checks, per query, the things that matter at 100 TB and prints a
one-line verdict plus the formatted plan:

* filters/column pruning reach the parquet scan (PushedFilters /
  ReadSchema),
* small dims broadcast (BroadcastHashJoin) instead of shuffling,
* expressions stay inside WholeStageCodegen spans,
* no CartesianProduct / unexpected SortMergeJoin on tiny sides.

Usage: python scripts/explain_plans.py [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "tpch_q1",
    "tpch_q5like",
    "c_point_lookup",
    "a6_dict_build",
    "a12_cardinalities",
    "b9_phrase_spotting",
    "dedup_exact",
    # survivors: the docs⋈components join reads doc_id ONLY from the
    # scan; the component side is left to AQE (broadcast when small —
    # it can be corpus-scale at a 100 TB dup rate, so no static hint)
    "dedup_survivors",
    "dedup_segments",
    "dedup_substrings",
    # semantic: literal-centroid assignment is a narrow projection; the
    # only exchanges are the cell self-join + the kills min-agg
    "dedup_semantic",
    "dsir_select",
    "pack_chunks",
    "ann_topk",
    "quality_repetition",
    # funnel reads every row by design — pushed_filters=n is expected
    "curation_funnel",
    "sample_split",
    "domain_mix",
    "pii_redact",
    "decontaminate",
    # code curation: quality/license are narrow map-only projections
    # (scan → project, no exchange); incremental is a distinct-agg +
    # LEFT ANTI equi-join on uniform sha256 keys
    "code_quality",
    "license_detect",
    "dedup_incremental",
    # tokenizer pair counting: partial-agg → pair-key exchange →
    # TakeOrderedAndProject (global top-k WITHOUT a global sort)
    "bpe_pairs",
    # kNN graph: cell equi-join candidates (corpus × probes), per-src
    # window top-k, one edge-set self-join for the mutual flag
    "knn_graph",
    # prototypes: narrow literal-centroid assignment; the only
    # exchanges are the per-cell count + hardness-rank window
    "prototypes_prune",
    # label propagation: N·k-edge equi-join + vote agg + argmax window
    # per round, lineage cut between rounds
    "label_propagate",
    # tf-idf: partial-agg tf/df, term equi-join (AQE skew-splittable),
    # 1-row broadcast N, per-doc top-k window
    "doc_tfidf",
    # code KG: scan-fused regexp_extract_all (only identifier tokens
    # leave the scan), module equi-join behind the vendored-copy df-cap
    "code_import_edges",
    "repo_dependencies",
    # unique-sense linking: def-side aggregation (small) BEFORE the
    # call-site equi-join, so hot ambiguous symbols never form pairs
    "symbol_xref",
    "symbol_ambiguity",
    # function dedup: digests computed inside the scan projection —
    # only 64-char hashes cross the exchange; pure agg, no join
    "dedup_functions",
    # repo assembly: window + groupBy share ONE repo-hash exchange
    "repo_concat",
    # comment stats: narrow map-only pass, no exchange
    "comment_density",
    # project families: thresholded edges -> int64-coded CC -> name join
    "repo_families",
    # staged gates: per-file signal joins -> one aggregate
    "code_funnel",
    # HEAD snapshot: ONE partial-agg struct-max groupBy, no window
    "latest_snapshot",
    # disambiguation: capped candidate join + bounded per-call-site window
    "symbol_resolve",
    # forks: digest self-join behind the boilerplate df-cap, int gates
    "fork_detect",
    # SCC: local Tarjan gate here; the distributed coloring path is
    # join-per-round (audited by its own differential tests)
    "repo_cycles",
    # the materialized KG: union of the component relations
    "code_kg_triples",
]

# queries whose semantics genuinely require one global exchange
# (global ORDER BY ... LIMIT collapses to a single partition by design)
_GLOBAL_ORDER_OK = {"c_order_limit"}


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    from scoobie_spark import queries as q
    from scoobie_spark.session import get_spark

    spark = get_spark("explain", cores=4)
    # AQE's AdaptiveSparkPlan wrapper hides codegen ids / join choices
    # from the pre-execution explain string; audit with AQE off (the
    # static plan), production runs keep AQE on
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    qs = q.queries()
    for name in names:
        df = qs[name](spark, sf)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        checks = {
            "pushed_filters": bool(re.search(r"PushedFilters: \[[^\]]", plan)),
            "codegen": "codegen id" in plan or "WholeStageCodegen" in plan,
            "broadcast_join": "BroadcastHashJoin" in plan
            or "BroadcastNestedLoopJoin" in plan  # broadcast cross joins
            or "Join" not in plan,
            "no_cartesian": "CartesianProduct" not in plan
            or name.startswith(("ann_", "dedup_embedding")),  # intended all-pairs
            # a SinglePartition exchange is the scan that never finishes at
            # 10^8+ rows (the round-1 global-window dictionary build bug)
            "no_single_part": "Exchange SinglePartition" not in plan
            or name in _GLOBAL_ORDER_OK,
        }
        verdict = " ".join(f"{k}={'Y' if v else 'n'}" for k, v in checks.items())
        print(f"===== {name}: {verdict}")
        print(plan)


if __name__ == "__main__":
    main()
