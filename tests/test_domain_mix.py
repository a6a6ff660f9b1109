"""domain_mix (extras.sampling) plan-semantics tests. The DuckDB
value differential runs in test_oracles_sql (domain_mix)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scoobie_spark.extras.sampling import domain_mix


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_binding_domain_keeps_all_and_rates_are_exact(spark):
    # domain a: 4 docs x 10 tokens, weight 1 → over-represented
    # domain b: 2 docs x 10 tokens, weight 3 → binding (max w/tok)
    ten = " ".join(f"t{i}" for i in range(10))
    rows = [(i, ten, "a") for i in range(4)] + [(10 + i, ten, "b") for i in range(2)]
    w = F.when(F.col("source") == "b", 3).otherwise(1)
    out = {r["source"]: r for r in domain_mix(_docs(spark, rows), weight_expr=w).collect()}
    assert out["b"]["thr"] == 1_000_000          # binding domain keeps all
    assert out["b"]["docs_out"] == 2 and out["b"]["tokens_out"] == 20
    # a's exact plan: floor(1e6 * w_a*tok_b / (tok_a*w_b)) = 1e6*20//120
    assert out["a"]["thr"] == 1_000_000 * 1 * 20 // (40 * 3)
    assert out["a"]["docs_in"] == 4 and out["a"]["tokens_in"] == 40
    assert 0 <= out["a"]["docs_out"] <= 4


def test_zero_token_domain_keeps_all_and_never_binds(spark):
    ten = " ".join(f"t{i}" for i in range(10))
    rows = [(0, ten, "a"), (1, ten, "a"), (2, "", "empty")]
    out = {r["source"]: r for r in domain_mix(_docs(spark, rows)).collect()}
    assert out["empty"]["thr"] == 1_000_000 and out["empty"]["docs_out"] == 1
    # with equal weights, 'a' is the only token-bearing domain → binding
    assert out["a"]["thr"] == 1_000_000 and out["a"]["docs_out"] == 2


def test_uniform_weights_keep_everything_on_balanced_corpus(spark):
    ten = " ".join(f"t{i}" for i in range(10))
    rows = [(i, ten, f"s{i % 3}") for i in range(9)]
    out = domain_mix(_docs(spark, rows)).collect()
    assert all(r["thr"] == 1_000_000 and r["docs_out"] == r["docs_in"] for r in out)
