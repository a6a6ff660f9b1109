"""Distributed graph operators (connected components, degrees, pagerank,
HITS) on hand-checkable graphs."""

import pytest
from pyspark.sql import functions as F

from scoobie_spark import graph


@pytest.fixture(scope="module")
def edges(spark):
    # two components: {1,2,3,4} chain + {10,11}; 20 isolated-with-self? none
    return spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "src long, dst long"
    )


def test_connected_components(spark, edges):
    cc = {(r["node"], r["component"]) for r in graph.connected_components(edges).collect()}
    assert cc == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}


def test_connected_components_long_chain(spark):
    # chain of 40 nodes exercises the pointer-jumping rounds
    e = spark.createDataFrame([(i, i + 1) for i in range(40)], "src long, dst long")
    cc = graph.connected_components(e)
    assert cc.select("component").distinct().count() == 1
    assert cc.count() == 41


def test_degrees(spark, edges):
    d = {r["node"]: (r["in_deg"], r["out_deg"], r["degree"]) for r in graph.degrees(edges).collect()}
    assert d[2] == (1, 1, 2)
    assert d[1] == (0, 1, 1)
    assert d[4] == (1, 0, 1)


def test_pagerank_sink_dominates(spark):
    # star into node 99 → 99 has the max rank
    e = spark.createDataFrame([(i, 99) for i in range(1, 6)], "src long, dst long")
    pr = graph.pagerank(e, alpha=0.1, max_iter=10)
    top = pr.orderBy(F.col("rank").desc()).first()
    assert top["node"] == 99


def test_hits(spark):
    # hub 1 points to 2,3,4 → 1 best hub; 2,3,4 equal authorities
    e = spark.createDataFrame([(1, 2), (1, 3), (1, 4)], "src long, dst long")
    h = {r["node"]: (r["hub"], r["auth"]) for r in graph.hits(e, max_iter=5).collect()}
    assert h[1][0] == max(v[0] for v in h.values())
    assert h[2][1] == pytest.approx(h[3][1]) == pytest.approx(h[4][1])
