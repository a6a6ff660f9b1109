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


LOCAL_OR_DIST = pytest.mark.parametrize(
    "thr", [1 << 20, 0], ids=["local", "distributed"]
)


@LOCAL_OR_DIST
def test_connected_components(spark, edges, thr):
    cc = {
        (r["node"], r["component"])
        for r in graph.connected_components(edges, local_threshold=thr).collect()
    }
    assert cc == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}


@LOCAL_OR_DIST
def test_connected_components_long_chain(spark, thr):
    """100-hop path: the star-contraction rounds must close it exactly
    (plain min-label propagation would need 100 rounds and silently
    return wrong components at max_iter=20 — the round-1 bug). The
    local kernel's pointer jumping must close it too."""
    e = spark.createDataFrame([(i, i + 1) for i in range(100)], "src long, dst long")
    cc = graph.connected_components(e, local_threshold=thr)
    rows = {(r["node"], r["component"]) for r in cc.collect()}
    assert rows == {(i, 0) for i in range(101)}


def test_connected_components_nonconvergence_raises(spark):
    e = spark.createDataFrame([(i, i + 1) for i in range(50)], "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        graph.connected_components(e, max_iter=1, local_threshold=0)


@LOCAL_OR_DIST
def test_connected_components_reversed_and_shuffled_edges(spark, thr):
    # direction and order must not matter; self-loops ignored
    e = spark.createDataFrame(
        [(7, 3), (3, 9), (9, 9), (2, 7), (50, 40)], "src long, dst long"
    )
    cc = {
        (r["node"], r["component"])
        for r in graph.connected_components(e, local_threshold=thr).collect()
    }
    assert cc == {(2, 2), (3, 2), (7, 2), (9, 2), (40, 40), (50, 40)}


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


def test_pagerank_local_vs_distributed(spark):
    """Differential: the driver-side numpy gate and the distributed
    join loop agree to float-policy precision (1e-9, well inside the
    6-decimal rounding both oracles apply) on random graphs, including
    string node keys (the codegraph repo graph's shape)."""
    import random

    random.seed(31)
    for trial in range(5):
        n_nodes = random.randint(2, 40)
        es = [
            (f"r{random.randrange(n_nodes)}", f"r{random.randrange(n_nodes)}")
            for _ in range(random.randint(1, 60))
        ]
        es = list(dict.fromkeys(es))
        e = spark.createDataFrame(es, "src string, dst string")
        loc = {r["node"]: r["rank"] for r in graph.pagerank(e, max_iter=8).collect()}
        dist = {
            r["node"]: r["rank"]
            for r in graph.pagerank(e, max_iter=8, local_threshold=0).collect()
        }
        assert set(loc) == set(dist)
        assert all(abs(loc[k] - dist[k]) < 1e-9 for k in loc)


def test_hits(spark):
    # hub 1 points to 2,3,4 → 1 best hub; 2,3,4 equal authorities
    e = spark.createDataFrame([(1, 2), (1, 3), (1, 4)], "src long, dst long")
    h = {r["node"]: (r["hub"], r["auth"]) for r in graph.hits(e, max_iter=5).collect()}
    assert h[1][0] == max(v[0] for v in h.values())
    assert h[2][1] == pytest.approx(h[3][1]) == pytest.approx(h[4][1])


@LOCAL_OR_DIST
def test_connected_components_random_vs_union_find(spark, thr):
    """Differential: 20 random graphs vs a python union-find oracle —
    exact (node → min-node-of-component) maps must match, on both the
    local numpy kernel and the distributed star-contraction."""
    import random

    random.seed(23)
    for trial in range(20):
        n_nodes = random.randint(2, 60)
        n_edges = random.randint(1, 80)
        es = [
            (random.randrange(n_nodes), random.randrange(n_nodes))
            for _ in range(n_edges)
        ]
        parent = list(range(n_nodes))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        touched = set()
        for a, b in es:
            touched.add(a)
            touched.add(b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {x: find(x) for x in touched}

        e = spark.createDataFrame(es, "src long, dst long")
        got = {
            r["node"]: r["component"]
            for r in graph.connected_components(e, local_threshold=thr).collect()
        }
        assert got == want, (trial, es)


def test_hits_no_single_partition_exchange(spark):
    """The per-iteration L2 normalization must be a scalar agg broadcast
    back onto the scores — not a partitionBy(lit(1)) window, which
    funnels the whole node table through one partition each round."""
    e = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "src long, dst long")
    plan = graph.hits(e, max_iter=1, checkpoint=False)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "Exchange SinglePartition" not in plan


def test_pagerank_seeded(spark):
    """Personalized PageRank: teleport mass restricted to the seed
    set, so nodes unreachable from any seed score exactly 0; the
    local numpy gate and the distributed loop agree."""
    # a -> b -> c  and an isolated pair d -> e
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "e")], "src string, dst string"
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    loc = {
        r["node"]: r["rank"]
        for r in graph.pagerank(e, max_iter=8, seeds=seeds).collect()
    }
    dist = {
        r["node"]: r["rank"]
        for r in graph.pagerank(
            e, max_iter=8, seeds=seeds, local_threshold=0
        ).collect()
    }
    assert set(loc) == {"a", "b", "c", "d", "e"}
    assert all(abs(loc[k] - dist[k]) < 1e-9 for k in loc)
    # only the seed teleports; everything flows from it
    assert loc["a"] == 0.1
    assert loc["b"] > loc["c"] > 0
    # unreachable from the seed set: exactly zero
    assert loc["d"] == 0.0 and loc["e"] == 0.0


def test_pagerank_seeds_all_equals_classic(spark):
    """Seeding EVERY node reproduces the classic recurrence exactly."""
    e = spark.createDataFrame([(1, 99), (2, 99), (99, 1)], "src long, dst long")
    all_nodes = spark.createDataFrame([(1,), (2,), (99,)], "node long")
    classic = {r["node"]: r["rank"] for r in graph.pagerank(e, max_iter=6).collect()}
    seeded = {
        r["node"]: r["rank"]
        for r in graph.pagerank(e, max_iter=6, seeds=all_nodes).collect()
    }
    assert classic == seeded


@LOCAL_OR_DIST
def test_scc_random_vs_kosaraju(spark, thr):
    """Differential: random digraphs vs a python Kosaraju oracle —
    exact (node → min-node-of-SCC) maps must match on both the local
    Tarjan gate and the distributed coloring decomposition."""
    import random

    random.seed(47)
    trials = 12 if thr else 4  # the distributed path is many jobs
    for trial in range(trials):
        n = random.randint(2, 18 if thr == 0 else 40)
        es = list(
            {
                (random.randrange(n), random.randrange(n))
                for _ in range(random.randint(1, 3 * n))
            }
        )
        es = [(a, b) for a, b in es if a != b]
        if not es:
            continue

        # Kosaraju oracle
        adj: dict[int, list[int]] = {}
        radj: dict[int, list[int]] = {}
        nodes = set()
        for a, b in es:
            adj.setdefault(a, []).append(b)
            radj.setdefault(b, []).append(a)
            nodes.update((a, b))

        order: list[int] = []
        seen: set[int] = set()
        for s in sorted(nodes):
            if s in seen:
                continue
            stack = [(s, iter(adj.get(s, [])))]
            seen.add(s)
            while stack:
                v, it = stack[-1]
                for w in it:
                    if w not in seen:
                        seen.add(w)
                        stack.append((w, iter(adj.get(w, []))))
                        break
                else:
                    order.append(v)
                    stack.pop()
        want: dict[int, int] = {}
        assigned: set[int] = set()
        for s in reversed(order):
            if s in assigned:
                continue
            members = []
            stack2 = [s]
            assigned.add(s)
            while stack2:
                v = stack2.pop()
                members.append(v)
                for w in radj.get(v, []):
                    if w not in assigned:
                        assigned.add(w)
                        stack2.append(w)
            root = min(members)
            for m in members:
                want[m] = root

        e = spark.createDataFrame(es, "src long, dst long")
        got = {
            r["node"]: r["scc"]
            for r in graph.strongly_connected(e, local_threshold=thr).collect()
        }
        assert got == want, (trial, es)
