"""Unit tests for the code knowledge-graph family
(scoobie_spark/extras/codegraph.py) over a hand-built corpus with known
imports, definitions, vendored copies, ambiguity and call sites."""

from __future__ import annotations

import pytest

from scoobie_spark.extras import codegraph


def _files(spark, rows):
    return spark.createDataFrame(rows, "repo string, path string, content string")


@pytest.fixture(scope="module")
def corpus(spark):
    # ra defines util (and helper), imports core; rb defines core, calls
    # util's helper; rc vendors util (same module name) and defines its
    # own thing; rd imports both util and core and calls helper + parse
    return _files(
        spark,
        [
            (
                "ra",
                "src/util.py",
                "import core\ndef helper(x):\n    return core.parse(x)\nclass Shared:\n    pass\n",
            ),
            (
                "rb",
                "lib/core.py",
                "def parse(s):\n    return s\nclass Shared:\n    pass\n",
            ),
            ("rc", "vendor/util.py", "def vendored():\n    pass\n"),
            (
                "rd",
                "app/main.py",
                "import util\nfrom core import parse\ndef main():\n    return helper(parse(1))\n",
            ),
        ],
    )


def test_import_edges(corpus):
    got = {
        (r.repo, r.module)
        for r in codegraph.import_edges(corpus).collect()
    }
    assert got == {("ra", "core"), ("rd", "util"), ("rd", "core")}


def test_module_defs(corpus):
    got = {(r.module, r.def_repo) for r in codegraph.module_defs(corpus).collect()}
    assert got == {
        ("util", "ra"),
        ("util", "rc"),
        ("core", "rb"),
        ("main", "rd"),
    }


def test_repo_dependencies_and_vendor_cap(corpus):
    # util is defined in 2 repos -> kept at the default cap, so rd->ra
    # and rd->rc both appear; with max_def_repos=1 the vendored module
    # drops out entirely
    deps = {
        (r.src_repo, r.dst_repo): r.weight
        for r in codegraph.repo_dependencies(corpus).collect()
    }
    assert deps == {
        ("ra", "rb"): 1,  # ra imports core (defined by rb)
        ("rd", "ra"): 1,  # rd imports util -> ra's copy
        ("rd", "rc"): 1,  # ...and rc's vendored copy
        ("rd", "rb"): 1,  # rd imports core
    }

    capped = {
        (r.src_repo, r.dst_repo)
        for r in codegraph.repo_dependencies(corpus, max_def_repos=1).collect()
    }
    assert capped == {("ra", "rb"), ("rd", "rb")}


def test_symbol_defs_and_ambiguity(corpus):
    defs = {
        (r.repo, r.symbol, r.kind) for r in codegraph.symbol_defs(corpus).collect()
    }
    assert ("ra", "helper", "def") in defs
    assert ("ra", "Shared", "class") in defs
    assert ("rb", "Shared", "class") in defs
    amb = {r.symbol: (r.n_repos, r.n_defs) for r in codegraph.symbol_ambiguity(corpus).collect()}
    # Shared is the only symbol defined in >1 repo
    assert amb == {"Shared": (2, 2)}


def test_call_sites_exclude_own_defs(corpus):
    calls = {
        (r.repo, r.symbol) for r in codegraph.call_sites(corpus).collect()
    }
    # ra calls core.parse -> parse (helper is its own def, excluded)
    assert ("ra", "parse") in calls
    assert ("ra", "helper") not in calls
    # rd calls helper and parse (main is its own def, excluded)
    assert ("rd", "helper") in calls and ("rd", "parse") in calls
    assert ("rd", "main") not in calls


def test_symbol_xref_unique_sense(corpus):
    xref = {
        (r.caller_repo, r.def_repo, r.symbol): r.n_files
        for r in codegraph.symbol_xref(corpus).collect()
    }
    # parse uniquely defined in rb; helper uniquely in ra; Shared is
    # ambiguous (never linked); own-repo links excluded
    assert xref == {
        ("ra", "rb", "parse"): 1,
        ("rd", "rb", "parse"): 1,
        ("rd", "ra", "helper"): 1,
    }


def test_repo_rank_flows_to_dependencies(corpus, spark):
    deps = codegraph.repo_dependencies(corpus)
    ranks = {r.repo: r.rank for r in codegraph.repo_rank(deps).collect()}
    # rb is depended on by ra and rd and imports nothing: highest rank
    assert max(ranks, key=ranks.get) == "rb"
    # damped floor: every node gets at least alpha
    assert all(v >= 0.1 - 1e-12 for v in ranks.values())
    # deterministic: same input, same floats
    again = {r.repo: r.rank for r in codegraph.repo_rank(deps).collect()}
    assert again == ranks


def test_repo_families_threshold_and_label(spark):
    """Only weight>=min_weight edges connect; families labeled by
    their lexicographically smallest member; the weak edge (weight 1)
    does not merge the two families."""
    from pyspark.sql import functions as F  # noqa: N812

    deps = spark.createDataFrame(
        [
            ("rb", "ra", 3),
            ("rc", "rb", 2),
            ("re", "rd", 5),
            ("rd", "ra", 1),  # weak: must NOT merge the families
        ],
        "src_repo string, dst_repo string, weight long",
    )
    fam = {r.repo: r.family for r in codegraph.repo_families(deps).collect()}
    assert fam == {"ra": "ra", "rb": "ra", "rc": "ra", "rd": "rd", "re": "rd"}
    # with the threshold at 1 the weak edge merges everything
    fam1 = {
        r.repo: r.family
        for r in codegraph.repo_families(deps, min_weight=1).collect()
    }
    assert set(fam1.values()) == {"ra"}


def test_streaming_code_edges(spark, corpus, tmp_path):
    """The streaming twin: repo files through readStream → foreachBatch
    import_edges → parquet sink equals the batch-mode edge set."""
    from pyspark.sql import functions as F  # noqa: N812

    from scoobie_spark.streaming import streaming_code_edges

    src = str(tmp_path / "files")
    corpus.write.parquet(src)
    stream = spark.readStream.schema(corpus.schema).parquet(src)
    q = streaming_code_edges(
        stream, str(tmp_path / "edges"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    got = {
        (r["repo"], r["path"], r["module"])
        for r in spark.read.parquet(str(tmp_path / "edges")).collect()
    }
    batch = {
        (r["repo"], r["path"], r["module"])
        for r in codegraph.import_edges(corpus).collect()
    }
    assert got == batch and got


def test_symbol_resolve_cascade(spark):
    """local > dependency > rank > min-repo: r4 calls its own repo's
    symbol (local), r5 depends on r2 (dependency), r3 has no evidence
    and takes the highest-PageRank candidate (r2, the only repo with
    dependency inflow)."""
    rows = [
        ("r1", "a.py", "def common(x):\n    return 1\n"),
        ("r2", "m2.py", "def common(x):\n    return 2\n"),
        ("r4", "b.py", "def common(x):\n    return 4\n"),
        ("r4", "use.py", "y = common(3)\n"),
        ("r5", "c.py", "import m2\nz = common(5)\n"),
        ("r3", "d.py", "w = common(7)\n"),
    ]
    files = _files(spark, rows)
    out = {
        (r.caller_repo, r.symbol): (r.resolved_repo, r.via, r.n_candidates)
        for r in codegraph.symbol_resolve(files).collect()
    }
    assert out[("r4", "common")] == ("r4", "local", 3)
    assert out[("r5", "common")] == ("r2", "dependency", 3)
    assert out[("r3", "common")] == ("r2", "rank", 3)
    # cap: with max_candidates=2 the 3-way symbol carries no signal
    assert codegraph.symbol_resolve(files, max_candidates=2).count() == 0


def test_repo_scc(spark):
    """Cycle r1<->r2 (through weights) is one SCC; r3 only depends
    outward (singleton); a 3-cycle r4->r5->r6->r4 is one SCC."""
    deps = spark.createDataFrame(
        [
            ("r1", "r2", 2), ("r2", "r1", 1),
            ("r3", "r1", 5),
            ("r4", "r5", 1), ("r5", "r6", 1), ("r6", "r4", 1),
        ],
        "src_repo string, dst_repo string, weight long",
    )
    out = {r.repo: (r.scc, r.scc_size) for r in codegraph.repo_scc(deps).collect()}
    assert out["r1"] == ("r1", 2) and out["r2"] == ("r1", 2)
    assert out["r3"] == ("r3", 1)
    assert out["r4"] == out["r5"] == out["r6"] == ("r4", 3)


def test_repo_scc_full_graph_is_one_cycle(spark):
    """The full sf0.001 dependency graph (dense, 968-ish edges at
    sf0.01 scale) collapses to ONE giant SCC — the degenerate case the
    repo_cycles query's subsample deliberately avoids, handled
    correctly by the same operator."""
    import sys

    sys.path.insert(0, ".")
    from scoobie_spark.queries import _repo_files

    files = _repo_files(spark, "/root/testdata/sf0.001")
    deps = codegraph.repo_dependencies(files)
    out = codegraph.repo_scc(deps)
    sizes = {r.scc_size for r in out.collect()}
    assert sizes == {97}


def test_kg_triples_relations(spark, corpus):
    """The materialized triple view carries all four relations and the
    uses_symbol/defined_in split joins back to exactly the xref links."""
    t = codegraph.kg_triples(corpus, family_min_weight=1).collect()
    by_pred: dict[str, set] = {}
    for r in t:
        by_pred.setdefault(r.pred, set()).add((r.subj, r.obj))
    assert set(by_pred) == {"depends_on", "in_family", "uses_symbol", "defined_in"}
    # depends_on mirrors repo_dependencies' edge set
    deps = {
        (r.src_repo, r.dst_repo)
        for r in codegraph.repo_dependencies(corpus).collect()
    }
    assert by_pred["depends_on"] == deps
    # join-back over the symbol reconstructs the xref links
    xref = {
        (r.caller_repo, r.symbol, r.def_repo)
        for r in codegraph.symbol_xref(corpus).collect()
    }
    joined = {
        (c, s, d)
        for (c, s) in by_pred["uses_symbol"]
        for (s2, d) in by_pred["defined_in"]
        if s == s2
    }
    assert joined == xref


def test_call_graph_edges(spark):
    # a calls b (bare) and c (through m.c — CALL_RE captures 'c'); the
    # def line's own-name match and b's recursion-free body drop out;
    # the class METHOD body is not a top-level block, so nothing from it
    content = (
        "def a(x):\n    return b(x) + m.c(x)\n"
        "def b(y):\n    return y\n"
        "class K:\n    def meth(self):\n        return hidden(1)\n"
    )
    df = _files(spark, [("r1", "src/x.py", content)])
    got = {
        (r["repo"], r["caller"], r["callee"], r["n_files"])
        for r in codegraph.call_graph(df).collect()
    }
    assert got == {("r1", "a", "b", 1), ("r1", "a", "c", 1)}


def test_call_graph_counts_distinct_files(spark):
    content = "def f(x):\n    return g(x)\n"
    df = _files(
        spark,
        [("r1", "src/x.py", content), ("r1", "src/y.py", content)],
    )
    out = codegraph.call_graph(df).collect()
    assert [(r["caller"], r["callee"], r["n_files"]) for r in out] == [
        ("f", "g", 2)
    ]


def test_api_usage_excludes_own_modules(spark):
    # m1 is defined IN r1 (src/m1.py) so its qualified calls are
    # intra-repo plumbing, not external API usage; m2 counts twice
    df = _files(
        spark,
        [
            ("r1", "src/m1.py", "m1.f(1)\nm2.g(2)\nm2.h(3)\n"),
            ("r2", "src/m2.py", "def g(x):\n    return x\n"),
        ],
    )
    out = codegraph.api_usage(df).collect()
    rows = [
        (r["repo"], r["module"], r["n_calls"], r["n_files"], r["rank"])
        for r in out
    ]
    assert rows == [("r1", "m2", 2, 1, 1)]


def test_api_usage_topk_and_ties(spark):
    # three external modules with counts 2/1/1 — rank by count desc
    # then module name asc; k=2 cuts the third
    df = _files(
        spark,
        [("r1", "a.txt", "x.f(1)\nx.g(2)\nz.h(3)\ny.i(4)\n")],
    )
    out = codegraph.api_usage(df, k=2).collect()
    assert [(r["module"], r["n_calls"], r["rank"]) for r in out] == [
        ("x", 2, 1),
        ("y", 1, 2),
    ]


def test_class_methods_block_boundaries(spark):
    # methods inside the class body count; the top-level def after the
    # class block does not; two classes in one file both extract
    content = (
        "class A:\n"
        "    def m1(self):\n        return 1\n"
        "    def m2(self):\n        return 2\n"
        "def free(x):\n    return x\n"
        "class B:\n    def m1(self):\n        return 3\n"
    )
    df = _files(spark, [("r1", "src/x.py", content)])
    got = {
        (r["class"], r["method"], r["n_files"])
        for r in codegraph.class_methods(df).collect()
    }
    assert got == {("A", "m1", 1), ("A", "m2", 1), ("B", "m1", 1)}


def test_doc_coverage_counts_and_floor(spark):
    # r1: 3 defs, 1 documented (""" first statement) -> 3333 bp;
    # a docstring NOT in first position does not count; r2: 0 defs
    content = (
        'def a(x):\n    """doc."""\n    return x\n'
        "def b(x):\n    return x\n"
        "def c(x):\n    y = 1\n    '''late'''\n    return y\n"
    )
    df = _files(
        spark,
        [("r1", "src/x.py", content), ("r2", "README", "no functions here\n")],
    )
    got = {r["repo"]: r.asDict() for r in codegraph.doc_coverage(df).collect()}
    assert got["r1"]["n_defs"] == 3
    assert got["r1"]["n_documented"] == 1
    assert got["r1"]["coverage_bp"] == 3333
    assert got["r2"]["n_defs"] == 0 and got["r2"]["coverage_bp"] == 0


def test_doc_coverage_single_quote_style(spark):
    df = _files(
        spark, [("r1", "x.py", "def a(x):\n    '''doc'''\n    return x\n")]
    )
    out = codegraph.doc_coverage(df).collect()[0]
    assert out["n_documented"] == 1 and out["coverage_bp"] == 10000


def test_dep_reach_hop_counts(spark):
    # chain a -> b -> c -> d plus a -> e: cumulative distinct reach
    edges = spark.createDataFrame(
        [("a", "b", 1), ("a", "e", 1), ("b", "c", 1), ("c", "d", 1)],
        "src_repo string, dst_repo string, weight int",
    )
    got = {r["repo"]: r.asDict() for r in codegraph.dep_reach(edges).collect()}
    assert (got["a"]["n_hop1"], got["a"]["n_hop2"], got["a"]["n_hop3"]) == (2, 3, 4)
    assert (got["b"]["n_hop1"], got["b"]["n_hop2"], got["b"]["n_hop3"]) == (1, 2, 2)
    assert (got["c"]["n_hop1"], got["c"]["n_hop3"]) == (1, 1)
    assert "d" not in got  # no outgoing edges -> no row
    assert "e" not in got


def test_dep_reach_cycle_excludes_self(spark):
    # a <-> b cycle: reach never includes the source itself
    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "a", 1)],
        "src_repo string, dst_repo string, weight int",
    )
    got = {r["repo"]: r.asDict() for r in codegraph.dep_reach(edges).collect()}
    assert (got["a"]["n_hop1"], got["a"]["n_hop2"], got["a"]["n_hop3"]) == (1, 1, 1)
    assert (got["b"]["n_hop1"], got["b"]["n_hop3"]) == (1, 1)


def test_dep_reach_local_matches_distributed(spark):
    # the small-graph driver gate must be bit-identical to the
    # distributed unrolled-join path (same convention as the
    # pagerank/connected_components gates)
    import random

    rng = random.Random(17)
    nodes = [f"r{i}" for i in range(30)]
    edges = {(rng.choice(nodes), rng.choice(nodes)) for _ in range(120)}
    df = spark.createDataFrame(
        [(s, d, 1) for s, d in edges if s != d],
        "src_repo string, dst_repo string, weight int",
    )
    local = {
        r["repo"]: (r["n_hop1"], r["n_hop2"], r["n_hop3"])
        for r in codegraph.dep_reach(df).collect()
    }
    dist = {
        r["repo"]: (r["n_hop1"], r["n_hop2"], r["n_hop3"])
        for r in codegraph.dep_reach(df, local_threshold=0).collect()
    }
    assert local == dist
