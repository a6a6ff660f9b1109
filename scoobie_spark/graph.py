"""Distributed graph operators on edge DataFrames — no GraphFrames jar
needed (the image ships none), pure DataFrame joins.

* :func:`connected_components` — alternating large-star/small-star
  (Kiveris et al., "Connected Components in MapReduce and Beyond",
  SOCC'14): converges in O(log² n) rounds, every round is two
  self-joins + aggregations, lineage cut per round. This is the
  GraphFrames-equivalent scale path the north_rule asks for; per-
  document mention graphs (tens of nodes) use the pandas union-find in
  :mod:`scoobie_spark.linking` instead — a cluster-wide iterative
  algorithm per tiny doc graph would be the wrong physical plan.
* :func:`degrees`, :func:`pagerank`, :func:`hits` — building blocks
  for the reference's alternative ambiguity resolvers and relevance
  metrics (disambiguation/*.java, rating/*.java).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _symmetrize(edges: DataFrame) -> DataFrame:
    e = edges.select("src", "dst")
    return e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def _large_star(e: DataFrame) -> DataFrame:
    """Kiveris Large-Star over canonical (u > v) edges: per node u with
    symmetric neighborhood Γ(u), m = min(Γ(u) ∪ {u}); emit (v, m) for
    every neighbor v > u. Output stays canonical (m < u < v)."""
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mv"))
        .select("u", F.least(F.col("mv"), F.col("u")).alias("m"))
    )
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Kiveris Small-Star over canonical (u > v) edges: per node u with
    smaller-neighbor set N(u), m = min(N(u)); emit (u, m) and (v, m)
    for v ∈ N(u) \\ {m}."""
    mins = e.groupBy("u").agg(F.min("v").alias("m"))
    own = mins.select("u", F.col("m").alias("v"))
    moved = (
        e.join(mins, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    return own.unionByName(moved).distinct()


def _edge_fingerprint(e: DataFrame) -> tuple[int, int]:
    row = e.agg(
        F.count("*").alias("n"),
        # decimal(38) accumulator: a sum of 64-bit hashes overflows long
        F.coalesce(
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)
        ).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"])


def _is_integral(df: DataFrame, *cols: str) -> bool:
    return all(
        df.schema[c].dataType.typeName() in ("long", "integer", "short", "byte")
        for c in cols
    )


def _cc_local(spark, nodes: DataFrame, e: DataFrame) -> DataFrame:
    """Driver-side contraction for sub-threshold graphs: min-label
    propagation with pointer jumping over factorized int64 node codes
    (the same numpy kernel as resolve_batch's per-batch B17, proven
    there by randomized differential tests). Labels only ever decrease
    and ``np.unique`` sorts, so code order == value order and the fixed
    point is exactly (node → min node id of its component) — identical
    output to the distributed star-contraction.

    Returns None (caller falls back to the distributed path) when any
    collected column arrives as a non-integer pandas dtype: NULL node
    ids make pandas widen int64 → float64, where NaN would silently
    become INT64_MIN and ids above 2^53 would lose precision — the
    distributed path handles both exactly."""
    import numpy as np

    node_dt = nodes.schema["node"].dataType
    ep = e.toPandas()
    npd = nodes.toPandas()["node"]
    if not all(
        np.issubdtype(c.dtype, np.integer) for c in (npd, ep["u"], ep["v"])
    ):
        return None
    np_nodes = npd.to_numpy(dtype=np.int64)
    u = ep["u"].to_numpy(dtype=np.int64)
    v = ep["v"].to_numpy(dtype=np.int64)
    uniq, codes = np.unique(np.concatenate([np_nodes, u, v]), return_inverse=True)
    nn = len(np_nodes)
    cu, cv = codes[nn:nn + len(u)], codes[nn + len(u):]
    lbl = np.arange(len(uniq), dtype=np.int64)
    while True:
        prev = lbl
        m = np.minimum(lbl[cu], lbl[cv])
        lbl = lbl.copy()
        np.minimum.at(lbl, cu, m)
        np.minimum.at(lbl, cv, m)
        lbl = lbl[lbl]
        lbl = lbl[lbl]
        if np.array_equal(lbl, prev):
            break
    node_codes = codes[:nn]
    out = pd.DataFrame(
        {"node": np_nodes, "component": uniq[lbl[node_codes]]}
    )
    schema = T.StructType(
        [T.StructField("node", node_dt), T.StructField("component", node_dt)]
    )
    return spark.createDataFrame(out, schema=schema)


def connected_components(
    edges: DataFrame, max_iter: int = 40, local_threshold: int = 1 << 20
) -> DataFrame:
    """(src, dst) → (node, component) with component = min node id.

    Real alternating large-star/small-star (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SOCC'14, Algorithms 2-3):
    every round is two grouped-min self-joins, each O(|E|) shuffled
    n-way parallel work, and the edge set converges to per-component
    stars centered at the minimum node in O(log² n) rounds — a 100-hop
    chain closes in a handful of rounds, unlike plain min-label
    propagation (O(diameter)). Lineage is cut per round; convergence is
    detected by an (edge count, hash sum) fingerprint, and running out
    of ``max_iter`` RAISES rather than silently returning partial
    components.

    Small graphs take a driver-side numpy contraction instead: each
    distributed round costs several fixed-overhead jobs (two self-join
    shuffles + fingerprint + lineage cut), which dominates wall-time
    when the deduped edge set is tiny — the same size-vs-strategy
    policy as Spark's broadcast-join threshold. The gate is measured,
    not guessed: the canonical edge count comes from the fingerprint
    the distributed loop needs anyway, and the node count from the
    already-materialized node set, so the probe adds one cheap count.
    At ``local_threshold`` = 2^20 the collect moves ≤ ~16 MB of int64
    pairs — broadcast-scale, not corpus-scale; a 100 TB near-dup graph
    (billions of edges) takes the distributed path unchanged. Pass
    ``local_threshold=0`` to force the distributed contraction (the
    scale-path tests do).
    """
    # cut lineage at the smallest projection of the RAW edges first:
    # nodes and the canonical edge set are both derived from it, so the
    # (possibly expensive) upstream plan — e.g. a near-dup pair
    # generator — executes exactly once instead of once per derivation
    base = edges.select("src", "dst").localCheckpoint()
    nodes = (
        base.select(F.col("src").alias("node"))
        .unionByName(base.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    e = (
        base.filter(F.col("src") != F.col("dst"))
        .select(
            F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
        )
        .distinct()
        .localCheckpoint()
    )
    fp = _edge_fingerprint(e)
    if (
        local_threshold
        and fp[0] <= local_threshold
        and _is_integral(edges, "src", "dst")
    ):
        n_nodes = nodes.count()
        if n_nodes <= 2 * local_threshold:
            local = _cc_local(edges.sparkSession, nodes, e)
            if local is not None:
                return local
    for _ in range(max_iter):
        prev = e
        e = _small_star(_large_star(e)).localCheckpoint()
        new_fp = _edge_fingerprint(e)
        if new_fp == fp:
            # the fingerprint is probabilistic (a 64-bit hash-sum
            # collision between different successive edge sets would
            # stop the contraction early with silently-wrong
            # components) — confirm exactly on the FINAL round only:
            # counts already match exactly, so one one-sided multiset
            # difference proves set equality. Per-round cost stays one
            # scalar agg; the exact join runs once per call.
            if e.exceptAll(prev).isEmpty():
                break
        fp = new_fp
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({fp[0]} edges remain) — raise max_iter"
        )
    # converged: stars (u → center v); centers and isolated nodes map to self
    stars = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    return (
        nodes.join(stars, "node", "left")
        .select("node", F.coalesce("component", F.col("node")).alias("component"))
    )


def degrees(edges: DataFrame) -> DataFrame:
    """(node, in_deg, out_deg, degree) from directed (src, dst) edges."""
    out_d = edges.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("out_deg"))
    in_d = edges.groupBy(F.col("dst").alias("node")).agg(F.count("*").alias("in_deg"))
    return (
        out_d.join(in_d, "node", "full")
        .fillna(0)
        .withColumn("degree", F.col("in_deg") + F.col("out_deg"))
    )


def _pagerank_local(
    spark,
    nodes: DataFrame,
    edges: DataFrame,
    alpha: float,
    max_iter: int,
    seeds: DataFrame | None = None,
) -> DataFrame | None:
    """Driver-side power iteration for sub-threshold graphs: the same
    recurrence as the distributed loop over factorized node codes
    (``np.add.at`` accumulation — deterministic f64, same modulo
    summation order, which the 6-decimal float policy absorbs; the
    differential test asserts agreement to 1e-9). Returns None when any
    key is NULL — comparisons under ``np.unique`` would be undefined;
    the distributed path's joins drop them consistently instead."""
    import numpy as np

    node_dt = nodes.schema["node"].dataType
    npd = nodes.toPandas()["node"]
    ep = edges.toPandas()
    if npd.isna().any() or ep["src"].isna().any() or ep["dst"].isna().any():
        return None
    nv = npd.to_numpy()
    uniq, codes = np.unique(
        np.concatenate([nv, ep["src"].to_numpy(), ep["dst"].to_numpy()]),
        return_inverse=True,
    )
    nn, ne = len(nv), len(ep)
    cs, cd = codes[nn:nn + ne], codes[nn + ne:]
    outdeg = np.bincount(cs, minlength=len(uniq)).astype(np.float64)
    if seeds is None:
        flag = np.ones(len(uniq), dtype=np.float64)
    else:
        sp = seeds.toPandas()["node"]
        if sp.isna().any():
            return None
        flag = np.isin(uniq, sp.to_numpy()).astype(np.float64)
    r = flag.copy()
    for _ in range(max_iter):
        contrib = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(contrib, cd, r[cs] / outdeg[cs])
        r = alpha * flag + (1 - alpha) * contrib
    node_codes = codes[:nn]
    out = pd.DataFrame({"node": uniq[node_codes], "rank": r[node_codes]})
    schema = T.StructType(
        [T.StructField("node", node_dt), T.StructField("rank", T.DoubleType())]
    )
    return spark.createDataFrame(out, schema=schema)


def pagerank(
    edges: DataFrame,
    alpha: float = 0.1,
    max_iter: int = 15,
    local_threshold: int = 1 << 20,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """Power iteration PageRank: rank = alpha·s + (1-alpha)·Σ rank/out_deg,
    where the teleport indicator ``s`` is 1 everywhere (classic, the
    default) or 1 only on ``seeds`` (a DataFrame with a ``node``
    column) — personalized PageRank, rank mass flowing out from the
    seed set along dependency edges (the standard seed-expansion shape
    for data selection: score everything by proximity to a trusted
    set). With ``seeds=None`` the recurrence and results are identical
    to the classic form.

    The reference's PageRankBasedResolver uses JUNG's PageRank with
    alpha=0.1 (PageRankBasedResolver.java:44-85); same recurrence here,
    one join+aggregate per iteration, lineage cut each round. The edge
    list and out-degree table are materialized once up front (lazy
    localCheckpoint) — every iteration joins them, and without the cut
    an expensive upstream (e.g. the codegraph dependency extraction)
    would re-execute max_iter times.

    Sub-threshold graphs take a driver-side numpy power iteration
    instead (same size-vs-strategy policy as
    :func:`connected_components`, which pays several fixed-overhead
    jobs per round ×  max_iter here — ~30 jobs for a 100-node repo
    graph). The probe reuses the already-materialized node set plus one
    edge count; ``local_threshold=0`` forces the distributed path (the
    scale tests do).
    """
    spark = edges.sparkSession
    edges = edges.select("src", "dst").localCheckpoint(eager=False)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    if seeds is not None:
        seeds = seeds.select("node").distinct().localCheckpoint(eager=False)
    if local_threshold and nodes.count() <= local_threshold:
        if nodes.count() + edges.count() <= local_threshold:
            local = _pagerank_local(spark, nodes, edges, alpha, max_iter, seeds)
            if local is not None:
                return local
    out_deg = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.count("*").alias("out_deg"))
        .localCheckpoint(eager=False)
    )
    if seeds is None:
        flagged = nodes.withColumn("flag", F.lit(1.0))
    else:
        flagged = (
            nodes.join(seeds.withColumn("f", F.lit(1.0)), "node", "left")
            .select("node", F.coalesce("f", F.lit(0.0)).alias("flag"))
            .localCheckpoint()
        )
    ranks = flagged.select("node", F.col("flag").alias("rank"))
    for _ in range(max_iter):
        contrib = (
            edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(out_deg.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("out_deg")).alias("inflow"))
        )
        ranks = (
            flagged.join(contrib, "node", "left")
            .fillna(0.0, subset=["inflow"])
            .select(
                "node",
                (
                    F.lit(alpha) * F.col("flag")
                    + F.lit(1 - alpha) * F.col("inflow")
                ).alias("rank"),
            )
            # eager on purpose: measured against eager=False (one action
            # over 15 chained shuffles), per-iteration materialization is
            # ~2x faster here — the deep lazy chain defeats AQE's
            # stage-by-stage sizing and pays it back with interest
            .localCheckpoint()
        )
    return ranks


def hits(edges: DataFrame, max_iter: int = 10, checkpoint: bool = True) -> DataFrame:
    """HITS hubs/authorities (HubBasedResolver.java:43-86 et al.):
    a = Σ_in h; h = Σ_out a; L2-normalized per iteration.

    The per-iteration L2 norms are scalar aggregates broadcast back
    onto the score table — a ``sum() over (partition by lit(1))``
    window here would funnel the whole node table through ONE partition
    every iteration, the exact single-partition exchange this module
    exists to avoid (this is the corpus-scale building block; per-doc
    graphs use numpy in :mod:`linking`). ``checkpoint=False`` skips the
    per-iteration lineage cuts so tests can audit the full plan; real
    runs keep it on or the plan tree grows exponentially."""
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    scores = nodes.withColumn("hub", F.lit(1.0)).withColumn("auth", F.lit(1.0))
    for _ in range(max_iter):
        auth = (
            edges.join(scores.select(F.col("node").alias("src"), "hub"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("auth_raw"))
        )
        hub = (
            edges.join(auth.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("auth_raw").alias("hub_raw"))
        )
        raw = (
            nodes.join(auth, "node", "left")
            .join(hub, "node", "left")
            .fillna(0.0)
        )
        if checkpoint:
            # consumed by both the norm agg and the normalize select —
            # cut once so the two joins don't run twice per iteration
            raw = raw.localCheckpoint()
        norms = raw.agg(
            F.sqrt(F.sum(F.col("hub_raw") ** 2)).alias("_hub_norm"),
            F.sqrt(F.sum(F.col("auth_raw") ** 2)).alias("_auth_norm"),
        )
        scores = raw.crossJoin(F.broadcast(norms)).select(
            "node",
            (F.col("hub_raw") / F.col("_hub_norm")).alias("hub"),
            (F.col("auth_raw") / F.col("_auth_norm")).alias("auth"),
        )
        if checkpoint:
            scores = scores.localCheckpoint()
    return scores


def _scc_local(spark, nodes: DataFrame, edges: DataFrame) -> DataFrame | None:
    """Driver-side iterative Tarjan for sub-threshold graphs, over
    factorized node codes (explicit stack — no recursion limit).
    Returns (node, scc) with scc = min member id, or None on NULL keys
    (same guard as the other local gates)."""
    import numpy as np

    node_dt = nodes.schema["node"].dataType
    npd = nodes.toPandas()["node"]
    ep = edges.toPandas()
    if npd.isna().any() or ep["src"].isna().any() or ep["dst"].isna().any():
        return None
    nv = npd.to_numpy()
    uniq, codes = np.unique(
        np.concatenate([nv, ep["src"].to_numpy(), ep["dst"].to_numpy()]),
        return_inverse=True,
    )
    nn, ne = len(nv), len(ep)
    cs, cd = codes[nn:nn + ne], codes[nn + ne:]
    n = len(uniq)
    adj: list[list[int]] = [[] for _ in range(n)]
    for u, v in zip(cs.tolist(), cd.tolist()):
        adj[u].append(v)

    UNVISITED = -1
    index = [UNVISITED] * n
    low = [0] * n
    on_stack = [False] * n
    stack: list[int] = []
    comp = [UNVISITED] * n
    counter = 0
    for start in range(n):
        if index[start] != UNVISITED:
            continue
        # iterative Tarjan: work entries are (v, child-iterator index)
        work = [(start, 0)]
        while work:
            v, ci = work[-1]
            if ci == 0:
                index[v] = low[v] = counter
                counter += 1
                stack.append(v)
                on_stack[v] = True
            advanced = False
            for i in range(ci, len(adj[v])):
                w = adj[v][i]
                if index[w] == UNVISITED:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    advanced = True
                    break
                if on_stack[w]:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            if low[v] == index[v]:
                members = []
                while True:
                    w = stack.pop()
                    on_stack[w] = False
                    members.append(w)
                    if w == v:
                        break
                root = min(members)  # codes sort like values (np.unique)
                for w in members:
                    comp[w] = root
            work.pop()
            if work:
                pv, _ = work[-1]
                low[pv] = min(low[pv], low[v])
    node_codes = codes[:nn]
    comp_arr = np.asarray(comp, dtype=np.int64)
    out = pd.DataFrame({"node": nv, "scc": uniq[comp_arr[node_codes]]})
    schema = T.StructType(
        [T.StructField("node", node_dt), T.StructField("scc", node_dt)]
    )
    return spark.createDataFrame(out, schema=schema)


def _fixpoint_fingerprint(df: DataFrame, *cols: str) -> int:
    row = df.agg(
        F.count("*").alias("n"),
        # decimal(38) accumulator: a sum of 64-bit hashes overflows long
        # under ANSI arithmetic (same fix as _edge_fingerprint)
        F.coalesce(
            F.sum(
                F.xxhash64(*[F.col(c) for c in cols]).cast("decimal(38,0)")
            ),
            F.lit(0),
        ).alias("h"),
    ).first()
    return hash((int(row["n"]), int(row["h"])))


def strongly_connected(
    edges: DataFrame,
    max_phases: int = 30,
    max_rounds: int = 200,
    local_threshold: int = 1 << 20,
) -> DataFrame:
    """(node, scc) with scc = min node id of the strongly connected
    component — directed-cycle structure (A depends on B depends on A),
    which undirected :func:`connected_components` cannot see.

    Distributed path: the classic coloring SCC decomposition (Orzan's
    FB/coloring scheme, the standard Pregel formulation). Each phase
    (1) propagates min node ids FORWARD to a fixpoint — ``color(v)`` =
    the smallest node that reaches v, so every color class has exactly
    one root r with color(r)=r — then (2) grows the flagged set
    BACKWARD from each root along edges whose endpoints share the
    color (provably sufficient: every vertex on a return path of an
    SCC member shares the root's color), which carves exactly SCC(r)
    for every root simultaneously; carved nodes and their edges leave
    the graph and the next phase repeats on the rest. ≥1 SCC per color
    class is removed per phase, so phases are bounded by the SCC-DAG
    depth; inner fixpoints are bounded by reachability diameter, with
    (count, hash-sum) fingerprints and a hard ``max_rounds`` raise —
    never a silent partial answer. Every round is equi-joins +
    grouped mins with a lineage cut, n-way parallel.

    Sub-threshold graphs take a driver-side iterative Tarjan instead
    (same gate policy as the other graph operators; differential tests
    pin local == distributed on random digraphs)."""
    spark = edges.sparkSession
    base = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    if local_threshold and nodes.count() <= local_threshold:
        if nodes.count() + base.count() <= local_threshold:
            local = _scc_local(spark, nodes, base)
            if local is not None:
                return local

    assigned_parts: list[DataFrame] = []
    active = nodes
    e = base
    for _phase in range(max_phases):
        if e.isEmpty():
            break
        # (1) forward min-label coloring to fixpoint
        color = active.withColumn("color", F.col("node")).localCheckpoint()
        fp = _fixpoint_fingerprint(color, "node", "color")
        for _r in range(max_rounds):
            inflow = (
                e.join(
                    color.select(
                        F.col("node").alias("src"), F.col("color").alias("c_src")
                    ),
                    "src",
                )
                .groupBy(F.col("dst").alias("node"))
                .agg(F.min("c_src").alias("cin"))
            )
            color = (
                color.join(inflow, "node", "left")
                .select(
                    "node",
                    F.least(
                        F.col("color"), F.coalesce("cin", F.col("color"))
                    ).alias("color"),
                )
                .localCheckpoint()
            )
            new_fp = _fixpoint_fingerprint(color, "node", "color")
            if new_fp == fp:
                break
            fp = new_fp
        else:
            raise RuntimeError(
                f"strongly_connected coloring did not converge in "
                f"{max_rounds} rounds — raise max_rounds"
            )
        # (2) backward carve within color, starting at the roots
        grown = (
            color.filter(F.col("color") == F.col("node"))
            .select("node", "color")
            .localCheckpoint()
        )
        n_grown = grown.count()
        for _r in range(max_rounds):
            add = (
                e.join(
                    grown.select(
                        F.col("node").alias("dst"), F.col("color").alias("fc")
                    ),
                    "dst",
                )
                .join(
                    color.select(
                        F.col("node").alias("src"), F.col("color").alias("c_src")
                    ),
                    "src",
                )
                .filter(F.col("c_src") == F.col("fc"))
                .select(F.col("src").alias("node"), F.col("c_src").alias("color"))
            )
            grown = grown.unionByName(add).distinct().localCheckpoint()
            new_n = grown.count()
            if new_n == n_grown:
                break
            n_grown = new_n
        else:
            raise RuntimeError(
                f"strongly_connected carve did not converge in "
                f"{max_rounds} rounds — raise max_rounds"
            )
        assigned_parts.append(grown.select("node", F.col("color").alias("scc")))
        carved = grown.select("node").localCheckpoint()
        active = active.join(carved, "node", "left_anti").localCheckpoint()
        e = (
            e.join(carved.select(F.col("node").alias("src")), "src", "left_anti")
            .join(carved.select(F.col("node").alias("dst")), "dst", "left_anti")
            .localCheckpoint()
        )
    else:
        raise RuntimeError(
            f"strongly_connected did not finish in {max_phases} phases — "
            f"raise max_phases"
        )
    # edge-free leftovers are singleton SCCs
    assigned_parts.append(active.select("node", F.col("node").alias("scc")))
    out = assigned_parts[0]
    for part in assigned_parts[1:]:
        out = out.unionByName(part)
    return out
