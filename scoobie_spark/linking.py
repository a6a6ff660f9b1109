"""Instance resolution + connected-component disambiguation.

SURVEY.md §2 B15-B21. Reference flow per document
(``transducer/InstanceRecognition.java:60-169``,
``transducer/EntityDisambiguation.java:73-152``):

1. mentions → candidate subjects via the ``symbols`` fact table on
   (predicate, literal) — ONE corpus-wide shuffle join here instead of
   per-document ``(p,l) IN (...)`` SQL (PostgresKB.java:210-247).
2. per-document bipartite graph: literal nodes (−lit_id) ↔ candidate
   subject nodes, edges grouped by lowercased surface phrase
   (EntityDisambiguation.splitLiteralComponents:383-407).
3. weak connected components = "ambiguity sets".
4. doc graph enrichment from the KB: outgoing relations of unambiguous
   subjects (skipping rdf:type, traverseForward:437-465), incoming
   relations of ambiguous ones (traverseBackward:409-435) — re-expressed
   as two corpus-wide joins against ``relations`` instead of the
   reference's per-document rank-ordered growth loop (the loop exists
   only to bound per-doc graph size; the batch form touches each
   relation row once).
5. prune intermediate nodes with degree ≤ 1
   (EntityDisambiguation.pruneGraph:158-172).
6. degree resolver: per ambiguous component keep the max-degree subject
   (DegreeBasedResolver.java:41-79; reference tie-break is HashSet
   iteration order — we use min subject id for determinism), losers'
   annotations removed (EntityDisambiguation.resolve:179-218 keeps a
   single winner).

Physical notes: components are computed per document with a pandas
union-find (a document's mention graph is tens of nodes — a cluster-wide
iterative algorithm per doc would be absurd); the corpus-level
distributed CC operator lives in :mod:`scoobie_spark.graph` and is used
for cross-document URI canonicalization instead.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .kb.model import KB

CANDIDATES_SCHEMA = (
    "doc_id long, begin int, end int, lit_id long, prop_id long, "
    "belief double, literal string, surface string, subject long"
)
_CAND_COLS = [
    "doc_id", "begin", "end", "lit_id", "prop_id",
    "belief", "literal", "surface", "subject",
]


def _subject_beliefs(kb: KB) -> DataFrame:
    """(prop_id, lit_id, subject, belief): per-SUBJECT symbol beliefs —
    the shared join dimension of resolve_instances (staged) and
    spot_resolve (fused); one definition so a belief-semantics change
    can never drift the two physical paths apart."""
    return (
        kb.symbols.groupBy(
            F.col("p").alias("prop_id"),
            F.col("lit").alias("lit_id"),
            F.col("s").alias("subject"),
        )
        .agg(F.max("belief").alias("belief"))
    )


def resolve_instances(mentions: DataFrame, kb: KB) -> DataFrame:
    """B15: mention × symbols equi-join on (prop_id, lit_id) → candidate
    subjects (possibly several per mention — that's the ambiguity).
    The candidate's ``belief`` is the per-SUBJECT symbol belief, not the
    span's gazetteer confidence (which is the max over subjects)."""
    return mentions.drop("belief").join(_subject_beliefs(kb), ["prop_id", "lit_id"])


def subject_types(candidates: DataFrame, kb: KB) -> DataFrame:
    """B15 tail: rdf:type objects of candidate subjects
    (PostgresKB.getRDFTypesForInstances:629-660) → (subject, type_id)."""
    type_id = kb.rdf_type_id
    if type_id is None:
        return candidates.sparkSession.createDataFrame([], "subject long, type_id long")
    types = kb.relations.filter(F.col("p") == type_id).select(
        F.col("s").alias("subject"), F.col("o").alias("type_id")
    )
    return candidates.select("subject").distinct().join(types, "subject").distinct()


_COMP_SCHEMA = "doc_id long, node long, component long"


def _components_per_doc(pdf: pd.DataFrame) -> pd.DataFrame:
    """Union-find over one document's bipartite edges (src<0 literal,
    dst>0 subject). Component label = min node id in the set."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        for n in (a, b):
            if n not in parent:
                parent[n] = n
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for src, dst in zip(pdf["src"].values, pdf["dst"].values):
        union(int(src), int(dst))

    nodes = list(parent)
    doc = pdf["doc_id"].iloc[0]
    return pd.DataFrame(
        {
            "doc_id": [doc] * len(nodes),
            "node": nodes,
            "component": [find(n) for n in nodes],
        }
    )


def literal_edges(candidates: DataFrame) -> DataFrame:
    """B16: bipartite edges. The reference connects each subject to every
    literal id sharing its *lowercased surface phrase*
    (populateGraphWithLiterals:73-99 via componentLiterals) — so two
    different literals with the same lowercased surface coalesce."""
    spans = candidates.select(
        "doc_id", F.lower("surface").alias("phrase"), "lit_id", "subject"
    ).distinct()
    phrase_lits = spans.select("doc_id", "phrase", "lit_id").distinct()
    phrase_subj = spans.select("doc_id", "phrase", "subject").distinct()
    # Literal node id = -(lit_id + 1): the reference uses -literalIndex
    # (EntityDisambiguation.java:231-241) which silently collides with
    # subject 0 when dictionary ids start at 0 — the +1 shift keeps the
    # bipartite node spaces disjoint for every id.
    return (
        phrase_subj.join(phrase_lits, ["doc_id", "phrase"])
        .select(
            "doc_id",
            (-(F.col("lit_id") + 1)).alias("src"),
            F.col("subject").alias("dst"),
        )
        .distinct()
    )


def components(edges: DataFrame) -> DataFrame:
    """B17: weak CC per document (JUNG WeakComponentClusterer,
    EntityDisambiguation.java:370-374) → (doc_id, node, component).
    Batched via :func:`grouped.grouped_apply` — one Arrow batch holds
    MANY complete documents, avoiding the per-tiny-group Arrow tax of
    plain ``groupBy().applyInPandas`` (grouped.py header numbers)."""
    from .grouped import grouped_apply

    def batch(pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(pdf):
            return pd.DataFrame({"doc_id": [], "node": [], "component": []})
        import numpy as np

        doc = pdf["doc_id"].values
        bounds = np.flatnonzero(np.r_[True, doc[1:] != doc[:-1], True])
        frames = [
            _components_per_doc(pdf.iloc[bounds[k]:bounds[k + 1]])
            for k in range(len(bounds) - 1)
        ]
        return pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]

    return grouped_apply(
        edges.select("doc_id", "src", "dst"), "doc_id", batch, _COMP_SCHEMA,
        batch_mode=True,
    )


def _resolve_one(
    phrases: list,
    lit_nodes: list,
    subjects_arr: list,
    e_src: list,
    e_dst: list,
    e_dir: list,
    e_anchor: list,
    resolver: str,
) -> set[int]:
    """One document's B16-B21 over plain python/numpy arrays → the set
    of LOSER subjects to drop. A document's mention graph is tens of
    nodes, so per-doc python beats a dozen cluster-wide shuffles."""
    import numpy as np

    # B16 — bipartite edges grouped by lowercased surface phrase
    phrase_lits: dict[str, set[int]] = {}
    phrase_subj: dict[str, set[int]] = {}
    for ph, ln, sj in zip(phrases, lit_nodes, subjects_arr):
        phrase_lits.setdefault(ph, set()).add(ln)
        phrase_subj.setdefault(ph, set()).add(sj)
    bip_edges = [
        (ln, sj)
        for ph, subs in phrase_subj.items()
        for sj in subs
        for ln in phrase_lits[ph]
    ]

    # B17 — union-find
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in bip_edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    subjects = sorted(set(subjects_arr))
    comp_subjects: dict[int, list[int]] = {}
    for s in subjects:
        comp_subjects.setdefault(find(s), []).append(s)
    ambiguous_subjects = {s for ss in comp_subjects.values() if len(ss) > 1 for s in ss}
    if not ambiguous_subjects:
        return set()

    # B18 — doc graph: literal edges + forward edges of unambiguous
    # anchors + backward edges into ambiguous anchors
    # (traverseForward/Backward, EntityDisambiguation.java:409-465)
    graph_edges = list(bip_edges)
    if e_src:
        subj_set = set(subjects)
        kept = set()
        for a, b, d, anc in zip(e_src, e_dst, e_dir, e_anchor):
            # anchor guard: in the fused spot+link stage the edge fetch
            # ran on PRE-filter candidates; edges anchored at a subject
            # the span filters removed must not influence scores
            if anc in subj_set and ((d == "f") != (anc in ambiguous_subjects)):
                kept.add((a, b))
        # B19 — prune intermediates (non-candidate, non-literal) deg ≤ 1
        deg_map: dict[int, int] = {}
        for a, b in kept:
            deg_map[a] = deg_map.get(a, 0) + 1
            deg_map[b] = deg_map.get(b, 0) + 1
        graph_edges.extend(
            (a, b)
            for a, b in kept
            if (a in subj_set or a < 0 or deg_map[a] >= 2)
            and (b in subj_set or b < 0 or deg_map[b] >= 2)
        )

    # B20 — resolver scores over the doc graph
    in_deg: dict[int, int] = {}
    out_deg: dict[int, int] = {}
    for a, b in graph_edges:
        out_deg[a] = out_deg.get(a, 0) + 1
        in_deg[b] = in_deg.get(b, 0) + 1

    if resolver == "degree":  # production default (Scoobie.java:97-98)
        score = {s: in_deg.get(s, 0) + out_deg.get(s, 0) for s in subjects}
    elif resolver == "flow":  # min(in, out) (FlowBasedResolver.java:41-80)
        score = {s: min(in_deg.get(s, 0), out_deg.get(s, 0)) for s in subjects}
    elif resolver == "random":
        # RandomResolver.java:55-70 draws `new Random().nextInt` — out of
        # parity scope (non-deterministic); behind this flag we keep the
        # "uniform over candidates" semantics but derive the draw from a
        # splitmix64 of the subject id so reruns are reproducible
        def _splitmix64(x: int) -> int:
            x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
            x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
            x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
            return x ^ (x >> 31)

        score = {s: _splitmix64(s) for s in subjects}
    elif resolver in ("pagerank", "hub", "authority", "hits", "hits2"):
        nodes = sorted({n for e in graph_edges for n in e})
        idx = {n: i for i, n in enumerate(nodes)}
        adj = np.zeros((len(nodes), len(nodes)), dtype=np.float64)
        for a, b in graph_edges:
            adj[idx[a], idx[b]] = 1.0
        if resolver == "pagerank":  # alpha=0.1 (PageRankBasedResolver.java:44-85)
            outs = np.maximum(adj.sum(axis=1), 1.0)
            r = np.ones(len(nodes))
            for _ in range(15):
                r = 0.1 + 0.9 * (adj.T @ (r / outs))
            vals = r
        else:  # HITS family (Hub/Authority/Hits/Hits2BasedResolver)
            h = np.ones(len(nodes))
            a_s = np.ones(len(nodes))
            for _ in range(10):
                a_s = adj.T @ h
                a_s /= max(np.linalg.norm(a_s), 1e-12)
                h = adj @ a_s
                h /= max(np.linalg.norm(h), 1e-12)
            if resolver == "hub":
                vals = h
            elif resolver == "authority":
                vals = a_s
            elif resolver == "hits":  # h×a (HitsBasedResolver.java:55-66)
                vals = h * a_s
            else:  # hits2: h+a (Hits2BasedResolver.java:54-65)
                vals = h + a_s
        score = {s: float(vals[idx[s]]) if s in idx else 0.0 for s in subjects}
    else:
        raise ValueError(f"unknown resolver: {resolver}")

    # winner per ambiguous component: max score, tie → min subject id
    # (reference keeps a single argmax, EntityDisambiguation.resolve:179-218)
    losers: set[int] = set()
    for ss in comp_subjects.values():
        if len(ss) > 1:
            winner = max(ss, key=lambda s: (score.get(s, 0), -s))
            losers.update(s for s in ss if s != winner)
    return losers


def _resolve_doc(cand: pd.DataFrame, edges: pd.DataFrame) -> pd.DataFrame:
    """Batch form: cand/edges hold MANY complete documents (sorted by
    doc_id). Per-doc slices feed :func:`_resolve_one`; only the loser
    rows are dropped."""
    import numpy as np

    if len(cand) == 0:
        return cand.iloc[0:0].drop(columns=["__resolver"], errors="ignore").reindex(
            columns=_CAND_COLS
        )
    resolver = cand["__resolver"].iloc[0]
    cand = cand.drop(columns=["__resolver"])
    # the staged disambiguate() cogroup pads these with nulls on the
    # edge rows, widening them to float64 in any batch that carries
    # edges — restore ints so the returned frame matches the int
    # CANDIDATES_SCHEMA without relying on Spark's unsafe float→int
    # Arrow cast (convertToArrowArraySafely=true would reject it). The
    # fused path restores upstream, so this is a no-op there.
    restore = {
        c: cand[c].astype("int64")
        for c in ("begin", "end", "lit_id", "prop_id", "subject")
        if cand[c].dtype != np.int64
    }
    if restore:
        cand = cand.assign(**restore)

    doc = cand["doc_id"].values
    phrases = cand["surface"].str.lower().values
    lit_nodes = (-(cand["lit_id"].astype("int64") + 1)).values
    subjects = cand["subject"].values.astype("int64")

    e_doc = edges["doc_id"].values if len(edges) else np.array([], dtype="int64")
    e_src = edges["src"].values if len(edges) else []
    e_dst = edges["dst"].values if len(edges) else []
    e_dir = edges["dir"].values if len(edges) else []
    e_anc = edges["anchor"].values if len(edges) else []

    # batch-vectorized B16-B21 for the production resolvers; per-doc
    # numpy fallback (ambiguous docs only) for the eigenvector family
    from . import resolve_batch as rb

    st = rb.analyze(doc, phrases, lit_nodes, subjects)
    if not st.amb_any:
        return cand[_CAND_COLS]
    if resolver in rb.VECTOR_RESOLVERS:
        loser = rb.losers(
            st,
            resolver,
            rb.map_doc_codes(st, e_doc),
            np.asarray(e_src, dtype=np.int64),
            np.asarray(e_dst, dtype=np.int64),
            np.asarray(e_dir == "f") if len(edges) else np.array([], dtype=bool),
            np.asarray(e_anc, dtype=np.int64),
        )
        return cand[~loser[st.row_pair]][_CAND_COLS]

    keep = np.ones(len(cand), dtype=bool)
    # per-doc slices: cand sorted by doc_id; edges located via searchsorted
    c_bounds = np.flatnonzero(np.r_[True, doc[1:] != doc[:-1], True])
    e_sorted = np.argsort(e_doc, kind="stable") if len(edges) else None
    e_doc_sorted = e_doc[e_sorted] if len(edges) else e_doc
    for k in range(len(c_bounds) - 1):
        i0, i1 = c_bounds[k], c_bounds[k + 1]
        if not st.doc_amb[st.d_codes[i0]]:
            continue
        d = doc[i0]
        if len(edges):
            j0, j1 = np.searchsorted(e_doc_sorted, d, "left"), np.searchsorted(
                e_doc_sorted, d, "right"
            )
            sel = e_sorted[j0:j1]
            es, ed_, edir, eanc = (
                e_src[sel].tolist(),
                e_dst[sel].tolist(),
                e_dir[sel].tolist(),
                e_anc[sel].tolist(),
            )
        else:
            es = ed_ = edir = eanc = []
        losers = _resolve_one(
            phrases[i0:i1].tolist(),
            lit_nodes[i0:i1].tolist(),
            subjects[i0:i1].tolist(),
            es,
            ed_,
            edir,
            eanc,
            resolver,
        )
        if losers:
            for i in range(i0, i1):
                if subjects[i] in losers:
                    keep[i] = False
    # column order must match CANDIDATES_SCHEMA positionally (the fused
    # path's join reorders columns; Arrow return is positional)
    return cand[keep][_CAND_COLS]


def expansion_edges(candidates: DataFrame, kb: KB) -> DataFrame:
    """B18 join half: per doc, outgoing relations of every candidate
    subject (dir='f', skipping rdf:type like traverseForward:437-465)
    and incoming relations of every candidate subject (dir='b'). The
    per-doc ambiguity filter happens inside :func:`_resolve_doc` —
    fetching the superset keeps this a pair of plain equi-joins."""
    type_id = kb.rdf_type_id
    rel = kb.relations if type_id is None else kb.relations.filter(F.col("p") != type_id)
    # distinct (s, o) BEFORE the corpus join: m parallel predicates
    # between two subjects would otherwise ship m identical edge rows
    # per mentioning document through the doc_id shuffle, only for
    # _resolve_one's `kept` set to discard the copies; the broadcast
    # twin (kb_adjacency) already dedupes the same way. KB-side
    # distinct amortizes across every document.
    rel = rel.select("s", "o").distinct()
    cand_subj = candidates.select("doc_id", "subject").distinct()
    fwd = (
        cand_subj.join(rel, cand_subj.subject == rel.s)
        .select(
            F.col("doc_id").alias("e_doc_id"),
            F.col("s").alias("src"),
            F.col("o").alias("dst"),
            F.lit("f").alias("dir"),
            F.col("subject").alias("anchor"),
        )
    )
    bwd = (
        cand_subj.join(rel, cand_subj.subject == rel.o)
        .select(
            F.col("doc_id").alias("e_doc_id"),
            F.col("s").alias("src"),
            F.col("o").alias("dst"),
            F.lit("b").alias("dir"),
            F.col("subject").alias("anchor"),
        )
    )
    return fwd.unionByName(bwd)


def _filter_resolve_doc(cand: pd.DataFrame, edges: pd.DataFrame) -> pd.DataFrame:
    """Fused B10-B12 + B16-B21 batch: span filters first (spotting
    semantics, including the both-case-hash dedupe), then per-doc
    disambiguation — one Arrow stage, one shuffle."""
    from .spotting import _filter_batch

    if len(cand):
        resolver = cand["__resolver"].iloc[0]
        # the cogroup union pads these with nulls on the right side, so
        # pandas widened them to float64 — restore ints (left rows have
        # no nulls by construction)
        cand = cand.assign(
            begin=cand["begin"].astype("int64"),
            end=cand["end"].astype("int64"),
            lit_id=cand["lit_id"].astype("int64"),
            prop_id=cand["prop_id"].astype("int64"),
            subject=cand["subject"].astype("int64"),
        )
        cand = _filter_batch(cand.drop(columns=["__resolver"]))
        if "__typed_ok" in cand.columns:
            # template type filter: applied AFTER the span filters (so
            # B10/B11 saw every span), BEFORE resolution — staged order.
            # The cogroup union widened the 0/1 mark to float64.
            cand = cand[cand["__typed_ok"].values == 1].drop(columns=["__typed_ok"])
        cand = cand.assign(__resolver=resolver)
    elif "__typed_ok" in cand.columns:
        cand = cand.drop(columns=["__typed_ok"])
    return _resolve_doc(cand, edges)


def _make_filter_resolve_adj(adj_or_bc):
    """Batch fn for the broadcast-adjacency fused stage: like
    :func:`_filter_resolve_doc` but synthesizes each document's
    expansion-edge arrays from the broadcast per-subject adjacency
    instead of receiving shuffled edge rows. ``adj_or_bc`` is the
    {subject: ((src, dst, dir), ...)} map, either plain or wrapped in a
    ``sc.broadcast`` handle (preferred: the torrent-distributed blob
    ships once per executor instead of riding every task's closure)."""
    import numpy as np

    from .spotting import _filter_batch

    def fn(cand: pd.DataFrame) -> pd.DataFrame:
        adj = adj_or_bc.value if hasattr(adj_or_bc, "value") else adj_or_bc
        if not len(cand):
            return cand.iloc[0:0].drop(
                columns=["__resolver", "tile_ok"], errors="ignore"
            ).reindex(columns=_CAND_COLS)
        resolver = cand["__resolver"].iloc[0]
        cand = _filter_batch(cand.drop(columns=["__resolver"]))
        if "__typed_ok" in cand.columns:
            # type filter after span filters, before resolution (staged
            # order) — see spot_resolve
            cand = cand[cand["__typed_ok"].values == 1].drop(columns=["__typed_ok"])
        if not len(cand):
            return cand.reindex(columns=_CAND_COLS)

        doc = cand["doc_id"].values
        phrases = cand["surface"].str.lower().values
        lit_nodes = (-(cand["lit_id"].astype("int64") + 1)).values
        subjects = cand["subject"].values.astype("int64")
        # batch-vectorized B16-B21 (resolve_batch.py): components +
        # ambiguity for the whole batch at once; the adjacency gather
        # runs only over ambiguous docs (the scalar loop built every
        # doc's edge lists before its early-exit — pure waste for the
        # unambiguous majority)
        from . import resolve_batch as rb

        st = rb.analyze(doc, phrases, lit_nodes, subjects)
        if not st.amb_any:
            return cand[_CAND_COLS]
        if resolver in rb.VECTOR_RESOLVERS:
            arrs = rb.adjacency_arrays(adj)
            loser = rb.losers(st, resolver, *rb.gather_adjacency(st, arrs))
            return cand[~loser[st.row_pair]][_CAND_COLS]
        # eigenvector family (pagerank/HITS): per-doc numpy path,
        # restricted to the ambiguous docs
        keep = np.ones(len(cand), dtype=bool)
        c_bounds = np.flatnonzero(np.r_[True, doc[1:] != doc[:-1], True])
        for k in range(len(c_bounds) - 1):
            i0, i1 = c_bounds[k], c_bounds[k + 1]
            if not st.doc_amb[st.d_codes[i0]]:
                continue
            es, ed_, edir, eanc = [], [], [], []
            for s in set(subjects[i0:i1].tolist()):
                for a, b, d in adj.get(s, ()):
                    es.append(a)
                    ed_.append(b)
                    edir.append(d)
                    eanc.append(s)
            losers = _resolve_one(
                phrases[i0:i1].tolist(),
                lit_nodes[i0:i1].tolist(),
                subjects[i0:i1].tolist(),
                es,
                ed_,
                edir,
                eanc,
                resolver,
            )
            if losers:
                for i in range(i0, i1):
                    if subjects[i] in losers:
                        keep[i] = False
        return cand[keep][_CAND_COLS]

    return fn


def kb_adjacency(
    kb: KB, max_rows: int | None = 240_000, max_bytes: int = 64 << 20
) -> dict | None:
    """Collect the non-rdf:type relation rows as a per-subject adjacency
    map {subject: ((src, dst, dir), ...)} with one entry under EACH
    endpoint (dir='f' under the subject side, 'b' under the object
    side) — the broadcast twin of :func:`expansion_edges`.

    Returns None when the KB graph exceeds ``max_rows`` OR the
    estimated in-memory size exceeds ``max_bytes`` (~64MB, the same
    order as autoBroadcastJoinThreshold — broadcasting a multi-GB
    Python adjacency would cost cores × GBs of worker RSS). The two
    defaults are coherent: 240k edges × ~260 B ≈ 62 MB, so raising
    ``max_rows`` alone past ~258k is a no-op without also raising
    ``max_bytes``. The caller
    falls back to the edge-join path; at DBpedia's ~10^8 relations the
    fallback always triggers, while bounded domain KBs get the
    shuffle-free path. The edge list arrives via ONE Arrow ``toPandas``
    transfer (not a row-at-a-time ``toLocalIterator``)."""
    type_id = kb.rdf_type_id
    rel = kb.relations if type_id is None else kb.relations.filter(F.col("p") != type_id)
    # single job: pull at most row_cap+1 distinct edges — an overflow
    # row proves the KB exceeds the cap without a separate count probe.
    # max_rows=None still bounds the probe via max_bytes (260 B per
    # edge): the byte guard must reject BEFORE the driver collects an
    # unbounded edge set, not after.
    row_cap = max_rows if max_rows is not None else max_bytes // 260
    probe = rel.select("s", "o").distinct().limit(row_cap + 1)
    pdf = probe.toPandas()
    if len(pdf) > row_cap:
        return None
    # ~130 B per directed entry (3-int tuple inside a list under a dict
    # slot); each edge creates two entries
    if len(pdf) * 2 * 130 > max_bytes:
        return None
    adj: dict[int, list] = {}
    for s, o in zip(pdf["s"].tolist(), pdf["o"].tolist()):
        adj.setdefault(s, []).append((s, o, "f"))
        adj.setdefault(o, []).append((s, o, "b"))
    return {k: tuple(v) for k, v in adj.items()}


def kb_adjacency_broadcast(
    kb: KB, max_rows: int | None = 240_000, max_bytes: int = 64 << 20
):
    """Broadcast handle for :func:`kb_adjacency`, memoized on the KB.

    ``spot_resolve`` accepts either a plain dict (it wraps one ad hoc)
    or a Broadcast handle; callers that run the pipeline repeatedly over
    the same KB — streaming's per-micro-batch ``extract_triples`` above
    all — must pass the handle, or each call ships the blob again and
    leaves reclamation to the driver GC/ContextCleaner. Returns None
    when the KB graph exceeds the caps (edge-join fallback)."""
    cache_key = (max_rows, max_bytes)
    if cache_key not in kb._adj_bc:
        adj = kb_adjacency(kb, max_rows, max_bytes)
        kb._adj_bc[cache_key] = (
            None
            if adj is None
            else kb.relations.sparkSession.sparkContext.broadcast(adj)
        )
    return kb._adj_bc[cache_key]


def spot_resolve(
    candidates_raw: DataFrame,
    kb: KB,
    resolver: str = "degree",
    gazetteer: DataFrame | None = None,
    subject_filter: DataFrame | None = None,
    adjacency: dict | None = None,
) -> DataFrame:
    """Fused B8-B21: gazetteer join + symbols join (both broadcast-sized
    dims at KB-dictionary scale, sort-merge otherwise — Catalyst/AQE
    picks) stay narrow; then ONE doc_id shuffle feeds ONE cogrouped
    Arrow pass doing span filters + disambiguation.

    vs the staged path (spot → resolve_instances → disambiguate):
    one shuffle + one Arrow stage instead of two of each. The symbols
    join runs before the span filters, so candidate rows multiply by
    subject ambiguity slightly earlier — the filters only ever remove
    case-hash duplicates and contained spans, so the inflation window is
    one narrow stage, not a shuffle."""
    from .grouped import cogrouped_apply
    from .spotting import join_gazetteer

    raw = join_gazetteer(
        candidates_raw, gazetteer if gazetteer is not None else kb.gazetteer()
    )
    cand_subj = raw.drop("belief").join(_subject_beliefs(kb), ["prop_id", "lit_id"])
    if subject_filter is not None:
        # SPARQL-template rdf:type filter (O1) — MARK, don't semi-join:
        # the B10/B11 span filters inside the Arrow pass must see the
        # FULL mention set (staged order: spot → resolve → type filter →
        # disambiguate). Dropping untyped subjects here would let a
        # contained span survive whenever its container's subjects are
        # all filtered out — fused and staged would emit different
        # triples. The mark is applied inside the pass AFTER the span
        # filters, BEFORE graph resolution.
        marked = (
            subject_filter.select("subject").distinct().withColumn("__typed_ok", F.lit(1))
        )
        cand_subj = cand_subj.join(marked, "subject", "left").withColumn(
            "__typed_ok", F.coalesce("__typed_ok", F.lit(0))
        )
    tagged = cand_subj.withColumn("__resolver", F.lit(resolver))
    span_sort = [
        F.col("begin").asc(),
        F.col("end").desc(),
        F.col("prop_id").asc(),
        F.col("lit_id").asc(),
        F.col("subject").asc(),
    ]
    if adjacency is not None:
        # broadcast-adjacency form: the KB expansion edges never touch a
        # shuffle — each doc's edge set is rebuilt inside the Arrow pass
        # from the sc.broadcast adjacency (one torrent transfer per
        # executor, unpickled once per worker process)
        from .grouped import grouped_apply

        bc = (
            adjacency
            if hasattr(adjacency, "value")
            else candidates_raw.sparkSession.sparkContext.broadcast(adjacency)
        )
        return grouped_apply(
            tagged,
            "doc_id",
            _make_filter_resolve_adj(bc),
            CANDIDATES_SCHEMA,
            batch_mode=True,
            sort_cols=span_sort,
        )
    # expansion edges derive from the candidates that can actually
    # enter the disambiguation graph (staged parity: disambiguate sees
    # the post-type-filter table) — untyped subjects' edges would only
    # inflate the shuffle
    edge_src = (
        cand_subj.filter(F.col("__typed_ok") == 1)
        if subject_filter is not None
        else cand_subj
    )
    edges = expansion_edges(edge_src, kb)
    return cogrouped_apply(
        tagged,
        edges,
        "doc_id",
        "e_doc_id",
        _filter_resolve_doc,
        CANDIDATES_SCHEMA,
        batch_mode=True,
        left_sort_cols=span_sort,
    )


def disambiguate(candidates: DataFrame, kb: KB, resolver: str = "degree") -> DataFrame:
    """B16-B21 composed: returns the resolved candidate table (losing
    subjects of ambiguous components removed).

    Physical plan: two equi-joins against ``relations`` (the KB graph
    expansion) + ONE cogrouped Arrow stage doing all per-document graph
    work. resolver ∈ {degree, flow, pagerank, hub, authority, hits,
    hits2, random} — degree is the reference's production default
    (Scoobie.java:97-98); hits = h×a, hits2 = h+a; random is a
    deterministic stand-in for RandomResolver (non-parity flag). The
    classification resolver needs a trained model and per-subject type
    joins, so it lives in :func:`disambiguate_classification`."""
    from .grouped import cogrouped_apply

    edges = expansion_edges(candidates, kb)
    tagged = candidates.withColumn("__resolver", F.lit(resolver))
    return cogrouped_apply(
        tagged, edges, "doc_id", "e_doc_id", _resolve_doc, CANDIDATES_SCHEMA,
        batch_mode=True,
    )


def known_type_cluster(candidates: DataFrame, kb: KB, clusters: DataFrame) -> DataFrame:
    """Majority type cluster per candidate subject — the batch form of
    ``PostgresKB.getCluster`` (PostgresKB.java:807-850), delegating to
    :func:`scoobie_spark.facts.majority_cluster` (one implementation of
    the vote + min-cluster-id tie-break) → (subject, kcluster)."""
    from .facts import majority_cluster

    return majority_cluster(
        candidates.select("subject").distinct(), kb, clusters
    ).withColumnRenamed("cluster", "kcluster")


def disambiguate_classification(
    candidates: DataFrame,
    kb: KB,
    model,
    clusters: DataFrame,
    margin: float = 0.6,
) -> DataFrame:
    """B20 classification resolver
    (``ClassificationBasedResolver.java:44-105``): within each ambiguous
    component, keep the subjects whose *predicted* type clusters (B14
    maxent over the mention surface, margin-gated) contain the majority
    cluster of their *known* rdf:types; drop the rest.

    A component where classification abstains on every subject (no
    prediction survives the margin, or no known types) is left intact —
    the reference's removal guard (``resolvedSubjects.size() <
    subjects.size()``) compares a constant 2 against the candidate count
    and would annihilate whole 3+-subject components even when ham is
    empty; we keep losers only where at least one subject is positively
    confirmed.

    Physical plan: per-doc components via the union-find Arrow pass, one
    classify ``mapInPandas`` over distinct mention surfaces, then
    broadcast-joined verdicts + an anti-join — no per-row Python."""
    from .classify import classify_phrases

    comps = components(literal_edges(candidates))
    amb_comp = (
        comps.filter(F.col("node") >= 0)
        .groupBy("doc_id", "component")
        .agg(F.collect_set("node").alias("subs"))
        .filter(F.size("subs") > 1)
        .select("doc_id", "component", F.explode("subs").alias("subject"))
    )
    kcl = known_type_cluster(candidates, kb, clusters)
    preds = classify_phrases(
        # distinct: candidates carries one row per span per CANDIDATE
        # SUBJECT — without the dedup a span with k candidates runs
        # model inference k times on the identical phrase and the join
        # below multiplies k×k before its own distinct
        candidates.select(
            "doc_id", "begin", "end", F.col("surface").alias("phrase")
        ).distinct(),
        model,
        margin=margin,
    ).select("doc_id", "begin", "end", F.col("cls").alias("pred_cluster"))
    cand_pred = (
        candidates.join(preds, ["doc_id", "begin", "end"])
        .select("doc_id", "subject", "pred_cluster")
        .distinct()
    )
    ham = (
        amb_comp.join(kcl, "subject")
        .join(cand_pred, ["doc_id", "subject"])
        .filter(F.col("pred_cluster") == F.col("kcluster"))
        .select("doc_id", "component", "subject")
        .distinct()
    )
    losers = (
        amb_comp.join(
            ham.select("doc_id", "component").distinct(), ["doc_id", "component"]
        )
        .join(ham, ["doc_id", "component", "subject"], "left_anti")
        .select("doc_id", "subject")
    )
    return candidates.join(losers, ["doc_id", "subject"], "left_anti")


RDFS_LABEL_URI = "http://www.w3.org/2000/01/rdf-schema#label"


def canonicalize_by_label(
    kb: KB,
    threshold: float = 0.8,
    n: int = 2,
    label_props: list[int] | None = None,
) -> DataFrame:
    """URI canonicalization, min-hash half (north_rule: "canonicalize
    URIs via min-hash/sorted-key union-find"): subjects whose LABEL
    literals are MinHash-LSH near-duplicates (word n-gram Jaccard ≥
    threshold) collapse into one canonical id via the distributed
    star-contraction components.

    ``label_props`` restricts which datatype properties count as labels;
    by default the rdfs:label property id is auto-detected. This filter
    is load-bearing: matching over ALL datatype values would fuse
    unrelated subjects that merely share a birthdate/number/common
    string, and components would chain-merge whole groups. If the KB
    has no rdfs:label at all, every datatype property is used (the
    pre-round-2 behavior) — callers with such KBs should pass their
    naming properties explicitly.

    Returns (subject, canonical_id); subjects with no near-dup twin map
    to themselves. Compose with :func:`canonical_uri_map` (the
    sorted-key half) for string-normalization duplicates."""
    from .extras.dedup import minhash_lsh_pairs
    from .graph import connected_components

    if label_props is None:
        lbl = kb.uri_id(RDFS_LABEL_URI)
        label_props = [lbl] if lbl is not None else None
    sym = kb.symbols
    if label_props:
        sym = sym.filter(F.col("p").isin(*label_props))
    labels = (
        sym.join(kb.literals.withColumnRenamed("id", "lit"), "lit")
        .select(F.col("s").alias("doc_id"), F.col("literal").alias("text"))
        .distinct()
    )
    pairs = minhash_lsh_pairs(labels, threshold=threshold, n=n)
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    cc = connected_components(edges).select(
        F.col("node").alias("subject"), F.col("component").alias("canonical_id")
    )
    all_subjects = kb.symbols.select(F.col("s").alias("subject")).distinct()
    return (
        all_subjects.join(cc, "subject", "left")
        .select(
            "subject",
            F.coalesce("canonical_id", F.col("subject")).alias("canonical_id"),
        )
    )


def apply_canonical_map(triples: DataFrame, canon: DataFrame, resources: DataFrame) -> DataFrame:
    """Rewrite triple subject URIs through a (subject, canonical_id)
    map — the materialization step of canonicalization. Non-subject
    columns untouched; unmapped URIs pass through."""
    # canonicalize_by_label returns one row PER KB SUBJECT, identity for
    # the (vast) non-duplicate majority — broadcasting that whole map
    # would collect |subjects| decoded URI pairs to the driver. The
    # left-join + coalesce below already passes unmapped subjects
    # through, so only the actual remaps need to ship.
    canon = canon.filter(F.col("canonical_id") != F.col("subject"))
    canon_uri = (
        canon.join(resources.withColumnRenamed("id", "subject"), "subject")
        .join(
            resources.select(
                F.col("id").alias("canonical_id"), F.col("uri").alias("canonical_uri")
            ),
            "canonical_id",
        )
        .select(F.col("uri").alias("subj"), "canonical_uri")
    )
    return (
        triples.join(F.broadcast(canon_uri), "subj", "left")
        .withColumn("subj", F.coalesce("canonical_uri", F.col("subj")))
        .drop("canonical_uri")
    )


def canonical_uri_map(resources: DataFrame) -> DataFrame:
    """URI canonicalization (north_rule: sorted-key union-find): URIs that
    normalize identically (case-insensitive scheme+authority, http≡https,
    no trailing slash) map to the min resource id of their group. Single
    groupBy — the sorted-key trick makes multi-hop union-find unnecessary
    because the normalized key IS the component key.

    Only the scheme and authority lowercase (RFC 3986 §6.2.2.1): URI
    *paths* are case-sensitive and real KBs distinguish
    ``.../resource/Apple`` from ``.../resource/APPLE``."""
    no_slash = F.regexp_replace(
        # (?i): the scheme compares case-insensitively (RFC 3986), so
        # HTTPS:// must fold to http:// like https:// does
        F.regexp_replace(F.col("uri"), r"(?i)^https://", "http://"), r"/+$", ""
    )
    auth = F.regexp_extract(no_slash, r"^([a-zA-Z][a-zA-Z0-9+.\-]*://[^/]*)", 1)
    rest = F.regexp_replace(no_slash, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/]*", "")
    keyed = resources.withColumn(
        "ckey",
        F.when(auth != "", F.concat(F.lower(auth), rest)).otherwise(no_slash),
    )
    w = Window.partitionBy("ckey")
    return keyed.withColumn("canonical_id", F.min("id").over(w)).select(
        "id", "uri", "canonical_id"
    )
