"""Batch-vectorized B16-B21 disambiguation — the numpy twin of
``linking._resolve_one``.

The fused spot+resolve Arrow stage spends most of its Python time in a
per-document loop (profile at ×960 shape: ~57% in `_resolve_one`'s
pure-python graph work, ~25% building per-doc expansion-edge lists from
the broadcast adjacency — BASELINE.md round-4 notes). Documents are
independent and their graphs tiny, so the whole batch vectorizes:

* B16 bipartite edges: the per-(doc, phrase) lits × subjects cross
  product, built group-wise with `np.repeat` offset arithmetic —
  multiplicity across phrases preserved exactly (the scalar path keeps
  duplicates too; they feed the degree counts).
* B17 components: min-label propagation with pointer jumping over the
  doc-namespaced node set (labels only ever decrease, so it converges
  to one canonical label per component — the scalar union-find's root
  is likewise only a grouping key, so agreement on PARTITIONS is the
  required invariant, not agreement on representatives).
* Ambiguity early-out: the loser computation only ever needs documents
  whose component holds ≥ 2 subjects. The scalar path materialized
  per-doc adjacency edges BEFORE its early-exit; here the expansion
  gather itself is restricted to ambiguous documents (most documents
  never touch the adjacency at all).
* B18-B19: anchor guard (`dir=='f'` XOR anchor-ambiguous), per-doc
  (a, b) dedup, and the deg≤1 intermediate prune — set membership via
  searchsorted over the sorted (doc, subject) pair table, degrees via
  bincount.
* B20 degree / flow / random resolver scores vectorized (bincount +
  a uint64 splitmix64); the eigenvector family (pagerank/HITS) keeps
  the scalar per-doc numpy path, now restricted to ambiguous docs.
* B21 winner per ambiguous component: ascending lexsort by
  (component, score, -subject), take the last row per component —
  identical to the scalar `max(ss, key=lambda s: (score, -s))`.

Exactness contract: tests/test_resolve_batch.py drives randomized
corpora through BOTH implementations and asserts identical loser sets;
the flagship DuckDB oracle (hash-exact triples) and the
three-physical-paths-identical pytest remain the end-to-end gates.

Reference semantics: EntityDisambiguation.java:409-465 (traverse
forward/backward anchor guard), resolve:179-218 (single argmax winner);
see linking._resolve_one for the per-rule file:line map.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

VECTOR_RESOLVERS = ("degree", "flow", "random")


def _splitmix64_np(x: np.ndarray) -> np.ndarray:
    """uint64 splitmix64, value-identical to linking._resolve_one's
    scalar python version (int ordering == uint64 ordering)."""
    x = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


class BatchState:
    """Phase-1 analysis of one Arrow batch of candidate rows (post span
    filters): components, the (doc, subject) pair table, per-pair
    ambiguity flags, and everything phase 2 needs for scoring."""

    __slots__ = (
        "n", "d_codes", "d_uniq", "nv_uniq", "NV",
        "sub_key", "spairs", "pair_doc", "pair_subj", "pair_comp",
        "pair_amb", "pair_bip_in", "row_pair", "doc_amb", "amb_any",
    )


def analyze(doc, phrases, lit_nodes, subjects) -> BatchState:
    """doc/lit_nodes/subjects int64 arrays, phrases object array of
    lowercased surfaces — one element per candidate row, rows grouped
    by doc (any order within)."""
    st = BatchState()
    n = st.n = len(doc)
    d_codes, d_uniq = pd.factorize(doc)
    st.d_codes, st.d_uniq = d_codes, d_uniq
    ph_codes, _ = pd.factorize(phrases)
    node_vals = np.concatenate([lit_nodes, subjects])
    nv_codes, nv_uniq = pd.factorize(node_vals)
    st.nv_uniq = nv_uniq
    NV = st.NV = len(nv_uniq)
    lit_c, sub_c = nv_codes[:n], nv_codes[n:]
    lit_key = d_codes.astype(np.int64) * NV + lit_c
    sub_key = st.sub_key = d_codes.astype(np.int64) * NV + sub_c

    # --- B16 bip edges: per-(doc, phrase) unique-lits × unique-subjects
    M = int(ph_codes.max()) + 1 if n else 1
    dp_key = d_codes.astype(np.int64) * M + ph_codes
    l_u = np.unique(dp_key * NV + lit_c)   # sorted unique (doc,phrase,lit)
    s_u = np.unique(dp_key * NV + sub_c)
    kl, lv = l_u // NV, l_u % NV
    ks, sv = s_u // NV, s_u % NV
    keys, nl = np.unique(kl, return_counts=True)
    ns = np.unique(ks, return_counts=True)[1]  # same sorted key set
    cnt = nl * ns
    total = int(cnt.sum())
    # lit side: within a key block, each lit occupies ns consecutive slots
    lit_rep = np.repeat(lv, np.repeat(ns, nl))
    # subject side: within a key block, subjects tile with period ns
    off = np.concatenate([[0], np.cumsum(cnt)[:-1]])
    j = np.arange(total, dtype=np.int64) - np.repeat(off, cnt)
    s_off = np.concatenate([[0], np.cumsum(ns)[:-1]])
    sub_rep = sv[np.repeat(s_off, cnt) + j % np.repeat(ns, cnt)]
    e_dockey = np.repeat(keys // M, cnt) * NV
    bip_a = e_dockey + lit_rep   # (doc, lit) node keys
    bip_b = e_dockey + sub_rep   # (doc, subject) node keys

    # --- B17 components: min-label propagation + pointer jumping
    node_keys = np.unique(np.concatenate([lit_key, sub_key]))
    ea = np.searchsorted(node_keys, bip_a)
    eb = np.searchsorted(node_keys, bip_b)
    lbl = np.arange(len(node_keys), dtype=np.int64)
    while True:
        prev = lbl
        m = np.minimum(lbl[ea], lbl[eb])
        lbl = lbl.copy()
        np.minimum.at(lbl, ea, m)
        np.minimum.at(lbl, eb, m)
        lbl = lbl[lbl]
        lbl = lbl[lbl]
        if np.array_equal(lbl, prev):
            break

    # --- (doc, subject) pair table + ambiguity
    spairs = st.spairs = np.unique(sub_key)
    st.pair_doc = spairs // NV
    st.pair_subj = nv_uniq[spairs % NV]
    comp = st.pair_comp = lbl[np.searchsorted(node_keys, spairs)]
    _, inv, counts = np.unique(comp, return_inverse=True, return_counts=True)
    amb = st.pair_amb = counts[inv] >= 2
    st.row_pair = np.searchsorted(spairs, sub_key)
    doc_amb = np.zeros(len(d_uniq), dtype=bool)
    if amb.any():
        doc_amb[st.pair_doc[amb]] = True
    st.doc_amb = doc_amb
    st.amb_any = bool(amb.any())

    # bip in-degree per pair (multiplicity across phrases): each
    # (doc,phrase,subject) unique row contributes nl[its key] edges
    nl_of_s = nl[np.searchsorted(keys, ks)]
    bip_in = np.zeros(len(spairs), dtype=np.int64)
    s_pair_idx = np.searchsorted(spairs, (ks // M) * NV + sv)
    np.add.at(bip_in, s_pair_idx, nl_of_s)
    st.pair_bip_in = bip_in
    return st


def map_doc_codes(st: BatchState, raw_doc_ids) -> np.ndarray:
    """Raw doc ids → this batch's compact doc codes (-1 if unseen)."""
    return pd.Index(st.d_uniq).get_indexer(raw_doc_ids)


def losers(
    st: BatchState,
    resolver: str,
    e_doc_codes: np.ndarray,
    e_src: np.ndarray,
    e_dst: np.ndarray,
    e_dirf: np.ndarray,
    e_anc: np.ndarray,
) -> np.ndarray:
    """Phase 2 for the vectorized resolvers: per-pair loser flags.
    Expansion-edge arrays may cover any superset of the ambiguous docs
    (rows for unambiguous or unseen docs are ignored, matching the
    scalar guard semantics)."""
    if resolver not in VECTOR_RESOLVERS:
        raise ValueError(f"not vectorized: {resolver}")
    loser = np.zeros(len(st.spairs), dtype=bool)
    if not st.amb_any:
        return loser
    NV = st.NV
    exp_in = np.zeros(len(st.spairs), dtype=np.int64)
    exp_out = np.zeros(len(st.spairs), dtype=np.int64)

    if len(e_src):
        keep = e_doc_codes >= 0
        # anchor guard: anchor must be a candidate subject of the doc
        # (edges fetched pre-filter may reference removed subjects), and
        # direction XOR anchor-ambiguity decides admission
        anc_nv = pd.Index(st.nv_uniq).get_indexer(e_anc)
        keep &= anc_nv >= 0
        anc_key = e_doc_codes * NV + anc_nv
        idx = np.searchsorted(st.spairs, np.where(keep, anc_key, 0))
        idx = np.minimum(idx, len(st.spairs) - 1)
        present = keep & (st.spairs[idx] == anc_key)
        anc_amb = np.zeros(len(e_src), dtype=bool)
        anc_amb[present] = st.pair_amb[idx[present]]
        kept = present & (e_dirf != anc_amb)
        # only ambiguous docs can produce losers; drop the rest early
        kept &= st.doc_amb[np.maximum(e_doc_codes, 0)]
        if kept.any():
            kd, ka, kb = e_doc_codes[kept], e_src[kept], e_dst[kept]
            # per-doc (a, b) dedup — the scalar `kept` is a set
            tri = np.unique(
                np.stack([kd, ka.astype(np.int64), kb.astype(np.int64)], axis=1),
                axis=0,
            )
            kd, ka, kb = tri[:, 0], tri[:, 1], tri[:, 2]
            # B19 deg≤1 prune: degrees over the deduped kept edges,
            # intermediates = endpoints that are neither candidate
            # subjects of the doc nor literal nodes (<0)
            end_vals = np.concatenate([ka, kb])
            end_docs = np.concatenate([kd, kd])
            # overflow-safe (doc, value) pair coding: factorize the
            # arbitrary int64 values first, then pack with doc codes
            v_codes, v_uniq = pd.factorize(end_vals)
            pair = end_docs * len(v_uniq) + v_codes
            p_codes, p_uniq = pd.factorize(pair)
            deg = np.bincount(p_codes, minlength=len(p_uniq))
            deg_a, deg_b = deg[p_codes[: len(ka)]], deg[p_codes[len(ka):]]
            nv_idx = pd.Index(st.nv_uniq).get_indexer(end_vals)
            cand_key = end_docs * NV + nv_idx
            sidx = np.searchsorted(st.spairs, np.where(nv_idx >= 0, cand_key, 0))
            sidx = np.minimum(sidx, len(st.spairs) - 1)
            is_subj = (nv_idx >= 0) & (st.spairs[sidx] == cand_key)
            ok = is_subj | (end_vals < 0)
            ok_a = ok[: len(ka)] | (deg_a >= 2)
            ok_b = ok[len(ka):] | (deg_b >= 2)
            final = ok_a & ok_b
            # score contributions: out for a-side subjects, in for b-side
            a_s = final & is_subj[: len(ka)]
            b_s = final & is_subj[len(ka):]
            np.add.at(exp_out, sidx[: len(ka)][a_s], 1)
            np.add.at(exp_in, sidx[len(ka):][b_s], 1)

    in_deg = st.pair_bip_in + exp_in
    if resolver == "degree":
        score = in_deg + exp_out
    elif resolver == "flow":
        score = np.minimum(in_deg, exp_out)
    else:  # random
        score = _splitmix64_np(st.pair_subj)

    amb_idx = np.flatnonzero(st.pair_amb)
    order = np.lexsort(
        (-st.pair_subj[amb_idx], score[amb_idx], st.pair_comp[amb_idx])
    )
    sorted_comp = st.pair_comp[amb_idx][order]
    is_winner = np.r_[sorted_comp[1:] != sorted_comp[:-1], True]
    loser[amb_idx[order[~is_winner]]] = True
    return loser


# --------------------------------------------------------------------------
# broadcast-adjacency array form + per-batch gather
# --------------------------------------------------------------------------

_ADJ_CACHE: dict[int, tuple] = {}


def adjacency_arrays(adj: dict):
    """{subject: ((src, dst, dir), ...)} → (sorted subjects, offsets,
    src, dst, dirf) flat arrays. Converted once per worker process and
    memoized on the dict's identity. The cache entry keeps a strong
    reference to the dict (plain dicts are not weakref-able), which
    also makes the id() key collision-proof: the keyed object cannot be
    collected and its id reused while the entry lives. Broadcast values
    are held by the broadcast machinery for the app lifetime anyway, so
    the extra reference adds no RSS."""
    got = _ADJ_CACHE.get(id(adj))
    if got is not None and got[0] is adj:
        return got[1]
    subs = np.fromiter(adj.keys(), dtype=np.int64, count=len(adj))
    order = np.argsort(subs, kind="stable")
    subs = subs[order]
    counts = np.fromiter((len(adj[int(s)]) for s in subs), dtype=np.int64, count=len(subs))
    offs = np.concatenate([[0], np.cumsum(counts)])
    total = int(offs[-1])
    src = np.empty(total, dtype=np.int64)
    dst = np.empty(total, dtype=np.int64)
    dirf = np.empty(total, dtype=bool)
    k = 0
    for s in subs:
        for a, b, d in adj[int(s)]:
            src[k], dst[k], dirf[k] = a, b, d == "f"
            k += 1
    out = (subs, offs, src, dst, dirf)
    if len(_ADJ_CACHE) >= 2:  # a couple of live pipelines per worker
        _ADJ_CACHE.pop(next(iter(_ADJ_CACHE)))
    _ADJ_CACHE[id(adj)] = (adj, out)
    return out


def gather_adjacency(st: BatchState, adj_arrays, doc_codes_filter=None):
    """Expansion-edge arrays for this batch's (doc, subject) pairs —
    restricted to ambiguous docs (the only consumers). Returns
    (e_doc_codes, e_src, e_dst, e_dirf, e_anc)."""
    subs, offs, src, dst, dirf = adj_arrays
    z = np.array([], dtype=np.int64)
    if not len(subs):
        return z, z, z, np.array([], dtype=bool), z
    sel = st.doc_amb[st.pair_doc]  # every pair of an ambiguous doc
    p_doc = st.pair_doc[sel]
    p_sub = st.pair_subj[sel]
    idx = np.minimum(np.searchsorted(subs, p_sub), len(subs) - 1)
    found = subs[idx] == p_sub
    idx, p_doc, p_sub = idx[found], p_doc[found], p_sub[found]
    lens = offs[idx + 1] - offs[idx]
    total = int(lens.sum())
    if not total:
        return z, z, z, np.array([], dtype=bool), z
    starts = offs[idx]
    cum0 = np.cumsum(lens) - lens
    flat = np.repeat(starts - cum0, lens) + np.arange(total, dtype=np.int64)
    return (
        np.repeat(p_doc, lens),
        src[flat],
        dst[flat],
        dirf[flat],
        np.repeat(p_sub, lens),
    )
