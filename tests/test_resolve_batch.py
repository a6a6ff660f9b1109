"""resolve_batch (vectorized B16-B21) vs linking._resolve_one (scalar):
identical loser sets on randomized corpora, every vectorized resolver,
with and without expansion edges, including absent-anchor edges (the
cogroup path's pre-filter fetch) and multi-phrase multiplicity."""

import numpy as np
import pandas as pd
import pytest

from scoobie_spark import resolve_batch as rb
from scoobie_spark.linking import _resolve_one


def _random_batch(rng, n_docs=40, edges=True):
    rows = {"doc": [], "phrase": [], "lit": [], "subj": []}
    e = {"doc": [], "src": [], "dst": [], "dirf": [], "anc": []}
    for d in range(n_docs):
        doc_id = int(rng.integers(-(2**40), 2**40))
        n_rows = int(rng.integers(1, 9))
        n_ph = int(rng.integers(1, 4))
        phs = [f"ph{rng.integers(0, 5)}_{k}" for k in range(n_ph)]
        for _ in range(n_rows):
            rows["doc"].append(doc_id)
            rows["phrase"].append(phs[int(rng.integers(0, n_ph))])
            rows["lit"].append(-int(rng.integers(1, 6)))
            rows["subj"].append(int(rng.integers(100, 112)))
        if edges and rng.random() < 0.8:
            subs = sorted(set(rows["subj"][-n_rows:]))
            for _ in range(int(rng.integers(0, 12))):
                anc = (
                    int(rng.choice(subs))
                    if rng.random() < 0.8
                    else int(rng.integers(100, 130))  # sometimes absent
                )
                e["doc"].append(doc_id)
                e["src"].append(int(rng.integers(100, 140)))
                e["dst"].append(int(rng.integers(100, 140)))
                e["dirf"].append(bool(rng.random() < 0.5))
                e["anc"].append(anc)
    return (
        {k: np.asarray(v, dtype=object if k == "phrase" else np.int64) for k, v in rows.items()},
        {k: np.asarray(v, dtype=bool if k == "dirf" else np.int64) for k, v in e.items()},
    )


def _scalar_losers(rows, e, resolver):
    """Per-doc scalar reference: the exact _resolve_one call pattern of
    linking._resolve_doc (edge rows located by doc id, dir as 'f'/'b',
    anchors filtered by the function itself)."""
    out = set()
    doc = rows["doc"]
    for d in np.unique(doc):
        m = doc == d
        em = e["doc"] == d if len(e["doc"]) else np.zeros(0, bool)
        losers = _resolve_one(
            list(rows["phrase"][m]),
            rows["lit"][m].tolist(),
            rows["subj"][m].tolist(),
            e["src"][em].tolist() if em.any() else [],
            e["dst"][em].tolist() if em.any() else [],
            ["f" if f else "b" for f in e["dirf"][em]] if em.any() else [],
            e["anc"][em].tolist() if em.any() else [],
            resolver,
        )
        out.update((int(d), int(s)) for s in losers)
    return out


def _vector_losers(rows, e, resolver):
    st = rb.analyze(rows["doc"], rows["phrase"], rows["lit"], rows["subj"])
    loser = rb.losers(
        st,
        resolver,
        rb.map_doc_codes(st, e["doc"]),
        e["src"],
        e["dst"],
        e["dirf"],
        e["anc"],
    )
    return {
        (int(st.d_uniq[st.pair_doc[i]]), int(st.pair_subj[i]))
        for i in np.flatnonzero(loser)
    }


@pytest.mark.parametrize("resolver", rb.VECTOR_RESOLVERS)
@pytest.mark.parametrize("seed", range(6))
def test_vector_matches_scalar(resolver, seed):
    rng = np.random.default_rng(seed)
    rows, e = _random_batch(rng)
    assert _vector_losers(rows, e, resolver) == _scalar_losers(rows, e, resolver)


@pytest.mark.parametrize("resolver", rb.VECTOR_RESOLVERS)
def test_vector_matches_scalar_no_edges(resolver):
    rng = np.random.default_rng(99)
    rows, e = _random_batch(rng, edges=False)
    assert _vector_losers(rows, e, resolver) == _scalar_losers(rows, e, resolver)


def test_adjacency_gather_matches_dict_walk():
    """gather_adjacency must return, for every (doc, subject) pair of an
    AMBIGUOUS doc, exactly the dict's (src, dst, dir) tuples anchored at
    that subject — the scalar fn's per-doc walk, minus unambiguous docs
    (whose edges the scalar path builds and then never uses)."""
    rng = np.random.default_rng(5)
    rows, _ = _random_batch(rng, edges=False)
    adj = {}
    for s in range(100, 115):
        adj[s] = tuple(
            (int(rng.integers(100, 140)), int(rng.integers(100, 140)),
             "f" if rng.random() < 0.5 else "b")
            for _ in range(int(rng.integers(0, 4)))
        )
    st = rb.analyze(rows["doc"], rows["phrase"], rows["lit"], rows["subj"])
    arrs = rb.adjacency_arrays(adj)
    e_doc, e_src, e_dst, e_dirf, e_anc = rb.gather_adjacency(st, arrs)
    got = {}
    for i in range(len(e_doc)):
        got.setdefault((int(st.d_uniq[e_doc[i]]), int(e_anc[i])), []).append(
            (int(e_src[i]), int(e_dst[i]), "f" if e_dirf[i] else "b")
        )
    want = {}
    for i in range(len(st.spairs)):
        d, s = int(st.d_uniq[st.pair_doc[i]]), int(st.pair_subj[i])
        if st.doc_amb[st.pair_doc[i]] and adj.get(s):
            want[(d, s)] = list(adj[s])
    assert {k: sorted(v) for k, v in got.items()} == {
        k: sorted(v) for k, v in want.items()
    }


def test_full_pipeline_parity_with_adjacency():
    """End to end: losers computed from gathered adjacency edges equal
    the scalar path that walks the dict per doc (including its 'f'/'b'
    strings and the anchor-in-subjects guarantee)."""
    rng = np.random.default_rng(11)
    rows, _ = _random_batch(rng, edges=False)
    adj = {
        s: tuple(
            (s, int(rng.integers(100, 140)), "f") for _ in range(int(rng.integers(0, 3)))
        )
        + tuple(
            (int(rng.integers(100, 140)), s, "b") for _ in range(int(rng.integers(0, 3)))
        )
        for s in range(100, 115)
    }
    # scalar: replicate linking._make_filter_resolve_adj's gather
    e = {"doc": [], "src": [], "dst": [], "dirf": [], "anc": []}
    doc = rows["doc"]
    for d in np.unique(doc):
        for s in set(rows["subj"][doc == d].tolist()):
            for a, b, dr in adj.get(int(s), ()):
                e["doc"].append(int(d))
                e["src"].append(a)
                e["dst"].append(b)
                e["dirf"].append(dr == "f")
                e["anc"].append(int(s))
    e = {k: np.asarray(v, dtype=bool if k == "dirf" else np.int64) for k, v in e.items()}
    for resolver in rb.VECTOR_RESOLVERS:
        st = rb.analyze(rows["doc"], rows["phrase"], rows["lit"], rows["subj"])
        e_doc, e_src, e_dst, e_dirf, e_anc = rb.gather_adjacency(
            st, rb.adjacency_arrays(adj)
        )
        loser = rb.losers(st, resolver, e_doc, e_src, e_dst, e_dirf, e_anc)
        got = {
            (int(st.d_uniq[st.pair_doc[i]]), int(st.pair_subj[i]))
            for i in np.flatnonzero(loser)
        }
        assert got == _scalar_losers(rows, e, resolver), resolver
