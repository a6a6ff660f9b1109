"""Property tests for the B10-B12 span filters.

An independent, deliberately-naive per-document reimplementation of the
reference semantics (RDFLiteralSpotting.filterLongestMatches:186-214,
filterCaseMatches:216-246, token alignment :93-132) is compared against
the batch-vectorized ``spotting._filter_batch`` on random inputs, and
against the full Spark ``filter_mentions`` stage with tiny Arrow
batches (exercising the carry-across-batch stitching in grouped.py).
"""

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from scoobie_spark.spotting import _filter_batch

COLS = ["doc_id", "begin", "end", "lit_id", "prop_id", "belief", "literal",
        "surface", "tile_ok"]


def naive_filter(rows):
    """Reference-faithful per-doc filters over [(doc,a,b,lit,prop,belief,
    literal,surface,tile_ok)] tuples."""
    out = []
    docs = sorted({r[0] for r in rows})
    for d in docs:
        drows = [r for r in rows if r[0] == d]
        # TextPointer ordering + duplicate collapse
        drows.sort(key=lambda r: (r[1], -r[2], r[4], r[3]))
        seen = set()
        uniq = []
        for r in drows:
            k = (r[1], r[2], r[3], r[4])
            if k not in seen:
                seen.add(k)
                uniq.append(r)
        # B10 longest-match: drop matches strictly contained in the last
        # kept longer span
        kept = []
        s0 = None
        for r in uniq:
            a, b = r[1], r[2]
            if s0 is not None and (s0[1] - s0[0]) > (b - a) and a >= s0[0] and b <= s0[1]:
                continue
            kept.append(r)
            s0 = (a, b)
        # B11 case filter: if any match of this surface is case-exact,
        # drop the non-exact ones
        exact_surfaces = {r[7] for r in kept if r[7] == r[6]}
        kept = [r for r in kept if r[7] == r[6] or r[7] not in exact_surfaces]
        # B12 tiling flag
        kept = [r for r in kept if r[8]]
        out.extend(kept)
    return {tuple(r[:8]) for r in out}


@st.composite
def span_rows(draw):
    n_docs = draw(st.integers(1, 4))
    rows = []
    for d in range(n_docs):
        for _ in range(draw(st.integers(0, 12))):
            a = draw(st.integers(0, 30))
            ln = draw(st.integers(1, 8))
            lit = draw(st.sampled_from(["Alpha", "beta", "Gamma D", "x"]))
            surface = lit if draw(st.booleans()) else lit.lower()
            rows.append(
                (d, a, a + ln, draw(st.integers(0, 3)), draw(st.integers(0, 2)),
                 1.0, lit, surface, draw(st.booleans()))
            )
    return rows


@settings(max_examples=200, deadline=None)
@given(span_rows())
def test_filter_batch_matches_naive(rows):
    pdf = pd.DataFrame(rows, columns=COLS).sort_values(
        ["doc_id", "begin", "end", "prop_id", "lit_id"],
        ascending=[True, True, False, True, True],
    )
    got = _filter_batch(pdf.reset_index(drop=True))
    got_set = {
        (r.doc_id, r.begin, r.end, r.lit_id, r.prop_id, r.belief, r.literal, r.surface)
        for r in got.itertuples()
    }
    assert got_set == naive_filter(rows)


@pytest.mark.parametrize("batch", [3, 1000])
def test_filter_mentions_tiny_arrow_batches(spark, batch):
    """The carry-across-Arrow-batch stitching must not change results."""
    from scoobie_spark.spotting import filter_mentions

    rows = []
    for d in range(6):
        for i in range(7):
            lit = ["Alpha", "beta", "Gamma D"][i % 3]
            rows.append(
                (d, i * 2, i * 2 + len(lit), i % 3, i % 2, 1.0, lit,
                 lit if i % 2 else lit.lower(), i % 5 != 0)
            )
    df = spark.createDataFrame(
        rows,
        "doc_id long, begin int, end int, lit_id long, prop_id long, "
        "belief double, literal string, surface string, tile_ok boolean",
    )
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch))
        got = {
            tuple(r)
            for r in filter_mentions(df).select(
                "doc_id", "begin", "end", "lit_id", "prop_id", "literal", "surface"
            ).collect()
        }
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    want = {
        (r[0], r[1], r[2], r[3], r[4], r[6], r[7]) for r in map(tuple, rows)
        if tuple(r[:8]) in naive_filter(rows)
    }
    assert got == want


def test_numpy_tokenizer_matches_regex():
    """The ASCII fast-path token-start mask in suffix_candidates (the
    production _CHAR_CLASS table) must be position-identical to the
    _TOKEN_RE (\\w+|[^\\w\\s]) scan, including NUL separators,
    underscores, digits, and punctuation runs."""
    import random

    import numpy as np

    from scoobie_spark.textproc import _CHAR_CLASS, _TOKEN_RE

    random.seed(1)
    alphabet = "ab C1_.,!?-\t\n \0xyz#\x1c\x1d\x1e\x1f"
    for _ in range(300):
        s = "".join(random.choices(alphabet, k=random.randint(0, 200)))
        cls = _CHAR_CLASS[np.frombuffer(s.encode("ascii"), dtype=np.uint8)]
        w = cls == 1
        sp = cls == 2
        prev_w = np.concatenate(([False], w[:-1]))
        got = np.flatnonzero((w & ~prev_w) | (~w & ~sp)).tolist()
        want = [m.start() for m in _TOKEN_RE.finditer(s)]
        assert got == want, s.encode()


def _naive_candidates(texts, prefixes, np_filter, max_suffix_len):
    """Reference-faithful per-document candidate generation: _TOKEN_RE
    starts, isLetterOrDigit head gate (upper/digit under np_filter),
    java hash of the ≤4-char prefix in both cases, membership in the KB
    prefix set (SuffixArray.java:114-117)."""
    from scoobie_spark.hashing import java_hash_prefix_py
    from scoobie_spark.textproc import _TOKEN_RE

    pref = set(int(p) for p in prefixes)
    out = set()
    for didx, t in enumerate(texts):
        for m in _TOKEN_RE.finditer(t):
            a = m.start()
            ch = t[a]
            if np_filter:
                if not (ch.isupper() or ch.isdigit()):
                    continue
            elif not ch.isalnum():
                continue
            p4 = t[a : a + 4]
            hl, ho = java_hash_prefix_py(p4.lower()), java_hash_prefix_py(p4)
            suffix = t[a : a + max_suffix_len]
            if hl in pref:
                out.add((didx, a, hl, suffix))
            if ho != hl and ho in pref:
                out.add((didx, a, ho, suffix))
    return out


@pytest.mark.parametrize("np_filter", [False, True])
@pytest.mark.parametrize("ascii_only", [True, False])
def test_suffix_candidates_kernel_matches_naive(np_filter, ascii_only):
    """Differential test of the whole batch_candidates kernel against
    the naive per-doc reimplementation — captured via a fake DataFrame
    so it runs without Spark. ascii_only=True pins the int32 fast path
    (a single non-ASCII char routes the whole chunk to the generic
    path), ascii_only=False the generic/unicode path."""
    import random

    import pandas as pd

    from scoobie_spark import textproc as tp
    from scoobie_spark.hashing import java_hash_prefix_py

    random.seed(7)
    words = ["Alpha", "beta", "Gamma", "Ärzte", "x1", "_u", "N.A.S.A", "<b>t</b>"]
    if ascii_only:
        words = [w for w in words if w.isascii()]
    texts = []
    for _ in range(40):
        texts.append(" ".join(random.choices(words, k=random.randint(0, 30))))
    texts += ["", "   ", "\0"]  # edge chunks
    if not ascii_only:
        texts.append("Älpha Alpha")
    # prefixes for a mix of the words, both cases
    prefixes = {java_hash_prefix_py(w[:4].lower()) for w in words if w[0].isalnum()}
    prefixes |= {java_hash_prefix_py("Alph"), java_hash_prefix_py("Gamm")}

    captured = {}

    class FakeDF:
        columns = ["doc_id", "content"]

        def select(self, *a, **k):
            return self

        def mapInPandas(self, fn, schema):
            captured["fn"] = fn
            return None

    tp.suffix_candidates(FakeDF(), prefixes, np_filter=np_filter, max_suffix_len=10)
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "content": texts})
    got = set()
    for out in captured["fn"](iter([pdf])):
        got |= {
            (r.doc_id, r.begin, r.hash, r.suffix)
            for r in out.itertuples(index=False)
        }
    # naive side normalizes markup the same way the kernel does
    norm = [tp.normalize_text(t) for t in texts]
    want = _naive_candidates(norm, prefixes, np_filter, max_suffix_len=10)
    assert got == want
