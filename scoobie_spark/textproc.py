"""Document text processing — SURVEY.md §2 B1-B7, Arrow-vectorized.

The reference runs per-document Java transducers (HTML strip, word /
sentence BreakIterators, suffix-array build: ``model/Document.java:85-138``,
``transducer/WordSegmenter.java:40-58``, ``SentenceSegmenter.java:41-62``,
``SuffixArrayBuilder.java:59-84``). Here all of B1-B4 + B7 run in ONE
``mapInPandas`` pass over the corpus: for each content row we emit
token rows, and (separately) gazetteer candidate rows for token starts
whose 4-char prefix hash hits the broadcast KB prefix set — the
document side of the reference's prefix-bucket optimization
(SuffixArray.java:107-117: both the lowercase and original-case hash
are probed, "compatibility issue").

No per-row Python: the regex scans run per *batch* via pandas.str
operations / list comprehensions over Arrow batches, and the prefix
filter is a numpy ``isin`` against a broadcast int array.

Scale notes:
* tokens are (doc_id:long, start:int, end:int, sent_id:int) — 20 bytes
  a row; candidates carry the ≤100-char suffix (reference maxLength=100,
  Scoobie.java:94) but only for prefix-filtered starts, typically <2%
  of tokens.
* input is repartitioned by a hash of (repo, path, commit) upstream so
  a giant repo cannot pin one partition (SURVEY §4 O12).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashing import java_hash_prefix_py

MAX_SUFFIX_LEN = 100  # reference Scoobie.java:94 (maxLength)

# Word segmentation: letter/digit/underscore runs, or a single
# non-word non-space char (BreakIterator-style: punctuation is its own
# token — WordSegmenter.java:40-58 keeps non-whitespace segments).
_TOKEN_RE = re.compile(r"\w+|[^\w\s]")
_SENT_RE = re.compile(r"[.!?]+(?:\s+|$)")
# \0 excluded from the tag body so this single-doc regex is EXACTLY
# equivalent to _TAG_RE_NUL over the NUL-joined multi-doc buffer — a
# document whose own bytes contain a NUL inside a tag-shaped span must
# normalize identically on the tokenize and suffix-candidate paths, or
# their offsets disagree
_TAG_RE = re.compile(r"<[^>\0]*>|&[a-z]+;", re.IGNORECASE)

TOKENS_SCHEMA = "doc_id long, start int, end int, sent_id int"
CANDIDATES_SCHEMA = "doc_id long, begin int, hash int, suffix string"


def normalize_text(raw: str) -> str:
    """B1: offset-preserving markup strip — every HTML tag / entity is
    replaced by same-length spaces (Document.java:112-138 replaces tags
    with spaces so char offsets stay stable). Identity for code/plain."""
    return _TAG_RE.sub(lambda m: " " * (m.end() - m.start()), raw)


def _normalize_series(s: pd.Series) -> pd.Series:
    return s.map(lambda t: _TAG_RE.sub(lambda m: " " * (m.end() - m.start()), t))


# _TAG_RE over a NUL-joined multi-document buffer: excluding NUL from
# the tag body makes a cross-document match impossible, so one sub over
# the joined buffer ≡ per-document subs (the entity alternative cannot
# span NUL either: \0 is not [a-z]).
_TAG_RE_NUL = re.compile(r"<[^>\0]*>|&[a-z]+;", re.IGNORECASE)

# ASCII char classes for the vectorized tokenizer: 1 = word (\w), 2 =
# whitespace (\s incl. the \x1c-\x1f separators unicode regex counts).
# One table gather replaces ~8 full-text compare passes — this stage is
# memory-bandwidth-bound at high core counts.
_CHAR_CLASS = np.zeros(256, dtype=np.uint8)
_CHAR_CLASS[48:58] = _CHAR_CLASS[65:91] = _CHAR_CLASS[97:123] = 1
_CHAR_CLASS[95] = 1
_CHAR_CLASS[32] = _CHAR_CLASS[9:14] = _CHAR_CLASS[28:32] = 2

# token-head eligibility tables (SuffixArray.java:114 isLetterOrDigit;
# the np_filter variant keeps only upper/digit heads)
_HEAD_ALNUM = np.zeros(256, dtype=bool)
_HEAD_ALNUM[48:58] = _HEAD_ALNUM[65:91] = _HEAD_ALNUM[97:123] = True
_HEAD_NP = np.zeros(256, dtype=bool)
_HEAD_NP[48:58] = _HEAD_NP[65:91] = True

# 31^k table for the vectorized Java string hash of ≤4-char prefixes
_POW31 = np.array([1, 31, 961, 29791], dtype=np.int64)
_POW31_32 = _POW31.astype(np.int32)


def with_doc_id(docs: DataFrame) -> DataFrame:
    """Stable 64-bit doc key from (repo, path, commit) — deterministic on
    any cluster, no monotonically_increasing_id partition dependence."""
    return docs.withColumn(
        "doc_id", F.xxhash64("repo", "path", "commit")
    )


def tokenize(docs: DataFrame) -> DataFrame:
    """B2-B4: tokens with char offsets + sentence ids.

    Input: (doc_id, content [, lang]); output long table
    (doc_id, start, end, sent_id), generated via mapInPandas so the
    explode happens inside Arrow batches (no per-row Python UDF calls,
    no intermediate array column).
    """
    cols = docs.select("doc_id", "content")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = _normalize_series(pdf["content"])
            out_doc, out_start, out_end, out_sent = [], [], [], []
            for doc_id, text in zip(pdf["doc_id"].values, texts.values):
                bounds = [m.end() for m in _SENT_RE.finditer(text)]
                bi = 0
                sid = 0
                for m in _TOKEN_RE.finditer(text):
                    while bi < len(bounds) and m.start() >= bounds[bi]:
                        bi += 1
                        sid += 1
                    out_doc.append(doc_id)
                    out_start.append(m.start())
                    out_end.append(m.end())
                    out_sent.append(sid)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_doc, dtype="int64"),
                    "start": pd.Series(out_start, dtype="int32"),
                    "end": pd.Series(out_end, dtype="int32"),
                    "sent_id": pd.Series(out_sent, dtype="int32"),
                }
            )

    return cols.mapInPandas(gen, TOKENS_SCHEMA)


def suffix_candidates(
    docs: DataFrame,
    kb_prefixes: "np.ndarray | set[int]",
    check_sha256: bool = False,
    np_filter: bool = False,
    max_suffix_len: int = MAX_SUFFIX_LEN,
) -> DataFrame:
    """B7 + the document half of B8: per token start, if the 4-char
    prefix hash (lowercase OR original case, SuffixArray.java:114-117)
    is in the KB literal-prefix set, emit a candidate
    (doc_id, begin, suffix[:100]).

    ``kb_prefixes`` is the collected distinct ``literals.prefix``
    column — an int array (4-byte each; even a 10^8-literal DBpedia KB
    has < 10^6 distinct 4-char prefixes → a few MB broadcast). This is
    the inverted form of the reference's per-document
    ``prefix IN (...)`` gazetteer query (PostgresKB.java:160-208): one
    corpus-wide filter instead of N round-trips.

    Only token starts whose first char is a letter/digit probe the
    gazetteer (SuffixArray.java:114 ``Character.isLetterOrDigit``).

    ``max_suffix_len`` caps the emitted suffix: matching only ever
    needs ``max(len(literal)) + 1`` chars (the +1 feeds B12's tiling
    probe of the char after the span), so callers that know the KB's
    longest literal shrink every candidate row shipped through the
    spot join — often the pipeline's largest byte volume.
    """
    prefix_arr = np.asarray(sorted(set(int(p) for p in kb_prefixes)), dtype=np.int64)
    # Java hashCodes are int32 by construction; the ASCII fast path
    # probes this narrower copy (same sort order — int32-range values)
    prefix_arr32 = prefix_arr.astype(np.int32)
    prefix_set = set(prefix_arr.tolist())  # O(1) probes for the slow path
    # direct-mapped probe table: for small prefix sets (every gazetteer
    # in the bundled KBs; a 10^6-prefix DBpedia falls back to the
    # sorted-array binary search below) find a power-of-2 mask under
    # which no two prefixes share a slot — membership then costs one
    # gather + compare per token instead of a log-n searchsorted, which
    # had become the kernel's largest single line after the Horner fold
    probe_tab = None
    if 0 < len(prefix_arr32) <= 65536:
        m = 256
        while m <= (1 << 22):
            slots = prefix_arr32.astype(np.int64) & (m - 1)
            if len(np.unique(slots)) == len(prefix_arr32):
                # sentinel 2^40 is outside int32 range → empty slots
                # never equal a probed hash
                probe_tab = np.full(m, np.int64(1) << 40, dtype=np.int64)
                probe_tab[slots] = prefix_arr32
                probe_mask = np.int64(m - 1)
                break
            m <<= 1

    sha_cols = ["sha256"] if check_sha256 and "sha256" in docs.columns else []
    cols = docs.select("doc_id", "content", *sha_cols)

    def batch_candidates(texts: list[str]):
        """Whole-BATCH vectorized candidate generation: all texts join
        into one buffer separated by NUL (never a word char, so tokens
        cannot cross documents), the token regex and the numpy
        codepoint/hash math run ONCE per Arrow batch instead of once
        per document — per-doc fixed numpy overhead disappears.

        Returns (doc_idx, begin_local, hash) arrays for prefix-hash
        matches; suffix slices are clipped at each document's end.
        """
        joined = "\0".join(texts)
        # B1 offset-preserving markup strip, one pass over the whole
        # chunk instead of a per-document Series.map — and skipped
        # entirely via memchr when the chunk has no tag/entity lead
        # character at all (code/plain corpora: the common case)
        if "<" in joined or "&" in joined:
            joined = _TAG_RE_NUL.sub(lambda m: " " * (m.end() - m.start()), joined)
        # document start offset of each text within `joined`
        lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
        doc_off = np.zeros(len(texts), dtype=np.int64)
        np.cumsum(lens[:-1] + 1, out=doc_off[1:])
        doc_end = doc_off + lens

        if joined.isascii():
            # ASCII fast path — the overwhelmingly common case, and the
            # stage is memory-bandwidth-bound at high core counts (×960
            # profile: summed task time inflates +58% from 8→32 cores),
            # so every pass is dtype-minimal: uint8 for full-text scans,
            # int32 for the per-token window math. Two structural facts
            # this branch exploits: an ascii-encoded buffer can't
            # contain a >127 char, so the generic path's
            # pure_ascii_prefix test is vacuously true and its python
            # slow path (non-ASCII windows) is provably empty.
            cp = np.frombuffer(joined.encode("ascii"), dtype=np.uint8)
            # numpy tokenizer ≡ _TOKEN_RE (\w+|[^\w\s]) for ASCII text:
            # starts = word-run heads + every lone non-word non-space
            # char — the regex finditer was O(tokens) python, the hot
            # loop of this stage
            cls = _CHAR_CLASS[cp]
            w = cls == 1
            sp = cls == 2
            prev_w = np.concatenate(([False], w[:-1]))
            starts = np.flatnonzero((w & ~prev_w) | (~w & ~sp))
            if len(starts) == 0:
                return None
            cp_pad = np.concatenate([cp, np.zeros(4, dtype=np.uint8)])
            # head-class filter BEFORE any window work (only letter/
            # digit heads probe the gazetteer; NUL separators are class
            # 0 and drop here too) — the downstream cost is per
            # surviving start, so filter first
            starts = starts[(_HEAD_NP if np_filter else _HEAD_ALNUM)[cp_pad[starts]]]
            if len(starts) == 0:
                return None
            # every surviving start is an alnum char inside some doc,
            # so n_avail ≥ 1 by construction. starts is sorted, so
            # invert the probe direction: count starts below each of
            # the ~256 doc ends (m log n) instead of searching every
            # start into doc_end (n log m) — measured 12× faster at
            # n/m ≈ 170, value-identical (no start can sit ON a doc
            # end: the NUL separator is head-class 0 and was filtered)
            cuts = np.searchsorted(starts, doc_end, side="left")
            didx = np.repeat(
                np.arange(len(texts), dtype=np.int64), np.diff(cuts, prepend=0)
            )
            n_avail = np.minimum(4, doc_end[didx] - starts).astype(np.int32)
            # Java's left-fold string hash over the first n_avail chars
            # is the polynomial sum_{k<n} c_k * 31^(n-1-k); ASCII chars
            # keep it under 127·(31³+31²+31+1) < 2³¹, so int32 holds it
            # exactly and the 32-bit wrap + sign fold are no-ops.
            # Horner form on 1-D vectors (h = ((c0·31+c1)·31+c2)·31+c3)
            # instead of a (n,4) window matrix × power table: same
            # values, ~5× less work — this hash was the kernel's top
            # cost (52% of stage time at ×960)
            g = cp_pad[starts].astype(np.int32)
            h_or = g
            h_lo = np.where((g >= 65) & (g <= 90), g + 32, g)
            for k in range(1, 4):
                g = cp_pad[starts + k].astype(np.int32)
                h_or = h_or * 31 + g
                h_lo = h_lo * 31 + np.where((g >= 65) & (g <= 90), g + 32, g)
            # windows clipped by a document end (n_avail < 4) hash only
            # their first n_avail chars — the Horner fold above read into
            # the NUL separator + next doc, so recompute that rare subset
            # (≤3 token starts per document tail) with the exact
            # power-table formula
            short = np.flatnonzero(n_avail < 4)
            if len(short):
                win_s = np.stack(
                    [cp_pad[starts[short] + k] for k in range(4)], axis=1
                ).astype(np.int32)
                exp = n_avail[short][:, None] - 1 - np.arange(4, dtype=np.int32)[None, :]
                pw = np.where(exp >= 0, _POW31_32[np.clip(exp, 0, 3)], 0)
                h_or[short] = (win_s * pw).sum(axis=1, dtype=np.int32)
                lo_s = np.where((win_s >= 65) & (win_s <= 90), win_s + 32, win_s)
                h_lo[short] = (lo_s * pw).sum(axis=1, dtype=np.int32)

            def _in32(h):
                if probe_tab is not None:
                    return probe_tab[h & probe_mask] == h
                # prefix_arr32 is sorted & deduped at build time:
                # searchsorted probes it in place (np.isin re-sorts a
                # concatenated copy on every call)
                if len(prefix_arr32) == 0:
                    return np.zeros(len(h), dtype=bool)
                idx = np.minimum(
                    np.searchsorted(prefix_arr32, h), len(prefix_arr32) - 1
                )
                return prefix_arr32[idx] == h

            m_lo = _in32(h_lo)
            m_or = (h_or != h_lo) & _in32(h_or)
            out_start = np.concatenate([starts[m_lo], starts[m_or]])
            out_hash = np.concatenate([h_lo[m_lo], h_or[m_or]])
            out_didx = np.concatenate([didx[m_lo], didx[m_or]])
            begin_local = out_start - doc_off[out_didx]
            return out_didx, begin_local, out_hash, out_start, joined, doc_end

        # generic (non-ASCII buffer) path: regex tokenizer + exact
        # python fallback for tokens whose 4-char window leaves ASCII
        cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
        starts = np.fromiter(
            (m.start() for m in _TOKEN_RE.finditer(joined)), dtype=np.int64
        )
        if len(starts) == 0:
            return None
        cp_pad = np.concatenate([cp, np.zeros(4, dtype=np.uint32)])
        first = cp_pad[starts].astype(np.int64)
        if np_filter:
            ascii_alnum = ((first >= 48) & (first <= 57)) | (
                (first >= 65) & (first <= 90)
            )
        else:
            ascii_alnum = (
                ((first >= 48) & (first <= 57))
                | ((first >= 65) & (first <= 90))
                | ((first >= 97) & (first <= 122))
            )
        non_ascii = first > 127

        # map each token start to its document; clip the 4-char window
        # at the document end (a window crossing the NUL would otherwise
        # hash the next doc's first chars)
        didx = np.searchsorted(doc_end, starts, side="right").clip(0, len(texts) - 1)
        # token starts sitting ON a NUL separator map to the next doc's
        # range check below and fail it → filtered
        n_avail = np.minimum(4, doc_end[didx] - starts)
        win = np.stack([cp_pad[starts + k] for k in range(4)], axis=1).astype(np.int64)
        pure_ascii_prefix = (
            win * (np.arange(4)[None, :] < n_avail[:, None]) <= 127
        ).all(axis=1)
        lo_win = np.where((win >= 65) & (win <= 90), win + 32, win)

        # same polynomial-expansion hash as the fast path, in int64
        # (codepoints up to 0x10FFFF overflow int32), with the exact
        # 32-bit wrap + sign fold Java applies
        exp = n_avail[:, None] - 1 - np.arange(4)[None, :]
        pw = np.where(exp >= 0, _POW31[np.clip(exp, 0, 3)], 0)

        def _hash(w):
            h = (w * pw).sum(axis=1)
            h &= 0xFFFFFFFF
            return np.where(h >= 2**31, h - 2**32, h)

        h_or = _hash(win)
        h_lo = _hash(lo_win)

        def _in_prefixes(h):
            if len(prefix_arr) == 0:
                return np.zeros(len(h), dtype=bool)
            idx = np.minimum(
                np.searchsorted(prefix_arr, h), len(prefix_arr) - 1
            )
            return prefix_arr[idx] == h

        fast = ascii_alnum & pure_ascii_prefix & (n_avail > 0)
        m_lo = fast & _in_prefixes(h_lo)
        m_or = fast & (h_or != h_lo) & _in_prefixes(h_or)

        out_start = np.concatenate([starts[m_lo], starts[m_or]])
        out_hash = np.concatenate([h_lo[m_lo], h_or[m_or]])
        out_didx = np.concatenate([didx[m_lo], didx[m_or]])

        # exact python path for the rare non-ASCII-prefix tokens
        slow = np.nonzero(~fast & (ascii_alnum | non_ascii) & (n_avail > 0))[0]
        if len(slow):
            s_start, s_hash, s_didx = [], [], []
            for i in slow:
                a = int(starts[i])
                d = int(didx[i])
                ch = joined[a]
                if np_filter:
                    if not (ch.isupper() or ch.isdigit()):
                        continue
                elif not ch.isalnum():
                    continue
                pref = joined[a : min(a + 4, int(doc_end[d]))]
                hl, ho = java_hash_prefix_py(pref.lower()), java_hash_prefix_py(pref)
                if hl in prefix_set:
                    s_start.append(a)
                    s_hash.append(hl)
                    s_didx.append(d)
                if ho != hl and ho in prefix_set:
                    s_start.append(a)
                    s_hash.append(ho)
                    s_didx.append(d)
            if s_start:
                out_start = np.concatenate([out_start, np.asarray(s_start, np.int64)])
                out_hash = np.concatenate([out_hash, np.asarray(s_hash, np.int64)])
                out_didx = np.concatenate([out_didx, np.asarray(s_didx, np.int64)])

        begin_local = out_start - doc_off[out_didx]
        return out_didx, begin_local, out_hash, out_start, joined, doc_end

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if sha_cols:
                # per-row content sha256 invariant (BASELINE.json input_hint),
                # enforced inside the same Arrow pass — no extra corpus scan
                for content, expected in zip(pdf["content"].values, pdf["sha256"].values):
                    if hashlib.sha256(content.encode("utf-8")).hexdigest() != expected:
                        raise RuntimeError(
                            "sha256 invariant violated: content hash mismatch"
                        )
            # markup normalization happens per joined chunk inside
            # batch_candidates (one regex pass, memchr-gated)
            texts = pdf["content"].tolist()
            if not texts:
                continue
            ids = pdf["doc_id"].values
            # vectorize over CHUNKS of docs, not the whole Arrow batch:
            # big enough to amortize the fixed numpy/regex setup
            # (~100 µs/call), small enough that the codepoint/window
            # arrays stay cache-resident (a whole 64k-doc batch would
            # allocate multi-GB temporaries)
            CHUNK = 256
            # accumulate per-chunk numpy arrays and assemble ONE pandas
            # frame per Arrow batch: the per-chunk DataFrame + concat
            # construction was ~17% of kernel wall time (pandas block
            # manager overhead × 12 chunks), pure overhead at ×960
            acc_ids: list[np.ndarray] = []
            acc_begin: list[np.ndarray] = []
            acc_hash: list[np.ndarray] = []
            acc_suffix: list[str] = []
            for c0 in range(0, len(texts), CHUNK):
                chunk = texts[c0 : c0 + CHUNK]
                res = batch_candidates(chunk)
                if res is None:
                    continue
                didx, begin_local, hashes, gstart, joined, doc_end = res
                acc_suffix.extend(
                    joined[int(a) : min(int(a) + max_suffix_len, int(doc_end[d]))]
                    for a, d in zip(gstart, didx)
                )
                acc_ids.append(ids[c0 + didx])
                acc_begin.append(begin_local)
                acc_hash.append(hashes)
            if acc_ids:
                yield pd.DataFrame(
                    {
                        "doc_id": pd.Series(np.concatenate(acc_ids), dtype="int64"),
                        "begin": pd.Series(np.concatenate(acc_begin), dtype="int32"),
                        "hash": pd.Series(np.concatenate(acc_hash), dtype="int32"),
                        "suffix": pd.Series(acc_suffix, dtype="object"),
                    }
                )

    return cols.mapInPandas(gen, CANDIDATES_SCHEMA)
