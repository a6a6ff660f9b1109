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
_TAG_RE = re.compile(r"<[^>]*>|&[a-z]+;", re.IGNORECASE)

TOKENS_SCHEMA = "doc_id long, start int, end int, sent_id int"
CANDIDATES_SCHEMA = "doc_id long, begin int, hash int, suffix string"


def normalize_text(raw: str) -> str:
    """B1: offset-preserving markup strip — every HTML tag / entity is
    replaced by same-length spaces (Document.java:112-138 replaces tags
    with spaces so char offsets stay stable). Identity for code/plain."""
    return _TAG_RE.sub(lambda m: " " * (m.end() - m.start()), raw)


def _normalize_series(s: pd.Series) -> pd.Series:
    return s.map(lambda t: _TAG_RE.sub(lambda m: " " * (m.end() - m.start()), t))


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
    prefix_set = set(prefix_arr.tolist())  # O(1) probes for the slow path

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
        # document start offset of each text within `joined`
        lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
        doc_off = np.zeros(len(texts), dtype=np.int64)
        np.cumsum(lens[:-1] + 1, out=doc_off[1:])
        doc_end = doc_off + lens

        is_ascii = joined.isascii()
        if is_ascii:
            cp = np.frombuffer(joined.encode("ascii"), dtype=np.uint8).astype(np.int64)
            # numpy tokenizer ≡ _TOKEN_RE (\w+|[^\w\s]) for ASCII text:
            # starts = word-run heads + every lone non-word non-space
            # char (NUL separators land in the second class and are
            # dropped by the first-char class filter below) — the regex
            # finditer was O(tokens) python, the hot loop of this stage
            w = (
                ((cp >= 48) & (cp <= 57)) | ((cp >= 65) & (cp <= 90))
                | ((cp >= 97) & (cp <= 122)) | (cp == 95)
            )
            # \s also covers the ASCII separators \x1c-\x1f in unicode
            # regex semantics
            sp = (cp == 32) | ((cp >= 9) & (cp <= 13)) | ((cp >= 28) & (cp <= 31))
            prev_w = np.concatenate(([False], w[:-1]))
            starts = np.flatnonzero((w & ~prev_w) | (~w & ~sp))
        else:
            cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
            starts = np.fromiter(
                (m.start() for m in _TOKEN_RE.finditer(joined)), dtype=np.int64
            )
        if len(starts) == 0:
            return None
        cp_pad = np.concatenate([cp, np.zeros(4, dtype=np.int64)])
        first = cp_pad[starts]
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
        win = np.stack([cp_pad[starts + k] for k in range(4)], axis=1)
        pure_ascii_prefix = (
            win * (np.arange(4)[None, :] < n_avail[:, None]) <= 127
        ).all(axis=1)
        lo_win = np.where((win >= 65) & (win <= 90), win + 32, win)

        def _hash(w):
            h = np.zeros(len(starts), dtype=np.int64)
            for k in range(4):
                h = np.where(n_avail > k, h * 31 + w[:, k], h)
            h &= 0xFFFFFFFF
            return np.where(h >= 2**31, h - 2**32, h)

        h_or = _hash(win)
        h_lo = _hash(lo_win)
        fast = ascii_alnum & pure_ascii_prefix & (n_avail > 0)
        m_lo = fast & np.isin(h_lo, prefix_arr)
        m_or = fast & (h_or != h_lo) & np.isin(h_or, prefix_arr)

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
            texts = _normalize_series(pdf["content"]).tolist()
            if not texts:
                continue
            ids = pdf["doc_id"].values
            # vectorize over CHUNKS of docs, not the whole Arrow batch:
            # big enough to amortize the fixed numpy/regex setup
            # (~100 µs/call), small enough that the codepoint/window
            # arrays stay cache-resident (a whole 64k-doc batch would
            # allocate multi-GB temporaries)
            CHUNK = 256
            frames = []
            for c0 in range(0, len(texts), CHUNK):
                chunk = texts[c0 : c0 + CHUNK]
                res = batch_candidates(chunk)
                if res is None:
                    continue
                didx, begin_local, hashes, gstart, joined, doc_end = res
                suffixes = [
                    joined[int(a) : min(int(a) + max_suffix_len, int(doc_end[d]))]
                    for a, d in zip(gstart, didx)
                ]
                frames.append(
                    pd.DataFrame(
                        {
                            "doc_id": pd.Series(ids[c0 + didx], dtype="int64"),
                            "begin": pd.Series(begin_local, dtype="int32"),
                            "hash": pd.Series(hashes, dtype="int32"),
                            "suffix": pd.Series(suffixes, dtype="object"),
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]

    return cols.mapInPandas(gen, CANDIDATES_SCHEMA)
