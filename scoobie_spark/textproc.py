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
    """
    prefix_arr = np.asarray(sorted(set(int(p) for p in kb_prefixes)), dtype=np.int64)

    sha_cols = ["sha256"] if check_sha256 and "sha256" in docs.columns else []
    cols = docs.select("doc_id", "content", *sha_cols)

    def doc_candidates(text: str):
        """Vectorized per-doc candidate generation: token starts from the
        regex, then numpy codepoint math for the alnum filter and the
        two Java prefix hashes. Tokens whose 4-char prefix leaves ASCII
        fall back to the exact python hash (unicode lowercasing)."""
        starts = np.fromiter(
            (m.start() for m in _TOKEN_RE.finditer(text)), dtype=np.int64
        )
        if len(starts) == 0:
            return [], []
        # codepoint array: 1 byte/char for ASCII text (4× less memory
        # bandwidth than utf-32; corpora are overwhelmingly ASCII)
        if text.isascii():
            cp = np.frombuffer(text.encode("ascii"), dtype=np.uint8).astype(np.int64)
        else:
            cp = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
        cp_pad = np.concatenate([cp, np.zeros(4, dtype=np.int64)])
        first = cp_pad[starts]
        if np_filter:
            # B6-analogue proper-name gate (SuffixArrayBuilder.
            # filterNounPhrases): only capitalized/numeric token starts
            # feed the gazetteer probe
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
        # prefix window codepoints + availability
        n_avail = np.minimum(4, len(cp) - starts)
        win = np.stack([cp_pad[starts + k] for k in range(4)], axis=1)
        pure_ascii_prefix = (win * (np.arange(4)[None, :] < n_avail[:, None]) <= 127).all(axis=1)

        lo_win = np.where((win >= 65) & (win <= 90), win + 32, win)

        def _hash(w):
            h = np.zeros(len(starts), dtype=np.int64)
            for k in range(4):
                h = np.where(n_avail > k, h * 31 + w[:, k], h)
            h &= 0xFFFFFFFF
            return np.where(h >= 2**31, h - 2**32, h)

        h_or = _hash(win)
        h_lo = _hash(lo_win)

        fast = ascii_alnum & pure_ascii_prefix
        out_begin: list[int] = []
        out_hash: list[int] = []
        m_lo = fast & np.isin(h_lo, prefix_arr)
        m_or = fast & (h_or != h_lo) & np.isin(h_or, prefix_arr)
        out_begin.extend(starts[m_lo].tolist())
        out_hash.extend(h_lo[m_lo].tolist())
        out_begin.extend(starts[m_or].tolist())
        out_hash.extend(h_or[m_or].tolist())

        # exact python path for the rare non-ASCII-prefix tokens
        slow_idx = np.nonzero(~fast & (ascii_alnum | non_ascii))[0]
        pa = prefix_arr
        for i in slow_idx:
            a = int(starts[i])
            ch = text[a]
            if np_filter:
                if not (ch.isupper() or ch.isdigit()):
                    continue
            elif not ch.isalnum():
                continue
            pref = text[a : a + 4]
            hl, ho = java_hash_prefix_py(pref.lower()), java_hash_prefix_py(pref)
            if np.isin(hl, pa):
                out_begin.append(a)
                out_hash.append(hl)
            if ho != hl and np.isin(ho, pa):
                out_begin.append(a)
                out_hash.append(ho)
        return out_begin, out_hash

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
            texts = _normalize_series(pdf["content"])
            out_doc, out_begin, out_hash, out_suffix = [], [], [], []
            for doc_id, text in zip(pdf["doc_id"].values, texts.values):
                begins, hashes = doc_candidates(text)
                for a, hv in zip(begins, hashes):
                    out_doc.append(doc_id)
                    out_begin.append(a)
                    out_hash.append(hv)
                    out_suffix.append(text[a : a + MAX_SUFFIX_LEN])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_doc, dtype="int64"),
                    "begin": pd.Series(out_begin, dtype="int32"),
                    "hash": pd.Series(out_hash, dtype="int32"),
                    "suffix": pd.Series(out_suffix, dtype="object"),
                }
            )

    return cols.mapInPandas(gen, CANDIDATES_SCHEMA)
