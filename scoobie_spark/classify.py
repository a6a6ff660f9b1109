"""B14 — entity classification (SURVEY.md §2 B14).

Reference (``transducer/EntityClassification.java:56-147``): a Mallet
MaxEnt model classifies each noun phrase into a type cluster from
n-gram/context features (``corpus/LabeledTextCorpus.extractFeatures``,
``LabeledTextCorpus.java:169-251``; model wrapper
``transducer/model/MaxentEntityClassifierModel.java:69-177``); a
prediction is accepted only when the top1−top2 probability margin
exceeds a threshold (0.6), and accepted phrases get a predicted
``type`` layer with ``subject = -1``. The stage is commented out of the
reference's production pipeline (``Scoobie.java:108-114``), so it is
*off by default* here too (PipelineConfig has no slot for it; callers
invoke it explicitly).

Spark-first form:

* **Training** is driver-side numpy (multinomial logistic regression =
  maxent, L2, full-batch gradient): the training set is (KB literal →
  type cluster) pairs, which is dictionary-scale (≤ millions), and the
  reference's Mallet training is single-node too. For huge KBs the
  sample is capped per class via ``row_number()`` (deterministic, the
  Spark analogue of the reference's ``LIMIT`` sampling).
* **Inference** is an Arrow-batched ``mapInPandas`` pass with the
  weight matrix broadcast by closure — hashed character n-gram
  featurization and the softmax run vectorized per batch, no per-row
  Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .kb.model import KB

N_BUCKETS = 1 << 12  # hashed feature space (char n-grams)
_NGRAM_NS = (2, 3)


_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _featurize_row(s: str, out_row: np.ndarray, n_buckets: int) -> None:
    """Scalar fallback (non-ASCII rows): FNV-1a over each char-ngram's
    utf-8 bytes — the original per-char recurrence."""
    for n in _NGRAM_NS:
        for i in range(len(s) - n + 1):
            h = 0xCBF29CE484222325
            for ch in s[i : i + n].encode("utf-8"):
                h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
            out_row[h % n_buckets] += 1.0


def _featurize(texts: list[str], n_buckets: int = N_BUCKETS) -> np.ndarray:
    """Hashed char-ngram bag (L2-normalized rows). The hash is FNV-1a
    over the ngram bytes (deterministic, seed-free — python's hash() is
    salted per process and would break determinism across executors).

    Vectorized: ASCII rows (the overwhelming majority of entity labels)
    are concatenated into one byte buffer; n-gram FNV runs as n xor/mul
    passes in wrapping uint64, scattered into the bag with one
    ``np.add.at``. For ASCII text, byte n-grams ≡ char n-grams, so the
    result is bit-identical to the scalar recurrence; non-ASCII rows
    take the scalar path."""
    out = np.zeros((len(texts), n_buckets), dtype=np.float32)
    if not texts:
        return out
    lowered = [f"^{t.lower()}$" for t in texts]
    fast_rows, bufs, lens = [], [], []
    for r, s in enumerate(lowered):
        if s.isascii():
            fast_rows.append(r)
            bufs.append(s.encode("ascii"))
            lens.append(len(s))
        else:
            _featurize_row(s, out[r], n_buckets)
    if fast_rows:
        buf = np.frombuffer(b"".join(bufs), dtype=np.uint8).astype(np.uint64)
        lens_a = np.asarray(lens, dtype=np.int64)
        ends = np.cumsum(lens_a)
        starts = ends - lens_a
        row_idx = np.asarray(fast_rows, dtype=np.int64)
        for n in _NGRAM_NS:
            if len(buf) < n:
                continue
            # windows fully inside a row: start position p has p+n ≤ row end
            ok = np.ones(len(buf) - n + 1, dtype=bool)
            for b0 in ends[:-1]:
                ok[max(b0 - n + 1, 0):b0] = False
            h = np.full(len(buf) - n + 1, _FNV_OFFSET, dtype=np.uint64)
            for j in range(n):
                h = (h ^ buf[j : len(buf) - n + 1 + j]) * _FNV_PRIME  # wraps
            bucket = (h % np.uint64(n_buckets)).astype(np.int64)
            win_row = np.searchsorted(ends, np.flatnonzero(ok), side="right")
            np.add.at(out, (row_idx[win_row], bucket[ok]), 1.0)
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    np.divide(out, norms, out=out, where=norms > 0)
    return out


# --------------------------------------------------------------------------
# reference-parity featurization (LabeledTextCorpus.extractFeatures) —
# opt-in via featurizer="reference"; the hashed char-ngram bag stays the
# fast default (byte-level, fully vectorized)
# --------------------------------------------------------------------------

import re as _re
import string as _string

_PUNT = _re.escape(",.;:?!()")
_QUOTE = "[\"`']"
_P_ALL = _re.escape(_string.punctuation)
# reference order (LabeledTextCorpus.scanWordSyntax:403-483) — each
# match overwrites `token`, so the LAST matching class wins
_SHAPE_PATTERNS = [
    ("MIXEDCAPS", _re.compile(r"[A-Z][a-z]+[A-Z][A-Za-z]*")),
    ("ALLDIGITS", _re.compile(r"[0-9]+")),
    ("NUMERICAL", _re.compile(r"[-0-9]+[.,]+[0-9.,]+")),
    ("DATE", _re.compile(rf"[0-9]+[{_P_ALL}0-9]+")),
    ("ROMAN", _re.compile(r"[ivxdlcm]+|[IVXDLCM]+")),
    ("MULTIDOTS", _re.compile(r"\.\.+")),
    ("LONELYINITIAL", _re.compile(r"[^\W\d_a-z]\.")),
    ("ABBR", _re.compile(r"[^\W\d_][^\W\d_]+\.")),
    ("SINGLECHARALLCAPS", _re.compile(r"[^\W\d_]")),  # SINGLECHAR
    ("CAPLETTER", _re.compile(r"[A-Z]")),
    ("PUNC", _re.compile(f"[{_PUNT}]")),
    ("QUOTES", _re.compile(f"{_QUOTE}[^\\W\\d_]?")),
    ("ENUM", _re.compile(rf"[0-9]+[{_PUNT}a-z]+")),
    ("NUMRANGE", _re.compile(r"[0-9]+-[0-9]+")),
]
_WORD_RE = _re.compile(r"\w+|[^\w\s]")


def scan_word_syntax(token: str, use_suffix: bool = True) -> list[str]:
    """scanWordSyntax:403-483: regex shape classes replace the token
    (last match wins); un-classed tokens longer than 3 also emit an
    ``s:<last3>`` suffix feature."""
    out_token, used = token, False
    for name, pat in _SHAPE_PATTERNS:
        if pat.fullmatch(token):
            out_token, used = name, True
    feats = []
    if not used and len(token) > 3 and use_suffix:
        feats.append("s:" + token[-3:])
    feats.append(out_token)
    return feats


def reference_features(
    phrase: str,
    pre_tokens: list[str] | None = None,
    post_tokens: list[str] | None = None,
    ngram_sizes: tuple[int, ...] = (1, 2),
    windowsize: int = 3,
) -> list[str]:
    """extractFeatures:293-337 for one entity span: ``i:`` unigrams of
    the span's shape-scanned tokens (useContent), ``a:``/``p:``
    n-grams (joined with ',') over the ±windowsize context
    (useContext). KB-literal training has no context, so pre/post
    default empty — exactly the content-features-only configuration."""
    feats = []
    for tok in _WORD_RE.findall(phrase):
        for f in scan_word_syntax(tok, use_suffix=True):
            feats.append("i:" + f)
    for prefix, ctx, before in (("a:", pre_tokens, True), ("p:", post_tokens, False)):
        if not ctx:
            continue
        # strict |distance| < windowsize ⇒ windowsize−1 neighbors a side
        # (k=0 must yield NO neighbors; ctx[-0:] would be the whole list)
        keep = windowsize - 1
        win = (ctx[-keep:] if keep > 0 else []) if before else ctx[:keep]
        scanned = [f for tok in win for f in scan_word_syntax(tok, use_suffix=False)]
        for n in ngram_sizes:
            m = min(n, len(scanned))  # calculateNgrams:383-401
            if m:
                for i in range(m, len(scanned) + 1):
                    feats.append(prefix + ",".join(scanned[i - m : i]))
    return feats


def _calc_ngrams(n: int, seq: list[str], before: str) -> list[str]:
    """calculateNgrams:383-401: sliding n-grams joined with ',' —
    shorter sequences fall back to their full length."""
    m = min(n, len(seq))
    if not m:
        return []
    return [before + ",".join(seq[i - m : i]) for i in range(m, len(seq) + 1)]


def _scan_word_content(
    word: str,
    pos: str,
    label: str,
    postags: frozenset[str] | set[str],
    type_proportion: float,
) -> list[str]:
    """scanWordContent:349-381, deterministic form: an O-labeled context
    token participates only when its 2-char POS prefix is in ``postags``
    (the reference passes 3-char entries like "NNP" that can never equal
    a 2-char substring — bug-for-bug, we compare the raw prefix against
    the set as given); a LABELED context token contributes its label
    when ``type_proportion`` ≥ 1 (the reference draws Random() ≤ prob —
    only the 0/1 endpoints are deterministic)."""
    if label == "O":
        if len(pos) > 1 and pos[:2] in postags:
            return scan_word_syntax(word, use_suffix=False)
        return []
    if type_proportion >= 1.0:
        return [label]
    return scan_word_syntax(word, use_suffix=False)


def extract_span_features(
    rows: list[tuple[str, str, str]],
    lower: int,
    upper: int,
    ngram_sizes: tuple[int, ...] = (1, 2, 3, 4, 5),
    windowsize: int = 5,
    postags: tuple[str, ...] = ("VB", "ADJ", "NNP", "NN", "NNS"),
    type_proportion: float = 1.0,
) -> list[str]:
    """extractFeatures:293-337 with the FULL context protocol over one
    sentence of (word, pos, label) rows: span tokens → i: unigrams with
    suffixes; ±windowsize context filtered through scanWordContent →
    a:/p: n-grams for every size in ``ngram_sizes``. This is the
    configuration the conll2003 type-prediction experiment uses
    (PredictTypesOnConll2003Experiment.java: ngrams 1-5, window 5)."""
    match_pos = frozenset(postags)
    prefixes: list[str] = []
    infixes: list[str] = []
    postfixes: list[str] = []
    # only rows inside the span or its ±windowsize context can fire a
    # branch below — without this bound a no-blank-line file (one giant
    # "sentence", e.g. conll2003 eng.testa) costs O(|sentence|) per span
    lo = max(0, lower - windowsize + 1)
    hi = min(len(rows), upper + windowsize)
    for i, (word, pos, label) in enumerate(rows[lo:hi], start=lo):
        if i < lower:
            if i - lower > -windowsize:
                prefixes += _scan_word_content(word, pos, label, match_pos, type_proportion)
        elif i <= upper:
            infixes += scan_word_syntax(word, use_suffix=True)
        elif i - upper < windowsize:
            postfixes += _scan_word_content(word, pos, label, match_pos, type_proportion)
    feats: list[str] = []
    for n in ngram_sizes:
        feats += _calc_ngrams(n, prefixes, "a:")
        feats += _calc_ngrams(n, postfixes, "p:")
    feats += _calc_ngrams(1, infixes, "i:")
    return feats


def hash_feature_lists(
    feature_lists: list[list[str]], n_buckets: int = N_BUCKETS
) -> np.ndarray:
    """Arbitrary string-feature bags hashed (FNV-1a over utf-8) into a
    fixed bucket space; L2-normalized rows. Shared by the reference
    featurizer and the conll2003 experiment replay."""
    out = np.zeros((len(feature_lists), n_buckets), dtype=np.float32)
    for r, feats in enumerate(feature_lists):
        for f in feats:
            h = 0xCBF29CE484222325
            for ch in f.encode("utf-8"):
                h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
            out[r, h % n_buckets] += 1.0
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    np.divide(out, norms, out=out, where=norms > 0)
    return out


def fit_maxent(
    x: np.ndarray,
    y: np.ndarray,
    n_classes: int,
    epochs: int = 600,
    lr: float = 5.0,
    l2: float = 1e-5,
    seed: int = 13,
) -> tuple[np.ndarray, np.ndarray]:
    """Full-batch multinomial-logistic gradient descent → (weights,
    bias). The shared trainer behind train_entity_classifier and the
    experiment replays."""
    rng = np.random.default_rng(seed)
    w = (rng.standard_normal((x.shape[1], n_classes)) * 0.01).astype(np.float32)
    b = np.zeros(n_classes, dtype=np.float32)
    onehot = np.eye(n_classes, dtype=np.float32)[y]
    for _ in range(epochs):
        z = x @ w + b
        z -= z.max(axis=1, keepdims=True)
        e = np.exp(z)
        p = e / e.sum(axis=1, keepdims=True)
        g = (p - onehot) / len(y)
        w -= lr * (x.T @ g + l2 * w)
        b -= lr * g.sum(axis=0)
    return w, b


def _featurize_reference(texts: list[str], n_buckets: int) -> np.ndarray:
    """Reference feature strings hashed into the same bag space as the
    char-ngram path; L2-normalized rows."""
    return hash_feature_lists([reference_features(t) for t in texts], n_buckets)


class EntityClassifier:
    """Maxent (multinomial logistic) over hashed features —
    ``featurizer`` ∈ {"char_ngrams" (default, vectorized),
    "reference" (LabeledTextCorpus parity)}; the mode is part of the
    model so inference always matches training."""

    def __init__(
        self,
        weights: np.ndarray,
        bias: np.ndarray,
        classes: list[int],
        featurizer: str = "char_ngrams",
    ):
        if featurizer not in ("char_ngrams", "reference"):
            raise ValueError(f"unknown featurizer: {featurizer!r}")
        self.weights = weights  # (n_buckets, n_classes) float32
        self.bias = bias        # (n_classes,)
        self.classes = classes  # class label per column (cluster/type ids)
        self.featurizer = featurizer

    def _x(self, texts: list[str]) -> np.ndarray:
        if self.featurizer == "reference":
            return _featurize_reference(texts, self.weights.shape[0])
        return _featurize(texts, self.weights.shape[0])

    def predict_proba(self, texts: list[str]) -> np.ndarray:
        z = self._x(texts) @ self.weights + self.bias
        z -= z.max(axis=1, keepdims=True)
        e = np.exp(z)
        return e / e.sum(axis=1, keepdims=True)


def training_pairs(
    kb: KB, type_clusters: DataFrame | None = None, sample_per_class: int = 10000
) -> DataFrame:
    """(literal, cls) training table from the KB: datatype-property
    literals of typed instances; cls = type cluster if a ``type_clusters``
    mapping is given, else the raw rdf:type id. Deterministic per-class
    cap via row_number (reference samples with LIMIT,
    PostgresKB.java:1243-1250)."""
    type_id = kb.rdf_type_id
    types = kb.relations.filter(F.col("p") == type_id).select(
        F.col("s"), F.col("o").alias("cls")
    )
    if type_clusters is not None:
        types = (
            types.join(F.broadcast(type_clusters), types.cls == type_clusters.type)
            .select("s", F.col("cluster").alias("cls"))
        )
    lits = kb.symbols.join(
        kb.literals.withColumnRenamed("id", "lit"), "lit"
    ).select("s", "literal")
    pairs = lits.join(types, "s").select("literal", "cls").distinct()
    # the class-count aggregation below and the main thin+window scan
    # are two consumers of this join+distinct subtree — the expensive
    # part of the whole function at dictionary scale. A lazy local
    # checkpoint materializes it once on first use (executor-local
    # MEMORY_AND_DISK blocks) instead of recomputing the joins twice.
    pairs = pairs.localCheckpoint(eager=False)
    # skew guard: the row_number window sorts each class inside ONE
    # task, so a hot class (10^7 Person literals at DBpedia scale) must
    # be thinned BEFORE the window. A deterministic hash filter keeps
    # ~4× the cap per oversized class (binomial spread at that count is
    # a few permille — never starves the cap); classes at ≤ 4×cap pass
    # untouched, so small-KB outputs are byte-identical to the uncapped
    # ordering. Cap semantics stay deterministic: first `sample_per_
    # class` by literal order among hash-kept rows.
    counts = pairs.groupBy("cls").agg(F.count("*").alias("n_cls"))
    thin_k = F.greatest(
        F.lit(1).cast("long"),
        F.floor(F.col("n_cls") / (4 * sample_per_class)).cast("long"),
    )
    pairs = (
        pairs.join(F.broadcast(counts), "cls")
        .filter(F.pmod(F.xxhash64("literal"), thin_k) == 0)
        .select("literal", "cls")
    )
    w = Window.partitionBy("cls").orderBy("literal")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= sample_per_class)
        .drop("rn")
    )


def train_entity_classifier(
    pairs: DataFrame,
    n_buckets: int = N_BUCKETS,
    epochs: int = 600,
    lr: float = 5.0,
    l2: float = 1e-5,
    seed: int = 13,
    featurizer: str = "char_ngrams",
) -> EntityClassifier:
    """Full-batch gradient maxent on collected (literal, cls) pairs.

    Driver-side on purpose: the training set is dictionary-scale and
    per-class capped upstream; the expensive corpus side never touches
    the driver."""
    if featurizer not in ("char_ngrams", "reference"):
        raise ValueError(f"unknown featurizer: {featurizer!r}")
    rows = pairs.collect()
    texts = [r["literal"] for r in rows]
    labels = [r["cls"] for r in rows]
    classes = sorted(set(labels))
    cindex = {c: j for j, c in enumerate(classes)}
    y = np.array([cindex[l] for l in labels], dtype=np.int64)
    x = (
        _featurize_reference(texts, n_buckets)
        if featurizer == "reference"
        else _featurize(texts, n_buckets)
    )

    w, b = fit_maxent(x, y, len(classes), epochs=epochs, lr=lr, l2=l2, seed=seed)
    return EntityClassifier(w, b, classes, featurizer=featurizer)


CLASSIFIED_SCHEMA = (
    "doc_id long, begin int, end int, phrase string, cls long, "
    "prob double, margin double"
)


def classify_phrases(
    phrases: DataFrame,
    model: EntityClassifier,
    margin: float = 0.6,
) -> DataFrame:
    """Classify (doc_id, begin, end, phrase) rows; keep predictions whose
    top1−top2 probability margin exceeds ``margin`` (reference threshold
    0.6, EntityClassification.java:56-147). Arrow-batched; the weight
    matrix ships once per executor in the UDF closure (a few MB)."""
    cols = phrases.select("doc_id", "begin", "end", "phrase")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            p = model.predict_proba(pdf["phrase"].tolist())
            order = np.argsort(-p, axis=1)
            top1 = p[np.arange(len(p)), order[:, 0]]
            top2 = p[np.arange(len(p)), order[:, 1]] if p.shape[1] > 1 else np.zeros(len(p))
            m = top1 - top2
            keep = m > margin
            if not keep.any():
                continue
            cls = np.array(model.classes)[order[:, 0]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values[keep],
                    "begin": pdf["begin"].values[keep],
                    "end": pdf["end"].values[keep],
                    "phrase": pdf["phrase"].values[keep],
                    "cls": cls[keep].astype("int64"),
                    "prob": top1[keep].astype("float64"),
                    "margin": m[keep].astype("float64"),
                }
            )

    return cols.mapInPandas(gen, CLASSIFIED_SCHEMA)
