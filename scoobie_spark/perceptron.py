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

Scale note: inference is per-token Python dict scoring inside an Arrow
batch — the honest slow path. The flagship pipeline does not run it
(its NP filter uses the capitalization signal); this layer exists for
reference parity and for corpora where chunk quality matters more than
throughput.
"""

from __future__ import annotations

import gzip
import json
import os
from collections.abc import Iterator

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
    correct / total over every token of the held-out file."""
    correct = total = 0
    for s in sents:
        words = [w for w, _, _ in s]
        tags = [t for _, t, _ in s]
        if layer == "pos":
            pred, gold = tag_sentence(model, words), tags
        else:
            pred, gold = chunk_sentence(model, words, tags, window), [c for _, _, c in s]
        correct += sum(p == g for p, g in zip(pred, gold))
        total += len(gold)
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
    for s in sents:
        words = [w for w, _, _ in s]
        tags = [t for _, t, _ in s]
        gold = _np_spans([c for _, _, c in s])
        pred = _np_spans(chunk_sentence(model, words, tags, window))
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

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = _load(pos_path)
        for pdf in batches:
            texts = _normalize_series(pdf["content"])
            rows = {k: [] for k in ("doc_id", "start", "end", "sent_id", "word", "pos")}
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
                    tags = tag_sentence(model, [w for _, _, w, _ in sent])
                    for (s, e, w, sid_), p in zip(sent, tags):
                        rows["doc_id"].append(doc_id)
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
        model = _load(chunk_path)
        outs = []
        for (_, _), g in batch.groupby(["doc_id", "sent_id"], sort=True):
            g = g.sort_values("start")
            pred = chunk_sentence(
                model, g["word"].tolist(), g["pos"].tolist(), window
            )
            g = g.copy()
            g["np"] = [p if p in ("B-NP", "I-NP") else "O" for p in pred]
            outs.append(g)
        return pd.concat(outs, ignore_index=True) if outs else batch.iloc[:0].assign(np="")

    cols = ["doc_id", "start", "end", "sent_id", "word", "pos"]
    return grouped_apply(
        tagged.select(*cols), "doc_id", run, NP_SCHEMA, batch_mode=True
    )
