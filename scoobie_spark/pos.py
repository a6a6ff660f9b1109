"""POS tagging + noun-phrase chunking — SURVEY.md §2 B5/B6.

The reference uses an OpenNLP maxent tagger (``transducer/POSTagging.
java:46-60``) and a Mallet CRF chunker (``transducer/
ProperNameRecognition.java`` + ``model/NounPhraseChunker.java``); both
are model artifacts this container cannot ship. We implement the same
*layers* with deterministic rule systems:

* ``pos_tag`` — a closed-class lexicon + suffix-heuristic tagger over
  the tokens table (Arrow-batched), emitting the reference's ``pos``
  annotation layer.
* ``np_chunks`` — a regex grammar over the POS layer
  (``DT? (JJ|CD)* (NN|NNS|NNP)+`` — no possessive-pronoun rule: the
  heuristic tagger folds possessives into PRP, which is deliberately
  not NP-able; the TRAINED chunker is the quality path for such
  phrases) emitting B-NP/I-NP tags, and
  ``noun_phrases`` stitching them into spans with the running-sum
  window trick (Document.getNounPhrases tolerates a leading I-NP,
  Document.java:493-530 — same here: an I following O starts a phrase).

In the reference's default pipeline the chunker's only effect on
extraction is *filtering which token starts feed the suffix array*
(SuffixArrayBuilder.filterNounPhrases); our pipeline exposes that as
``PipelineConfig.np_candidate_filter`` using the cheap capitalization
form of the same signal.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DET = {"the", "a", "an", "this", "that", "these", "those"}
_PREP = {"in", "on", "at", "of", "to", "for", "with", "by", "from", "near", "over"}
_PRON = {"he", "she", "it", "they", "we", "you", "i", "his", "her", "its", "their"}
_CONJ = {"and", "or", "but", "nor"}
_AUX = {"is", "are", "was", "were", "be", "been", "am", "has", "have", "had", "do", "does", "did"}

POS_SCHEMA = "doc_id long, start int, end int, sent_id int, word string, pos string"


def _tag_word(w: str, prev_pos: str) -> str:
    lw = w.lower()
    if not w:
        return "X"
    if lw in _DET:
        return "DT"
    if lw in _PREP:
        return "IN"
    if lw in _PRON:
        return "PRP"
    if lw in _CONJ:
        return "CC"
    if lw in _AUX:
        return "VBZ"
    if re.fullmatch(r"-?\d+([.,]\d+)?", w):
        return "CD"
    if not w[0].isalnum():
        return "."
    if w[0].isupper():
        return "NNP"
    if lw.endswith("ly"):
        return "RB"
    if lw.endswith(("ing", "ed")) and prev_pos in ("VBZ", "PRP", "NNP", "NN"):
        return "VBG"
    if lw.endswith(("ous", "ful", "ive", "able", "al", "ic")):
        return "JJ"
    if lw.endswith("s") and len(lw) > 3:
        # subject-verb heuristic: an s-form directly after a completed
        # nominal ("Fox jumps", "Percy Jackson trains") is 3sg verb
        return "VBZ" if prev_pos in ("NNP", "NN", "PRP") else "NNS"
    return "NN"


def pos_tag(docs: DataFrame) -> DataFrame:
    """(doc_id, content) → token rows with POS tags (B5 layer)."""
    from .textproc import _SENT_RE, _TOKEN_RE, _normalize_series

    cols = docs.select("doc_id", "content")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = _normalize_series(pdf["content"])
            rows = {k: [] for k in ("doc_id", "start", "end", "sent_id", "word", "pos")}
            for doc_id, text in zip(pdf["doc_id"].values, texts.values):
                bounds = [m.end() for m in _SENT_RE.finditer(text)]
                bi = sid = 0
                prev = "."
                for m in _TOKEN_RE.finditer(text):
                    while bi < len(bounds) and m.start() >= bounds[bi]:
                        bi += 1
                        sid += 1
                        prev = "."
                    w = m.group()
                    p = _tag_word(w, prev)
                    prev = p
                    rows["doc_id"].append(doc_id)
                    rows["start"].append(m.start())
                    rows["end"].append(m.end())
                    rows["sent_id"].append(sid)
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


_NP_START = {"DT", "JJ", "NN", "NNS", "NNP", "CD"}
_NP_CONT = {"JJ", "NN", "NNS", "NNP", "CD"}


def np_chunks(tagged: DataFrame) -> DataFrame:
    """B6: BIO NP tags over the POS layer — window implementation
    (lag over (doc, sent) ordered by start): B-NP where an NP-able tag
    follows a non-NP context, I-NP continuation, O otherwise."""
    w = Window.partitionBy("doc_id", "sent_id").orderBy("start")
    prev = F.lag("pos").over(w)
    is_np = F.col("pos").isin(*_NP_START)
    prev_np = prev.isin(*_NP_CONT) | prev.isin("DT")
    tag = (
        F.when(~is_np, "O")
        .when(prev_np & F.col("pos").isin(*_NP_CONT), "I-NP")
        .otherwise("B-NP")
    )
    return tagged.withColumn("np", tag)


def token_phrase_frequency(chunked: DataFrame) -> DataFrame:
    """Per-document token/phrase statistics — the five columns of the
    reference's ``token_phrase_frequency_*.csv``
    (PhraseExperiment.analyseTokenPhraseFrequencies,
    PhraseExperiment.java:165-260): tokens in doc, noun phrases in doc,
    tokens inside NPs, distinct tokens inside NPs, distinct tokens in
    doc. Input is the BIO-chunked layer (rule or trained).

    One scan of the chunked layer: phrase starts are flagged with the
    same lag-window expression :func:`noun_phrases` stitches with
    (B-NP, or I-NP after O/sentence start), then everything reduces in
    a single aggregation — the chunker Arrow pass never runs twice.
    """
    w = Window.partitionBy("doc_id", "sent_id").orderBy("start")
    prev_np = F.lag("np").over(w)
    new_phrase = (F.col("np") == "B-NP") | (
        (F.col("np") == "I-NP") & (prev_np.isNull() | (prev_np == "O"))
    )
    np_word = F.when(F.col("np") != "O", F.col("word"))
    flagged = chunked.withColumn("_np_start", new_phrase.cast("long"))
    return flagged.groupBy("doc_id").agg(
        F.count("*").alias("tokens"),
        F.sum("_np_start").alias("noun_phrases"),
        F.sum((F.col("np") != "O").cast("long")).alias("tokens_in_nps"),
        F.countDistinct(np_word).alias("distinct_tokens_in_nps"),
        F.countDistinct("word").alias("distinct_tokens"),
    )


def noun_phrases(chunked: DataFrame) -> DataFrame:
    """Stitch B/I tags into phrase spans (Document.getNounPhrases,
    Document.java:493-530): running-sum sessionization — a phrase id
    increments on every B-NP *or* on an I-NP that follows O/start
    (the reference tolerates leading I-NP)."""
    w = Window.partitionBy("doc_id", "sent_id").orderBy("start")
    prev_np = F.lag("np").over(w)
    new_phrase = (F.col("np") == "B-NP") | (
        (F.col("np") == "I-NP") & (prev_np.isNull() | (prev_np == "O"))
    )
    # phrase ids must be computed BEFORE dropping O rows, else an O gap
    # between two phrases disappears and they merge
    pid = F.sum(new_phrase.cast("int")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    inside = chunked.withColumn("phrase_id", pid).filter(F.col("np") != "O")
    # collect_list order after an exchange is NOT contractual — sort the
    # collected (start, word) structs explicitly before joining words
    words_sorted = F.transform(
        F.array_sort(F.collect_list(F.struct("start", "word"))),
        lambda s: s["word"],
    )
    return inside.groupBy("doc_id", "sent_id", "phrase_id").agg(
        F.min("start").alias("begin"),
        F.max("end").alias("end"),
        F.array_join(words_sorted, " ").alias("phrase"),
    )
