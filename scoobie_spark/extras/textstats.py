"""Text analysis operators: language ID, quality scoring, token
counting, document fingerprinting.

Everything here is either a pure Column expression (quality, token
counts — JVM-side, whole-stage-codegen'd, DuckDB-oracle-friendly) or an
Arrow-batched numpy pass (language ID, fingerprints).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny built-in stopword lists → n-gram-free language heuristic that
# needs no model artifacts (containers ship no NLP libs)
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "with", "was", "on"},
    "de": {"der", "die", "das", "und", "ist", "von", "mit", "für", "auf", "nicht", "ein", "zu"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "es", "por", "con", "para"},
    "fr": {"le", "la", "de", "et", "un", "une", "est", "pour", "que", "dans", "les", "des"},
}


def quality_scores(docs: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """Per-doc quality signals, all Column expressions:
    n_chars, n_tokens (whitespace), alpha_ratio, punct_ratio,
    stopword_ratio (en), mean_token_len, upper_ratio."""
    t = F.col(text)
    toks = F.split(F.trim(t), r"\s+")
    n_tokens = F.when(F.length(F.trim(t)) == 0, 0).otherwise(F.size(toks))
    alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    digits = F.length(F.regexp_replace(t, r"[^0-9]", ""))
    punct = F.length(F.regexp_replace(t, r"[^.,;:!?'\"()\[\]{}-]", ""))
    upper = F.length(F.regexp_replace(t, r"[^A-Z]", ""))
    stop_list = F.array(*[F.lit(w) for w in sorted(_STOPWORDS["en"])])
    n_stop = F.size(
        F.filter(F.transform(toks, lambda x: F.lower(x)), lambda x: F.array_contains(stop_list, x))
    )
    return docs.select(
        F.col(key).alias("doc_id"),
        F.length(t).alias("n_chars"),
        n_tokens.cast("int").alias("n_tokens"),
        (alpha / F.greatest(F.length(t), F.lit(1))).alias("alpha_ratio"),
        (digits / F.greatest(F.length(t), F.lit(1))).alias("digit_ratio"),
        (punct / F.greatest(F.length(t), F.lit(1))).alias("punct_ratio"),
        (upper / F.greatest(F.length(t), F.lit(1))).alias("upper_ratio"),
        (n_stop / F.greatest(n_tokens, F.lit(1))).alias("stopword_ratio"),
        (F.length(F.regexp_replace(t, r"\s+", "")) / F.greatest(n_tokens, F.lit(1))).alias(
            "mean_token_len"
        ),
    )


def token_counts(docs: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """Whitespace tokens + a BPE-ish subword proxy count (word chars
    split into runs of ≤4 + residual punctuation), both JVM-side."""
    t = F.col(text)
    ws = F.when(F.length(F.trim(t)) == 0, 0).otherwise(F.size(F.split(F.trim(t), r"\s+")))
    # BPE-ish: every ≤4-char chunk of each word-char run + each non-space symbol
    word_chars = F.length(F.regexp_replace(t, r"[^\w]", ""))
    symbols = F.length(F.regexp_replace(t, r"[\w\s]", ""))
    bpe = F.ceil(word_chars / 4) + symbols
    return docs.select(
        F.col(key).alias("doc_id"),
        ws.cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("bpe_tokens"),
    )


def language_id(docs: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """Stopword-vote language guess (B2-equivalent; reference used Nutch
    LanguageIdentifier, LanguageIdentification.java:55-84). Arrow-batched;
    'und' when nothing votes."""
    cols = docs.select(F.col(key).alias("doc_id"), F.col(text).alias("text"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            langs = []
            for t in pdf["text"].values:
                toks = set(t.lower().split())
                best, best_n = "und", 0
                for lang, sw in _STOPWORDS.items():
                    n = len(toks & sw)
                    if n > best_n:
                        best, best_n = lang, n
                langs.append(best)
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "lang_guess": langs})

    return cols.mapInPandas(gen, "doc_id long, lang_guess string")


def fingerprints(
    docs: DataFrame, window: int = 8, key: str = "doc_id", text: str = "text"
) -> DataFrame:
    """Winnowing-style document fingerprint: rolling polynomial hash over
    normalized tokens, keep the min hash of every ``window`` positions →
    (doc_id, fingerprint array<long>, fp_count). Arrow-batched."""
    cols = docs.select(F.col(key).alias("doc_id"), F.col(text).alias("text"))
    B, M = 1_000_003, (1 << 61) - 1

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps, counts = [], [], []
            for doc_id, t in zip(pdf["doc_id"].values, pdf["text"].values):
                toks = t.lower().split()
                hs = []
                h = 0
                for tok in toks:
                    th = 0
                    for ch in tok.encode("utf-8"):
                        th = (th * B + ch) % M
                    h = (h * B + th) % M
                    hs.append(h)
                mins = sorted(
                    {min(hs[i : i + window]) for i in range(0, max(len(hs) - window + 1, 1))}
                ) if hs else []
                ids.append(doc_id)
                fps.append(mins)
                counts.append(len(mins))
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "fingerprint": pd.Series(fps, dtype="object"),
                 "fp_count": pd.Series(counts, dtype="int32")}
            )

    return cols.mapInPandas(gen, "doc_id long, fingerprint array<long>, fp_count int")
