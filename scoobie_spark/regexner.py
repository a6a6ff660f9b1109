"""Regex entity recognition — SURVEY.md §2 B13.

Reference (``transducer/RegularStructuredEntityRecognition.java:43-72``):
run configured regexes over the plain text, BIO-tag matching token
spans on the ``regex`` layer; the regex→property mapping comes from the
A16 ``literals_regex_distribution`` statistics. Patterns below mirror
the reference's experiment set (QueryExperiment.java:159-166).

Spark form: ``regexp_extract_all`` cannot return offsets, so matches
are found with a vectorized pandas pass (same Arrow batch style as
tokenization) emitting (doc_id, begin, end, regex_name, value).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

DEFAULT_PATTERNS = {
    "DATE": r"\b\d{4}-\d{2}-\d{2}\b",
    "MAIL": r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b",
    "ISBN": r"\b\d{9}[\dXx]\b",
    "FLOAT": r"-?\b\d+\.\d+\b",
    "POINT": r"-?\b\d+\.\d+\s*,\s*-?\d+\.\d+\b",
}

SCHEMA = "doc_id long, begin int, end int, regex string, value string"


def regex_entities(docs: DataFrame, patterns: dict[str, str] | None = None) -> DataFrame:
    """(doc_id, content) → regex entity spans.

    Scans the NORMALIZED text (the same length-preserving HTML-blanking
    every other extraction layer sees, textproc._normalize_series) so
    emitted offsets line up with the token layer and spans never land
    inside markup the pipeline deliberately blanked out."""
    from .textproc import _normalize_series

    pats = {k: re.compile(v) for k, v in (patterns or DEFAULT_PATTERNS).items()}
    cols = docs.select("doc_id", "content")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc, a, b, name, val = [], [], [], [], []
            texts = _normalize_series(pdf["content"])
            for doc_id, text in zip(pdf["doc_id"].values, texts.values):
                for n, rx in pats.items():
                    for m in rx.finditer(text):
                        doc.append(doc_id)
                        a.append(m.start())
                        b.append(m.end())
                        name.append(n)
                        val.append(m.group())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(doc, dtype="int64"),
                    "begin": pd.Series(a, dtype="int32"),
                    "end": pd.Series(b, dtype="int32"),
                    "regex": pd.Series(name, dtype="object"),
                    "value": pd.Series(val, dtype="object"),
                }
            )

    return cols.mapInPandas(gen, SCHEMA)
