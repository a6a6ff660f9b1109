"""PII redaction for training-data pipelines.

The standard pre-training hygiene pass (public spec: the C4 /
RefinedWeb / Dolma cleanup recipes): find emails, IPv4 addresses and
phone-number shapes and replace them with typed placeholder tokens,
keeping per-document match counts for downstream filtering stats.

Everything is pure Column expressions (``regexp_replace`` /
``regexp_count``) — JVM-side, whole-stage-codegen'd, zero Python in
the hot path, so the 100 TB shape is a narrow map-only pass that
Catalyst fuses with the enclosing scan. The patterns deliberately use
only the regex subset with identical semantics in Java's engine
(Spark) and RE2 (DuckDB) — character classes, bounded/unbounded
repetition, ``\\b`` — no backreferences or lookaround, so the whole
operator replays as a DuckDB value oracle (queries.SQL_PII).

Categories are applied in a fixed order (email → ipv4 → phone), each
counting on the previous stage's output, so a digit run inside an
email is never double-reported as a phone number. Both engines use
leftmost-first greedy matching for this subset, making the redacted
text byte-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# order matters: each stage counts + redacts on the previous output
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phones", r"\+?\d[\d()\- ]{6,}\d", "[PHONE]"),
]


def redact_pii(docs: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """Per-doc ``(doc_id, n_emails, n_ipv4, n_phones, redacted)``.

    Counts are computed on the text as it stands *before* that
    category's replacement (so overlapping shapes resolve by the fixed
    category order), and every count is a long for schema stability.
    NULL text counts as empty (the extras-family contract — a bare
    regexp_count(NULL) would emit NULL counts that downstream
    threshold filters silently drop).
    """
    cur = F.coalesce(F.col(text), F.lit(""))
    cols = [F.col(key).alias("doc_id")]
    for name, pat, rep in PII_PATTERNS:
        cols.append(F.regexp_count(cur, F.lit(pat)).cast("long").alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, rep)
    cols.append(cur.alias("redacted"))
    return docs.select(*cols)
