"""Literal prefix hashing — bit-exact Java ``String.hashCode`` parity.

The reference buckets gazetteer literals by the Java hashCode of their
first 4 characters (reference: ``transducer/model/LiteralHashing.java:15-21``,
applied to the *lowercased* literal at ``connection/RDFTripleParser.java:295``;
the document side probes with both the lowercased and the original-case
token prefix, ``transducer/model/SuffixArray.java:114-117``).

This hash is the equi-join key between document token prefixes and KB
literals, so it must be bit-identical. Golden parity values from the
reference's frozen HSQL image (``scoobie/testdb.script:31-32``):
``hash('Camp') == 2092705``, ``hash('Perc') == 2483974``.

Java semantics: ``h = s[0]*31^(n-1) + ... + s[n-1]`` over UTF-16 code
units with 32-bit signed wraparound, and the "4-char prefix" is
``substring(0, 4)`` — the first 4 UNITS. For a 4-unit prefix the
unwrapped value fits a LONG (max ~2.02e9), so the whole thing is a
pure Column expression — JVM-side, codegen'd, no UDF. ``ascii()``
returns the code POINT of a character, which equals its UTF-16 unit
for the BMP; prefixes containing supplementary-plane characters take a
surrogate-expansion Column branch so the KB-side bucket key and the
document-side probe (:func:`java_hash_prefix_py`) agree for every
input — a divergence here silently un-spots every literal it touches,
because the gazetteer equi-join key never matches.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PREFIX_LEN = 4
_TWO_31 = 2_147_483_648
_TWO_32 = 4_294_967_296


def _wrap32(h: Column) -> Column:
    return (F.pmod(h + _TWO_31, F.lit(_TWO_32)) - _TWO_31).cast("int")


def _utf16_units_col(ch: Column) -> Column:
    """UTF-16 code units of a single-character string column (1 unit
    for BMP, surrogate pair for supplementary)."""
    cp = F.ascii(ch).cast("long")
    hi = (F.lit(0xD800).cast("long") + F.floor((cp - 0x10000) / 1024)).cast("long")
    lo = (F.lit(0xDC00).cast("long") + F.pmod(cp - 0x10000, F.lit(1024))).cast("long")
    return F.when(cp < 0x10000, F.array(cp)).otherwise(F.array(hi, lo))


def java_hash_prefix(col: Column | str, length: int = PREFIX_LEN) -> Column:
    """Java String.hashCode of ``s.substring(0, length)`` — which in
    Java is the first ``length`` UTF-16 CODE UNITS, not code points
    (LiteralHashing.java:15-21 hashes exactly that). Spark string
    functions are code-point based, so the common all-BMP case (where
    units == code points) takes the 4-ascii fast path, and a prefix
    containing a supplementary character falls to a surrogate-expansion
    branch; both are pure Column expressions. The doc side
    (:func:`java_hash_prefix_py`) implements the identical unit
    semantics, so the gazetteer equi-join key agrees for every
    character, not just the BMP."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.lit(0).cast("long")
    any_supp = F.lit(False)
    for i in range(1, length + 1):
        code = F.ascii(F.substring(c, i, 1)).cast("long")
        any_supp = any_supp | (F.length(c) >= i) & (code >= 0x10000)
        h = F.when(F.length(c) >= i, h * 31 + code).otherwise(h)
    # supplementary path: expand the first `length` code points to
    # UTF-16 units, hash the first `length` units (covers the short-
    # string case too: < `length` code points can still carry ≥
    # `length` units when pairs are present, exactly like Java's
    # substring)
    units = F.flatten(
        F.transform(F.slice(F.split(c, ""), 1, length), _utf16_units_col)
    )
    u = F.slice(units, 1, length)
    h_supp = F.aggregate(
        u, F.lit(0).cast("long"), lambda acc, x: acc * 31 + x
    )
    return F.when(any_supp, _wrap32(h_supp)).otherwise(_wrap32(h))


def literal_prefix_hash(col: Column | str) -> Column:
    """KB-side bucket key: hash of the lowercased 4-char prefix
    (reference RDFTripleParser.java:295)."""
    c = F.col(col) if isinstance(col, str) else col
    return java_hash_prefix(F.lower(c))


def java_hash_py(s: str) -> int:
    """Pure-python Java String.hashCode (for tests / fixtures)."""
    h = 0
    for ch in s:
        for unit in _utf16_units(ch):
            h = (h * 31 + unit) & 0xFFFFFFFF
    return h - _TWO_32 if h >= _TWO_31 else h


def _utf16_units(ch: str) -> list[int]:
    b = ch.encode("utf-16-be")
    return [int.from_bytes(b[i : i + 2], "big") for i in range(0, len(b), 2)]


def java_hash_prefix_py(s: str, length: int = PREFIX_LEN) -> int:
    """Java ``s.substring(0, length).hashCode()`` — the prefix is the
    first ``length`` UTF-16 UNITS (Java substring semantics), matching
    :func:`java_hash_prefix`'s Column twin bit-for-bit. ``s[:length]``
    (code points) would hash up to 2×length units when supplementary
    characters are present and diverge from both Java and the KB-side
    bucket key."""
    units = [u for ch in s[:length] for u in _utf16_units(ch)][:length]
    h = 0
    for u in units:
        h = (h * 31 + u) & 0xFFFFFFFF
    return h - _TWO_32 if h >= _TWO_31 else h
