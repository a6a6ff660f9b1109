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
units with 32-bit signed wraparound. For a ≤4-char prefix the unwrapped
value fits a LONG (max ~2.02e9 per BMP char), so the whole thing is a
pure Column expression — JVM-side, codegen'd, no UDF. ``ascii()``
returns the code point of the first character, which equals the UTF-16
unit for all BMP characters (supplementary-plane characters in the
first 4 chars of a gazetteer literal do not occur in the reference
corpora; a pandas fallback is provided for exactness tests).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PREFIX_LEN = 4
_TWO_31 = 2_147_483_648
_TWO_32 = 4_294_967_296


def java_hash_prefix(col: Column | str, length: int = PREFIX_LEN) -> Column:
    """Java String.hashCode of the first ``length`` chars of ``col``."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.lit(0).cast("long")
    for i in range(1, length + 1):
        code = F.ascii(F.substring(c, i, 1)).cast("long")
        h = F.when(F.length(c) >= i, h * 31 + code).otherwise(h)
    # wrap to 32-bit signed int, Java-style
    return (F.pmod(h + _TWO_31, F.lit(_TWO_32)) - _TWO_31).cast("int")


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
    return java_hash_py(s[:length])
