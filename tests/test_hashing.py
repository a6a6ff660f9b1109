"""A3 parity: Java String.hashCode golden values from the reference's
frozen HSQL image (scoobie/testdb.script:31-32)."""

from pyspark.sql import functions as F

from scoobie_spark.hashing import java_hash_prefix, java_hash_prefix_py, literal_prefix_hash


def test_golden_values_py():
    # testdb.script stores the original-case prefix hash
    assert java_hash_prefix_py("Camp Halfblood") == 2092705
    assert java_hash_prefix_py("Percy Jackson") == 2483974
    # ETL path (RDFTripleParser.java:295) hashes the lowercased literal
    assert java_hash_prefix_py("camp halfblood") == 3046017


def test_short_and_empty_py():
    # < 4 chars → hash of the whole string (LiteralHashing.java:17-20)
    assert java_hash_prefix_py("ab") == 31 * ord("a") + ord("b")
    assert java_hash_prefix_py("") == 0


def test_expression_matches_python(spark):
    vals = ["Camp Halfblood", "Percy Jackson", "ab", "", "ü-umlaut", "Xx", "1234five",
            "    ", "Ωmega symbols", "mixedCASE Prefix"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {
        r["s"]: (r["h"], r["hl"])
        for r in df.select(
            "s",
            java_hash_prefix("s").alias("h"),
            literal_prefix_hash("s").alias("hl"),
        ).collect()
    }
    for v in vals:
        assert got[v][0] == java_hash_prefix_py(v), v
        assert got[v][1] == java_hash_prefix_py(v.lower()), v


def test_negative_wraparound(spark):
    # a value whose unwrapped hash exceeds 2^31 must wrap negative like Java
    s = "zzzz"
    expected = java_hash_prefix_py(s)
    df = spark.createDataFrame([(s,)], "s string")
    assert df.select(java_hash_prefix("s").alias("h")).first()["h"] == expected
    h = 0
    for c in s:
        h = h * 31 + ord(c)
    assert expected == (h & 0xFFFFFFFF) - (1 << 32) if (h & 0xFFFFFFFF) >= (1 << 31) else True


def test_supplementary_plane_units(spark):
    """Java's substring(0,4) is UTF-16-UNIT based: a supplementary char
    counts as TWO units (and a pair can even be split by the cut). Both
    the Column expression and the python twin must implement that — the
    pre-fix code-point forms disagreed between the KB-side bucket key
    and the doc-side probe, silently un-spotting affected literals."""
    from scoobie_spark.hashing import _TWO_31, _TWO_32, _utf16_units

    def java_truth(s, length=4):
        units = [u for ch in s for u in _utf16_units(ch)][:length]
        h = 0
        for u in units:
            h = (h * 31 + u) & 0xFFFFFFFF
        return h - _TWO_32 if h >= _TWO_31 else h

    vals = [
        "\U0001F600xyz",            # pair first, then BMP
        "x\U0001F600y",             # pair split by the 4-unit cut
        "\U0001F600\U0001F601",     # two pairs = exactly 4 units
        "ab\U0001F600",             # 4 units, pair at the end
        "abc\U0001F600zz",          # pair straddles the cut boundary
        "\U00020000",               # lone supplementary (2 units < 4)
        "\U00020000abc",
        "é\U0001F600a",
    ]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", java_hash_prefix("s").alias("h")).collect()}
    for v in vals:
        assert java_hash_prefix_py(v) == java_truth(v), v
        assert got[v] == java_truth(v), v
