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
