"""KB construction ETL — SURVEY.md §2 A1-A10, one declarative job.

Reference flow (``PostgresKB.preprocessRdfData``, PostgresKB.java:893-903):
stream-parse RDF dumps → cleanse → CSV staging → SQL dictionary build →
dictionary-encode fact tables → indexes. Here the whole chain is a
linear DataFrame plan: parse (vectorized regex) → Column-expression
cleansing → two ``distinct + row_number`` dictionary builds → two
multi-way encode joins → partitioned write. Catalyst handles pushdown
and AQE picks broadcast vs sort-merge for the encode joins based on
actual dictionary size.

Determinism: the reference uses Postgres SERIAL ids (load-order
dependent); we assign ids with ``row_number() OVER (ORDER BY uri)``
so the same input always yields the same encoding on any cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..hashing import literal_prefix_hash
from .model import KB

MAX_URI_LEN = 120      # RDFTripleParser.java:205-215
MIN_LITERAL_LEN = 2    # RDFTripleParser.java:229-234
MAX_LITERAL_LEN = 100

# N-Triples line: <s> <p> <o> .   |   <s> <p> "literal"(^^type|@lang)? .
_NT_RE = r'^\s*<([^>]*)>\s+<([^>]*)>\s+(?:<([^>]*)>|"((?:[^"\\]|\\.)*)"[^\s]*)\s*\.\s*$'


def parse_ntriples(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """A1 + A4: scan N-Triples dumps (gz/bz2 transparently via
    spark.read.text) and split by object kind — object-property triples
    vs datatype-property (literal) triples, two outputs
    (RDFTripleParser.java:221-240) → (object_triples(s,p,o),
    datatype_triples(s,p,literal)).

    Reference: streaming Sesame RIO parse with a thread per dump
    (RDFTripleParser.java:131-380); here one distributed text scan —
    stage parallelism replaces the hand-rolled thread pool (SURVEY §4 O7).
    """
    lines = spark.read.text(path)
    # ONE regex pass per line (four regexp_extract calls would run four
    # independent matcher passes of the same ~70-char pattern over every
    # line — the dominant per-line cost on a 10^9-line dump): pack the
    # groups into a \x01-separated string, then split. The separator
    # cannot collide: N-Triples forbids raw control chars in both
    # IRIREF (U+00-U+20 excluded) and literals (must be \u-escaped).
    # A matched line always differs from its packed form (the <> are
    # stripped), so `packed != value` IS the match test; size(g)=4
    # additionally drops grammar-violating lines a raw control char
    # would have smuggled extra separators into.
    packed = F.regexp_replace(F.col("value"), _NT_RE, "$1\x01$2\x01$3\x01$4")
    parsed = (
        lines.select(packed.alias("m"), "value")
        .filter(F.col("m") != F.col("value"))
        .select(F.split("m", "\x01", -1).alias("g"))
        .filter((F.size("g") == 4) & (F.col("g")[0] != ""))
        .select(
            F.col("g")[0].alias("s"),
            F.col("g")[1].alias("p"),
            F.col("g")[2].alias("o"),
            F.col("g")[3].alias("lit_raw"),
        )
    )
    obj = parsed.filter(F.col("o") != "").select("s", "p", "o")
    # exact N-Triples unescape (\" \n \t \r \\ → the actual chars,
    # matching rdfio._unescape): \\ folds FIRST through a \x00 sentinel
    # so "\\n" yields backslash+n, not a newline — the sentinel cannot
    # collide because N-Triples forbids raw control chars in literals
    # (they must appear escaped). A naive $1 backreference would turn
    # \n into the LETTER n, injecting spurious letters into every
    # literal the reference's parser gives a control char (which the
    # cleansing stage then strips entirely).
    lit = F.regexp_replace(F.col("lit_raw"), r"\\\\", "\x00")
    lit = F.regexp_replace(lit, r"\\n", "\n")
    lit = F.regexp_replace(lit, r"\\t", "\t")
    lit = F.regexp_replace(lit, r"\\r", "\r")
    lit = F.regexp_replace(lit, r"\\\"", '"')
    lit = F.replace(lit, F.lit("\x00"), F.lit("\\"))
    dat = (
        parsed.filter((F.col("o") == "") & (F.col("lit_raw") != ""))
        .select("s", "p", lit.alias("literal"))
    )
    return obj, dat


# characters java.net.URI rejects in RFC-2396 URIs → percent encoding
# (reference fixJavaURI, RDFTripleParser.java:256-273, encodes exactly
# the chars that make `new java.net.URI(uri)` throw, one at a time; a
# static char map is the vectorizable equivalent)
_BAD_URI_CHARS = [
    (" ", "%20"), ('"', "%22"), ("<", "%3C"), (">", "%3E"), ("[", "%5B"),
    ("\\", "%5C"), ("]", "%5D"), ("^", "%5E"), ("`", "%60"), ("{", "%7B"),
    ("|", "%7C"), ("}", "%7D"),
]


def fix_uri(c):
    """A2 (fixJavaURI): percent-encode URI-invalid characters, pure
    Column expression (chained replaces — no UDF)."""
    out = c
    for ch, enc in _BAD_URI_CHARS:
        out = F.replace(out, F.lit(ch), F.lit(enc))
    return out


def cleanse_triples(obj: DataFrame, dat: DataFrame) -> tuple[DataFrame, DataFrame]:
    """A2: drop over-long URIs, percent-encode URI-invalid chars,
    trim/length-filter literals.

    Reference RDFTripleParser.java:205-244: URIs > 120 chars dropped —
    the length check runs on the RAW URI, BEFORE percent-encoding (a
    115-char URI with 3 spaces passes there, then encodes to 121 chars);
    bad URI chars URL-encoded after (fixJavaURI :256-273); literals
    stripped of [\\n\\t\\"] and kept only when the trimmed length is in
    [2, 100].
    """
    uri_ok = lambda c: (F.length(c) > 0) & (F.length(c) <= MAX_URI_LEN)  # noqa: E731
    obj_c = (
        obj.filter(uri_ok(F.col("s")) & uri_ok(F.col("p")) & uri_ok(F.col("o")))
        .select(*[fix_uri(F.col(c)).alias(c) for c in ("s", "p", "o")])
    )
    # strip class is exactly the reference's [\n\t"] — backslash is NOT
    # in it: parse_ntriples' sentinel unescape carefully preserves
    # literal backslashes (r"AC\DC"), and stripping them here would
    # store ACDC, un-spotting every literal containing one
    lit = F.trim(F.regexp_replace(F.col("literal"), '[\\n\\t"]', ""))
    dat_c = (
        dat.filter(uri_ok(F.col("s")) & uri_ok(F.col("p")))
        .select(fix_uri(F.col("s")).alias("s"), fix_uri(F.col("p")).alias("p"), "literal")
        .withColumn("literal", lit)
        .filter(F.length("literal").between(MIN_LITERAL_LEN, MAX_LITERAL_LEN))
    )
    return obj_c, dat_c


def dense_ids(df: DataFrame, order_col: str, num_partitions: int | None = None) -> DataFrame:
    """Deterministic dense ids 0..n-1 ordered by ``order_col``, with NO
    single-partition exchange (scale-safe ``zipWithIndex`` semantics as
    pure DataFrame ops).

    Two-phase numbering: ``repartitionByRange(order_col)`` gives a total
    order *across* partitions; a tiny count-per-partition job yields the
    cumulative offset of each range; a broadcast join + per-partition
    ``row_number`` completes ``id = offset[pid] + local_rank``. The
    ranged frame is localCheckpointed so the counts job and the id job
    see identical partition boundaries (range sampling re-runs
    otherwise). Every exchange here is n-way parallel; at 10^9 keys
    raise ``num_partitions``, nothing else changes.

    Matches the determinism contract of the old global-window build
    (same input ⇒ same encoding on any cluster), unlike the reference's
    load-order Postgres SERIAL (PostgresKB.java:1079-1127).
    """
    spark = df.sparkSession
    if num_partitions:
        n = num_partitions
    else:
        # managed platforms set spark.sql.shuffle.partitions to the
        # non-numeric "auto" — fall back to the cluster's default
        # parallelism instead of crashing every dictionary build
        try:
            n = int(spark.conf.get("spark.sql.shuffle.partitions"))
        except (ValueError, TypeError):
            n = spark.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n, F.col(order_col))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = sorted(
        (r["_pid"], r["n"])
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    )
    offsets, acc = [], 0
    for pid, cnt in counts:
        offsets.append((pid, acc))
        acc += cnt
    off_df = spark.createDataFrame(offsets or [(0, 0)], "_pid int, _off long")
    w = Window.partitionBy("_pid").orderBy(order_col)
    return (
        ranged.join(F.broadcast(off_df), "_pid")
        .select(
            (F.col("_off") + F.row_number().over(w) - 1).cast("long").alias("id"),
            *df.columns,
        )
    )


def build_resource_dictionary(obj: DataFrame, dat: DataFrame) -> DataFrame:
    """A6: URI dictionary = distinct union of relation s/p/o + symbol s/p
    (PostgresKB.storeResourceIndex, PostgresKB.java:1079-1127), with
    deterministic dense ids via scale-safe two-phase numbering over the
    sorted URI set (see :func:`dense_ids`)."""
    uris = (
        obj.select(F.col("s").alias("uri"))
        .unionByName(obj.select(F.col("p").alias("uri")))
        .unionByName(obj.select(F.col("o").alias("uri")))
        .unionByName(dat.select(F.col("s").alias("uri")))
        .unionByName(dat.select(F.col("p").alias("uri")))
        .distinct()
    )
    return dense_ids(uris, "uri")


def build_literal_dictionary(dat: DataFrame) -> DataFrame:
    """A7 + A3: literal dictionary with the Java-hashCode 4-char-prefix
    bucket key (PostgresKB.storeLiteralValues:1137-1149; hash applied to
    the lowercased literal per RDFTripleParser.java:295); ids via
    scale-safe two-phase numbering (see :func:`dense_ids`)."""
    return dense_ids(dat.select("literal").distinct(), "literal").select(
        "id", "literal", literal_prefix_hash("literal").alias("prefix")
    )


def encode_relations(obj: DataFrame, resources: DataFrame) -> DataFrame:
    """A8: dictionary-encode s/p/o via three joins
    (PostgresKB.initObjectPropertyValues:1151-1162)."""
    r = resources
    return (
        obj.join(r.withColumnRenamed("uri", "s").withColumnRenamed("id", "s_id"), "s")
        .join(r.withColumnRenamed("uri", "p").withColumnRenamed("id", "p_id"), "p")
        .join(r.withColumnRenamed("uri", "o").withColumnRenamed("id", "o_id"), "o")
        .select(
            F.col("s_id").alias("s"), F.col("p_id").alias("p"), F.col("o_id").alias("o")
        )
        .distinct()
    )


def encode_symbols(dat: DataFrame, resources: DataFrame, literals: DataFrame) -> DataFrame:
    """A9: encode datatype triples, belief=1.0 on load
    (PostgresKB.initDatatypePropertyValues:1164-1175)."""
    r = resources
    return (
        dat.join(r.withColumnRenamed("uri", "s").withColumnRenamed("id", "s_id"), "s")
        .join(r.withColumnRenamed("uri", "p").withColumnRenamed("id", "p_id"), "p")
        .join(literals.withColumnRenamed("id", "lit_id"), "literal")
        .select(
            F.col("s_id").alias("s"),
            F.col("p_id").alias("p"),
            F.col("lit_id").alias("lit"),
            F.lit(1.0).alias("belief"),
        )
        .distinct()
    )


def build_kb_from_string_triples(
    spark: SparkSession, obj: DataFrame, dat: DataFrame
) -> KB:
    """A2-A9 composed: string triples in, dictionary-encoded KB out.

    The cleansed triples are staged (persist) for the build and dropped
    after: the four KB tables consume obj_c/dat_c ~8 times between them
    (the dictionary union alone re-reads obj 3× and dat 2×), and
    without the stage each consumption re-parses the raw dump. The
    build is eager — dense_ids already runs per-partition count jobs,
    so laziness was never part of this function's contract. On a real
    cluster the durable form of the stage is a parquet/Iceberg staging
    table."""
    obj_c, dat_c = cleanse_triples(obj, dat)
    obj_c = obj_c.persist()
    dat_c = dat_c.persist()
    resources = build_resource_dictionary(obj_c, dat_c).cache()
    literals = build_literal_dictionary(dat_c).cache()
    kb = KB(
        resources=resources,
        literals=literals,
        relations=encode_relations(obj_c, resources).cache(),
        symbols=encode_symbols(dat_c, resources, literals).cache(),
    )
    for df in (kb.resources, kb.literals, kb.relations, kb.symbols):
        df.count()
    obj_c.unpersist()
    dat_c.unpersist()
    return kb


def build_kb_from_dumps(
    spark: SparkSession,
    path: str,
    fmt: str = "ntriples",
    zipped: bool = False,
    base: str | None = None,
) -> KB:
    """A1-A10 end to end from RDF dumps. ``fmt`` ∈ {ntriples, turtle,
    rdfxml} (RDFTripleParser.java:84-99 media-type switch; gz/bz2 are
    transparent, ``zipped=True`` expands zip containers). ``base``
    resolves relative references in RDF/XML dumps (Sesame's baseURI
    argument)."""
    if fmt == "ntriples" and not zipped:
        if base is not None:
            raise ValueError("base resolution is only supported for rdfxml")
        obj, dat = parse_ntriples(spark, path)
    else:
        from .rdfio import parse_rdf_files, parse_rdf_zip

        obj, dat = (
            parse_rdf_zip(spark, path, fmt, base)
            if zipped
            else parse_rdf_files(spark, path, fmt, base)
        )
    return build_kb_from_string_triples(spark, obj, dat)
