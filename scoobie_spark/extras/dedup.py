"""Deduplication operators for large-scale training-data pipelines.

Five families, all shuffle-conscious:

* exact          — hash groupBy, keeper = min key per content hash
* n-gram Jaccard — shingle explode + same-shingle equi-join + count
                   ratio (inverted-index join, never a cross join)
* MinHash + LSH  — fully JVM-side: xxhash64(shingle, seed_i) minimum
                   per doc per seed → band buckets → bucket equi-join →
                   exact Jaccard verify on candidates only
* SimHash        — 64-bit fingerprint via numpy bit-votes (Arrow
                   batches), near-dup = equal 16-bit band + Hamming ≤ r
* embedding      — cosine near-dup via multi-table random-hyperplane
                   LSH (OR-amplification), exact cosine verify inside
                   buckets

Scale notes: every candidate-generation step is an equi-join on a
bucket key (shingle id, LSH band, hyperplane signature) so the shuffle
volume is bounded by collision counts, not n². Hot shingles (stop-word
n-grams) are the classic skew source — ``ngram_jaccard_pairs`` drops
shingles above a document-frequency cap, which both de-skews the join
and removes no-signal shingles.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# exact
# --------------------------------------------------------------------------

def exact_duplicates(docs: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """(doc_id, keeper_id, content_hash): every row whose text appeared
    before (keeper = min key per sha256 group). Rows where
    doc_id == keeper_id are the survivors. NULL texts are NOT
    duplicates of each other — each maps to itself (sha2(NULL) is NULL
    and a window would cluster every failed-fetch row under one
    keeper)."""
    h = F.when(
        F.col(text).isNull(),
        F.concat(F.lit("__null__"), F.col(key).cast("string")),
    ).otherwise(F.sha2(F.col(text), 256)).alias("content_hash")
    w = Window.partitionBy("content_hash")
    return (
        docs.select(F.col(key).alias("doc_id"), h)
        .withColumn("keeper_id", F.min("doc_id").over(w))
        .select("doc_id", "keeper_id", "content_hash")
    )


# --------------------------------------------------------------------------
# shingles
# --------------------------------------------------------------------------

def _spread(docs: DataFrame, key: str) -> DataFrame:
    """Widen a narrow scan before a CPU-bound per-doc stage.

    A small corpus (one parquet file → one or two scan splits) would
    otherwise serialize the whole tokenize/shingle/hash work into a
    single task — measured 5.1 s single-task vs 0.8 s spread for the
    sf0.1 shingle build. Delegates to the shared plan-based gate
    (pipeline.spread_if_narrow): the previous ``docs.rdd
    .getNumPartitions()`` probe materializes every upstream query
    stage under AQE — a real job — when the input is a composed frame
    rather than a raw scan."""
    from ..pipeline import spread_if_narrow

    return spread_if_narrow(docs, key)


def shingles(docs: DataFrame, n: int = 3, key: str = "doc_id", text: str = "text") -> DataFrame:
    """Word n-gram shingle table (doc_id, shingle) — distinct per doc.
    Tokenization = lowercased word split; the shingle string is the
    joined n-gram. JVM-side end to end."""
    docs = _spread(docs, key)
    toks = F.split(F.lower(F.col(text)), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return (
        docs.select(F.col(key).alias("doc_id"), F.explode(grams).alias("shingle"))
        .filter(F.length("shingle") > 0)
        .distinct()
    )


# --------------------------------------------------------------------------
# n-gram Jaccard
# --------------------------------------------------------------------------

def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int = 1000,
    key: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """(a, b, jaccard) for doc pairs with n-gram Jaccard ≥ threshold.

    Inverted-index join: pairs sharing ≥1 shingle meet on the shingle
    key; |A∩B| = count of shared shingles, |A∪B| = |A|+|B|−∩. Shingles
    with document frequency > max_shingle_df are dropped (skew + noise
    control — a shingle shared by thousands of docs identifies nothing).
    """
    # every aggregate/join key is the 8-byte xxhash64 of the shingle,
    # not the ~n-word string — 3-4× less shuffle volume; a 64-bit
    # collision would need ~2^32 distinct shingles per corpus to appear
    # at even-odds (birthday bound), far beyond any per-join volume here
    sh = (
        shingles(docs, n, key, text)
        .select("doc_id", F.xxhash64("shingle").alias("sh"))
        # lazy localCheckpoint, not cache(): cache registry entries pin
        # executor storage until an explicit unpersist that no caller
        # can issue on this internal frame; checkpoint blocks release
        # with the plan (ContextCleaner) once the query is dropped
        .localCheckpoint(eager=False)
    )
    df_counts = sh.groupBy("sh").agg(F.count("*").alias("df"))
    sh = sh.join(df_counts.filter(F.col("df") <= max_shingle_df), "sh", "left_semi")

    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("size"))
    a = sh.select(F.col("doc_id").alias("a"), "sh")
    b = sh.select(F.col("doc_id").alias("b"), "sh")
    inter = (
        a.join(b, "sh")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("size", "size_a"), "a")
        .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("size", "size_b"), "b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

def minhash_signatures(
    sh: DataFrame, num_hashes: int = 32
) -> DataFrame:
    """(doc_id, sig array<long>) — signature i = min over shingles of
    xxhash64(shingle, seed=i). One groupBy with num_hashes JVM-side
    min-aggregates; no Python in the loop."""
    aggs = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    wide = sh.groupBy("doc_id").agg(*aggs)
    return wide.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.7,
    key: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """(a, b, jaccard_est) near-dup pairs: band-bucket join over minhash
    signatures, then signature-level Jaccard estimate filter.

    bands × rows_per_band = num_hashes; the S-curve collision
    probability at similarity s is 1−(1−s^r)^b. Estimated Jaccard =
    fraction of agreeing signature positions (unbiased estimator).
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sh = shingles(docs, n, key, text)
    sig = minhash_signatures(sh, num_hashes).localCheckpoint(eager=False)

    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("sig").getItem(i * rows_per_band + j)
                                    for j in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    # candidate generation carries ONLY ids through the bucket join and
    # its dedup shuffle; the two 32-long signatures rejoin afterwards
    # (deduping (a,b,sig_a,sig_b) would shuffle 64 longs per candidate)
    ids = banded.select("doc_id", "band", "bucket")
    cand_ids = (
        ids.select(F.col("doc_id").alias("a"), "band", "bucket")
        .join(ids.select(F.col("doc_id").alias("b"), "band", "bucket"), ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    cand = (
        cand_ids.join(sig.select(F.col("doc_id").alias("a"), F.col("sig").alias("sig_a")), "a")
        .join(sig.select(F.col("doc_id").alias("b"), F.col("sig").alias("sig_b")), "b")
    )
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.lit(num_hashes)
    return cand.withColumn("jaccard_est", est).filter(
        F.col("jaccard_est") >= threshold
    ).select("a", "b", "jaccard_est")


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

_SIMHASH_SCHEMA = "doc_id long, simhash long"


def simhash(docs: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """64-bit SimHash per doc: tokens hashed (stable FNV-1a via numpy),
    per-bit ±1 votes, sign → bit. Arrow-batched numpy, no per-row Python."""
    cols = _spread(
        docs.select(F.col(key).alias("doc_id"), F.col(text).alias("text")), "doc_id"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = pdf["text"].fillna("")  # null text ≡ empty doc
            out = np.zeros(len(pdf), dtype=np.int64)
            # 256-doc chunks keep the (tokens × 64) vote temporaries
            # cache-resident (whole-batch numpy over 64k-doc Arrow
            # batches measured 3× slower; see textproc.suffix_candidates)
            for lo in range(0, len(pdf), 256):
                out[lo : lo + 256] = _simhash_chunk(texts.values[lo : lo + 256])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "simhash": pd.Series(out, dtype="int64"),
                }
            )

    return cols.mapInPandas(gen, _SIMHASH_SCHEMA)


def _simhash_chunk(texts: np.ndarray) -> np.ndarray:
    """Vectorized simhash for a chunk of documents, bit-identical to the
    former per-token scalar loop: unique tokens per doc flatten into one
    array, FNV-1a runs position-parallel over all of them
    (:func:`_fnv1a64_many`), and the ±1 bit votes reduce per doc via a
    cumulative-sum difference (reduceat misreads zero-length segments).
    Empty docs hash to 0."""
    n = len(texts)
    toks: list[str] = []
    seg = np.zeros(n, dtype=np.int64)
    for i, t in enumerate(texts):
        u = set(t.lower().split())
        seg[i] = len(u)
        toks.extend(u)
    if not toks:
        return np.zeros(n, dtype=np.int64)
    hs = _fnv1a64_many(toks)
    bits = (
        (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    ).astype(np.int32)
    csum = np.zeros((len(toks) + 1, 64), dtype=np.int64)
    np.cumsum(2 * bits - 1, axis=0, out=csum[1:])
    ends = np.cumsum(seg)
    votes = csum[ends] - csum[ends - seg]
    bitmask = np.uint64(1) << np.arange(64, dtype=np.uint64)
    return ((votes > 0) * bitmask[None, :]).sum(axis=1, dtype=np.uint64).view(np.int64)


def _fnv1a64_many(tokens: list[str]) -> np.ndarray:
    """FNV-1a-64 of every token at once: all tokens advance one byte per
    numpy step (masked by remaining length), so the Python-level loop is
    O(longest token), not O(total bytes). Identical output to
    :func:`_fnv1a64`."""
    bufs = [t.encode("utf-8") for t in tokens]
    lens = np.fromiter((len(b) for b in bufs), count=len(bufs), dtype=np.int64)
    cat = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    starts = np.cumsum(lens) - lens
    h = np.full(len(bufs), 0xCBF29CE484222325, dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    for j in range(int(lens.max(initial=0))):
        active = lens > j
        h[active] = (h[active] ^ cat[starts[active] + j].astype(np.uint64)) * prime
    return h


def _fnv1a64(s: str) -> np.uint64:
    """Scalar FNV-1a-64 — the golden reference `_fnv1a64_many` is
    differential-tested against (tests/test_extras.py)."""
    h = np.uint64(0xCBF29CE484222325)
    for bch in s.encode("utf-8"):
        h = np.uint64((int(h) ^ bch) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
    return h


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 3, **kw) -> DataFrame:
    """(a, b, hamming ≤ max_hamming) via bit-band buckets: with
    ``max_hamming + 1`` bands, two hashes within the Hamming budget
    must agree on ≥1 whole band (pigeonhole), so the bucket join finds
    every such pair without n². Band count adapts to ``max_hamming``
    (the fixed 4×16-bit layout was only sound for ≤3)."""
    n_bands = max_hamming + 1
    if n_bands > 64:
        raise ValueError("max_hamming must be < 64")
    width = 64 // n_bands
    # band i covers bits [i*width, (i+1)*width); the last band absorbs
    # the remainder bits so all 64 participate
    def band_expr(i: int):
        w = width + (64 - width * n_bands if i == n_bands - 1 else 0)
        if w >= 64:
            # max_hamming=0 → one 64-bit band: the full-width mask
            # (1<<64)-1 does not fit a signed-long literal, and masking
            # the whole column is the identity anyway
            return F.col("simhash")
        mask = (1 << w) - 1
        return F.shiftrightunsigned("simhash", i * width).bitwiseAND(F.lit(mask))

    sig = simhash(docs, **kw).localCheckpoint(eager=False)
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("band"), band_expr(i).alias("bucket"))
                    for i in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.bucket")
    l = bands.select(F.col("doc_id").alias("a"), F.col("simhash").alias("sh_a"), "band", "bucket")
    r = bands.select(F.col("doc_id").alias("b"), F.col("simhash").alias("sh_b"), "band", "bucket")
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        l.join(r, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", hamming.alias("hamming"))
        # hamming is deterministic per pair: filter BEFORE the dedup so
        # spurious one-band collisions never ride the distinct shuffle
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# --------------------------------------------------------------------------
# embedding cosine near-dup
# --------------------------------------------------------------------------

def embedding_near_dupes(
    emb: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 42,
    key: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """(a, b, cosine ≥ threshold) via random-hyperplane LSH with
    OR-amplification: ``n_tables`` independent hash tables, bucket =
    sign-bit signature of n_planes seeded projections per table (numpy,
    Arrow batches); a pair is a candidate if it collides in ANY table
    (recall 1−(1−p^k)^L instead of the single-table p^k ceiling), exact
    cosine verify inside buckets only. The bucket join carries ids, not
    vectors — vectors rejoin per candidate pair after the dedup."""
    dim = len(emb.select(vec).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, dim, n_planes)).astype(np.float32)
    powers = (1 << np.arange(n_planes)).astype(np.int64)

    cols = emb.select(F.col(key).alias("doc_id"), F.col(vec).alias("v"))

    def bucketize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf["v"].values).astype(np.float32)
            ids = pdf["doc_id"].to_numpy(dtype="int64")
            for t in range(n_tables):
                buckets = (((m @ planes[t]) > 0) @ powers).astype("int64")
                yield pd.DataFrame(
                    {"doc_id": ids, "table": np.full(len(ids), t),
                     "bucket": buckets}
                )

    bucketed = cols.mapInPandas(bucketize, "doc_id long, table int, bucket long")
    return _bucket_candidates_verify(cols, bucketed, threshold)


def _bucket_candidates_verify(
    cols: DataFrame, bucketed: DataFrame, threshold: float
) -> DataFrame:
    """Shared LSH tail: OR-amplified (table, bucket) equi-join carrying
    ids only → distinct candidate pairs → exact f64 cosine verify after
    the per-pair vector rejoin. The signature table is cached — the
    self-join reads it twice, and without the cache every signature
    (an Arrow batch or a 24-fold projection per row) is computed
    twice."""
    bucketed = bucketed.localCheckpoint(eager=False)
    cand = (
        bucketed.select(F.col("doc_id").alias("a"), "table", "bucket")
        .join(
            bucketed.select(F.col("doc_id").alias("b"), "table", "bucket"),
            ["table", "bucket"],
        )
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    va = cols.select(F.col("doc_id").alias("a"), F.col("v").alias("va"))
    vb = cols.select(F.col("doc_id").alias("b"), F.col("v").alias("vb"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    # greatest(·, 1e-9): ANSI mode (Spark 4 default) raises
    # DIVIDE_BY_ZERO on a zero-norm vector — one zero embedding in the
    # corpus would abort the whole dedup job at the verify step. Real
    # norms sit far above the floor, so verified cosines are unchanged.
    norm = lambda c: F.greatest(  # noqa: E731
        F.sqrt(
            F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda a, v: a + v)
        ),
        F.lit(1e-9),
    )
    return (
        cand.join(va, "a")
        .join(vb, "b")
        .withColumn("cosine", dot / (norm(F.col("va")) * norm(F.col("vb"))))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
        # duplicate ids in `emb` would multiply through the vector
        # rejoin even though cand_ids is distinct
        .distinct()
    )


def _rademacher_planes(n_tables: int, n_planes: int, dim: int) -> np.ndarray:
    """(n_tables, n_planes, dim) float64 ±1.0 matrix: entry (t, p, d) is
    the FNV-1a-64 parity of the ASCII key ``"t:p:d"`` — a pure function
    of the coordinates, so every consumer (the Arrow kernel, the Column
    fold, queries.SQL_EMBEDDING_LSH's DuckDB replay) rebuilds the same
    planes from the same bytes."""
    return np.array(
        [
            [
                [
                    1.0 if int(_fnv1a64(f"{t}:{p}:{d}")) & 1 else -1.0
                    for d in range(dim)
                ]
                for p in range(n_planes)
            ]
            for t in range(n_tables)
        ],
        dtype=np.float64,
    )


def embedding_near_dupes_hashplanes(
    emb: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 12,
    n_tables: int = 4,
    key: str = "vec_id",
    vec: str = "embedding",
    impl: str = "arrow",
) -> DataFrame:
    """(a, b, cosine ≥ threshold) via hash-derived ±1 hyperplanes: sign
    random projections with Rademacher entries (Achlioptas-style
    database-friendly projections, public knowledge), planes a pure
    function of their coordinates rather than RNG state — which is what
    the seeded-Gaussian variant (:func:`embedding_near_dupes`) cannot
    offer: the whole query replays value-for-value in ANSI SQL
    (queries.SQL_EMBEDDING_LSH rebuilds the identical planes from the
    same FNV bytes). The projection is products first, then a strictly
    sequential left fold from 0.0 — the exact IEEE op sequence the
    oracle's list_reduce replays.

    Two bit-identical implementations (differential-tested):

    * ``impl="arrow"`` (default, the scale path): one numpy kernel per
      Arrow batch. ``cumsum`` IS the sequential left fold — numpy's
      pairwise summation applies to ``sum``, not ``cumsum``, and
      ``0.0 + x0 == x0`` exactly in IEEE — so the fast path loses no
      exactness. ~2× faster than the Column fold already at 2k×64
      (the fold interprets n_tables × n_planes lambdas per element).
    * ``impl="column"``: zero-Python zip_with/aggregate Column folds —
      the structural twin of the SQL oracle, kept as the cross-check
      that pins the Arrow kernel to the spec.

    Bucket/verify tail shared with the Gaussian variant."""
    dim = len(emb.select(vec).first()[0])
    cols = emb.select(
        F.col(key).alias("doc_id"), F.col(vec).cast("array<double>").alias("v")
    )
    if impl == "arrow":
        planes = _rademacher_planes(n_tables, n_planes, dim)
        powers = (1 << np.arange(n_planes)).astype(np.int64)

        def bucketize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                m = np.stack(pdf["v"].values).astype(np.float64)
                ids = pdf["doc_id"].to_numpy(dtype="int64")
                for t in range(n_tables):
                    # (n, planes, dim) products, then the sequential
                    # fold via cumsum along dim — bit-equal to the
                    # Column/SQL list_reduce
                    prod = m[:, None, :] * planes[t][None, :, :]
                    proj = np.cumsum(prod, axis=2)[:, :, -1]
                    buckets = ((proj > 0) @ powers).astype("int64")
                    yield pd.DataFrame(
                        {"doc_id": ids, "table": np.full(len(ids), t),
                         "bucket": buckets}
                    )

        bucketed = cols.mapInPandas(
            bucketize, "doc_id long, table int, bucket long"
        )
        return _bucket_candidates_verify(cols, bucketed, threshold)

    def plane(t: int, p: int):
        return F.array(
            *[
                F.lit(1.0 if int(_fnv1a64(f"{t}:{p}:{d}")) & 1 else -1.0)
                for d in range(dim)
            ]
        )

    def proj(t: int, p: int):
        # products first (zip_with), then a strictly sequential left
        # fold from 0.0 — the exact IEEE op sequence the oracle's
        # list_reduce replays. (A flat codegen'd ±v[d] chain was tried
        # and reverted: 24 × 128-node literal trees blow up Catalyst
        # constraint propagation and fall out of codegen anyway.)
        return F.aggregate(
            F.zip_with(F.col("v"), plane(t, p), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def bucket(t: int):
        b = F.lit(0).cast("long")
        for p in range(n_planes):
            b = b + F.when(proj(t, p) > 0, F.lit(1 << p).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        return b

    bucketed = cols.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("table"), bucket(t).alias("bucket")
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("tb"),
    ).select("doc_id", F.col("tb.table").alias("table"), F.col("tb.bucket").alias("bucket"))
    return _bucket_candidates_verify(cols, bucketed, threshold)


# --------------------------------------------------------------------------
# survivor selection
# --------------------------------------------------------------------------

def survivors(docs: DataFrame, pairs: DataFrame, key: str = "doc_id") -> DataFrame:
    """One canonical survivor per near-duplicate cluster.

    A pair generator (any of the families above) emits edges; a
    production dedup pass must then KEEP exactly one document per
    duplicate cluster — the transitive closure matters (a~b, b~c ⇒
    a,b,c are one cluster even if a~c was never emitted, the standard
    MinHash-dedup semantics). Clusters are the connected components of
    the pair graph (distributed Kiveris star-contraction,
    ``graph.connected_components`` — O(log² n) rounds, no driver-side
    union-find), keeper = smallest ``key`` in the cluster.

    Returns (doc_id, keeper_id, is_survivor) for EVERY input doc:
    unpaired docs keep themselves. Scale shape: the only new work over
    the CC rounds is one doc_id equi-join of the (small) component map
    against the corpus — no text columns move.
    """
    from .. import graph

    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    cc = graph.connected_components(edges).withColumnRenamed("node", "doc_id")
    return (
        docs.select(F.col(key).alias("doc_id"))
        .join(cc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("keeper_id"),
        )
        .withColumn("is_survivor", F.col("doc_id") == F.col("keeper_id"))
    )


# --------------------------------------------------------------------------
# duplicate-span (segment) removal
# --------------------------------------------------------------------------

def segment_dedup(
    docs: DataFrame,
    key: str = "doc_id",
    text: str = "text",
    words_per_seg: int = 15,
) -> DataFrame:
    """C4-style duplicate-span removal: split every document into
    fixed-length word segments, drop each segment whose exact text
    already occurred anywhere in the corpus (global first occurrence by
    (doc_id, position) wins — within-doc repeats drop too), and
    reassemble the survivors. This is the span-granular complement to
    doc-level dedup: boilerplate shared by otherwise-distinct pages
    (headers, license blocks, quoted passages) is removed without
    discarding the documents.

    Returns (doc_id, clean_text, n_segments, n_dropped) for every
    input doc. NULL text follows the family's NULL-as-empty contract
    (one empty segment; empty docs dedup against each other).

    Scale shape: the explode is ×(n_words/words_per_seg) rows but each
    carries one segment of the text, so total shuffled bytes track the
    corpus size, keyed by sha256(segment). First-occurrence selection
    is groupBy(hash).agg(min(struct)) + an equi-join back — min is
    algebraic, so the hot-key case (a segment duplicated 10^8 times at
    100 TB) combines map-side instead of sorting in one task the way a
    window would; the join back is an AQE-skew-splittable equi-join.
    """
    if words_per_seg <= 0:
        raise ValueError(f"words_per_seg must be > 0, got {words_per_seg}")
    toks = F.split(F.coalesce(F.col(text), F.lit("")), " ")
    k = F.lit(words_per_seg)
    n_seg = F.ceil(F.size(toks) / k).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), n_seg - F.lit(1)),
        lambda i: F.array_join(F.slice(toks, i * k + 1, words_per_seg), " "),
    )
    seg_rows = docs.select(
        F.col(key).alias("doc_id"), F.posexplode(segs).alias("pos", "seg")
    ).withColumn("h", F.sha2("seg", 256))
    firsts = seg_rows.groupBy("h").agg(
        F.min(F.struct("doc_id", "pos")).alias("first")
    )
    kept = seg_rows.join(firsts, "h").withColumn(
        "is_first",
        (F.col("doc_id") == F.col("first.doc_id"))
        & (F.col("pos") == F.col("first.pos")),
    )
    return kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("is_first"), F.struct("pos", "seg"))
                    )
                ),
                lambda s: s["seg"],
            ),
            " ",
        ).alias("clean_text"),
        F.count("*").alias("n_segments"),
        F.sum(F.when(F.col("is_first"), 0).otherwise(1)).cast("long").alias(
            "n_dropped"
        ),
    )


def substring_dedup(
    docs: DataFrame,
    k: int = 40,
    key: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """ExactSubstr-style duplicated-span detection (Lee et al. 2022,
    arXiv:2107.06499 — the public suffix-array dedup spec), k-gram-island
    variant: every char position whose k-gram already occurred anywhere
    in the corpus (global first occurrence by (doc_id, pos) wins, like
    :func:`segment_dedup`) opens a duplicated interval ``[pos, pos+k)``;
    per document, overlapping-or-touching intervals merge into maximal
    duplicated spans — exactly the spans the suffix-array method reports
    for duplicates of length ≥ k, without materializing a global sorted
    suffix structure.

    Returns one row per doc: ``(doc_id, n_chars, n_spans, dup_chars)``.

    Scale shape: the k-gram explode is the standard shingle blowup
    (×~n_chars rows, each carrying k chars); first-occurrence selection
    is the same map-side-combinable groupBy(sha256).agg(min(struct)) +
    equi-join as segment_dedup (hot k-grams — 10^8 copies of a license
    line at 100 TB — combine map-side instead of sorting in one task);
    the island merge is a per-doc window over only the DUP positions
    (bounded by doc length). The oracle groups by gram TEXT, guarding
    the sha256 shortcut.
    """
    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    t = F.coalesce(F.col(text), F.lit(""))
    n_g = F.length(t) - F.lit(k) + F.lit(1)
    starts = F.when(n_g > 0, F.sequence(F.lit(0), n_g - F.lit(1))).otherwise(
        F.array().cast("array<int>")
    )
    grams = docs.select(
        F.col(key).alias("doc_id"),
        F.explode(
            F.transform(starts, lambda i: F.struct(i.alias("pos"),
                                                   F.substring(t, i + 1, k).alias("gram")))
        ).alias("g"),
    ).select("doc_id", F.col("g.pos").alias("pos"), F.sha2("g.gram", 256).alias("h"))
    firsts = grams.groupBy("h").agg(F.min(F.struct("doc_id", "pos")).alias("first"))
    dups = (
        grams.join(firsts, "h")
        .filter(
            (F.col("doc_id") != F.col("first.doc_id"))
            | (F.col("pos") != F.col("first.pos"))
        )
        .select("doc_id", "pos")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    flagged = dups.withColumn(
        "f",
        F.when(
            F.lag("pos").over(w).isNull() | (F.col("pos") > F.lag("pos").over(w) + k),
            1,
        ).otherwise(0),
    ).withColumn("isl", F.sum("f").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    spans = flagged.groupBy("doc_id", "isl").agg(
        (F.max("pos") + F.lit(k) - F.min("pos")).alias("chars")
    )
    agg = spans.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        F.sum("chars").cast("long").alias("dup_chars"),
    )
    return (
        docs.select(F.col(key).alias("doc_id"), F.length(t).cast("long").alias("n_chars"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_chars",
            F.coalesce("n_spans", F.lit(0).cast("long")).alias("n_spans"),
            F.coalesce("dup_chars", F.lit(0).cast("long")).alias("dup_chars"),
        )
    )
