"""Dedup / similarity / textstats / multimodal operators."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from scoobie_spark.extras import dedup, multimodal, similarity, textstats


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away tonight"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base.replace("lazy", "sleepy")),  # near dup of 0
        (3, "completely different content about spark shuffles and partitions everywhere"),
        (4, "el rápido zorro marrón salta sobre el perro y corre con la luna por la noche"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(spark, docs):
    d = {r["doc_id"]: r["keeper_id"] for r in dedup.exact_duplicates(docs).collect()}
    assert d[1] == 0 and d[0] == 0
    assert d[2] == 2 and d[3] == 3


def test_ngram_jaccard(spark, docs):
    pairs = {(r["a"], r["b"]) for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert (0, 1) in pairs        # identical
    assert (0, 2) in pairs        # one word changed
    assert not any(3 in p for p in pairs)


def test_minhash_lsh(spark, docs):
    pairs = {
        (r["a"], r["b"]): r["jaccard_est"]
        for r in dedup.minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_simhash(spark, docs):
    pairs = {(r["a"], r["b"]): r["hamming"] for r in dedup.simhash_near_pairs(docs, max_hamming=8).collect()}
    assert pairs[(0, 1)] == 0
    assert (0, 2) in pairs and pairs[(0, 2)] <= 8
    assert (0, 3) not in pairs


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(1)
    base = rng.standard_normal(16).astype("float32")
    rows = [
        (0, base.tolist()),
        (1, (base + 0.01 * rng.standard_normal(16).astype("float32")).tolist()),  # near dup
        (2, (-base).tolist()),  # opposite
        (3, rng.standard_normal(16).astype("float32").tolist()),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_embedding_near_dupes(spark, emb):
    pairs = {(r["a"], r["b"]) for r in dedup.embedding_near_dupes(emb, threshold=0.9, n_planes=6).collect()}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs


def test_embedding_near_dupes_hashplanes(spark, emb):
    # the Rademacher (hash-derived ±1 plane) variant finds the same
    # near-dup and rejects the anti-correlated pair; being a pure
    # function of coordinates it is also run-to-run identical, and the
    # Arrow cumsum kernel is bit-equal to the Column zip_with/aggregate
    # fold (the structural twin of the SQL oracle)
    arrow = {
        tuple(r)
        for r in dedup.embedding_near_dupes_hashplanes(
            emb, threshold=0.9, n_planes=6, impl="arrow"
        ).collect()
    }
    column = {
        tuple(r)
        for r in dedup.embedding_near_dupes_hashplanes(
            emb, threshold=0.9, n_planes=6, impl="column"
        ).collect()
    }
    pairs = {(a, b) for a, b, _ in arrow}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs
    assert arrow == column


def test_cosine_topk_exact(spark, emb):
    out = similarity.cosine_topk(emb, emb.filter(F.col("vec_id") == 0), k=2)
    rows = out.orderBy("rank").collect()
    assert rows[0]["neighbor_id"] == 1  # nearest neighbor of 0 is 1
    assert rows[0]["cosine"] > 0.99


def test_ivf_matches_bruteforce_top1(spark):
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((60, 16)).astype("float32")
    emb = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    q = emb.filter(F.col("vec_id") < 3)
    exact = {
        r["query_id"]: r["neighbor_id"]
        for r in similarity.cosine_topk(emb, q, k=1).collect()
    }
    approx = {
        r["query_id"]: r["neighbor_id"]
        for r in similarity.ivf_topk(emb, q, k=1, n_cells=4, n_probe=4).collect()
    }
    # probing all cells ⇒ IVF == brute force
    assert approx == exact


def test_ivf_flat_matches_bruteforce_top1(spark):
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((60, 16)).astype("float32")
    emb = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    q = emb.filter(F.col("vec_id") < 3)
    exact = {
        r["query_id"]: r["neighbor_id"]
        for r in similarity.cosine_topk(emb, q, k=1).collect()
    }
    approx = {
        r["query_id"]: r["neighbor_id"]
        for r in similarity.ivf_flat_topk(emb, q, k=1, n_cells=4, n_probe=4).collect()
    }
    # probing all cells ⇒ the FLAT-quantizer IVF == brute force too
    assert approx == exact


def test_quality_scores(spark, docs):
    q = {r["doc_id"]: r for r in textstats.quality_scores(docs).collect()}
    assert q[0]["n_tokens"] == 14
    assert q[0]["stopword_ratio"] > 0.2      # 'the' ×2, 'over', 'and'
    assert q[4]["stopword_ratio"] < q[0]["stopword_ratio"]
    assert q[5]["n_tokens"] == 0


def test_repetition_scores(spark):
    rows = [
        (0, "a a a a"),                     # one word repeated
        (1, "w x y z"),                     # no repetition at all
        (2, "go stop go stop go stop"),     # period-2 loop
        (3, ""),                            # empty doc
        (4, "solo"),                        # too short for any n-gram
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    r = {x["doc_id"]: x for x in textstats.repetition_scores(d).collect()}
    assert r[0]["dup_word_frac"] == 0.75            # 4 words, 1 distinct
    assert r[0]["top_bigram_frac"] == 1.0           # 'a a' is every bigram
    assert r[0]["dup_trigram_char_frac"] == 1.0     # 'a a a' twice
    assert r[1]["dup_word_frac"] == 0.0
    assert r[1]["top_bigram_frac"] == 0.333333      # all unique, max=1 of 3
    assert r[1]["dup_trigram_char_frac"] == 0.0
    assert r[2]["dup_word_frac"] == round(4 / 6, 6)
    assert r[2]["top_bigram_frac"] == 0.6           # 'go stop' 3 of 5
    assert r[2]["dup_trigram_char_frac"] == 1.0     # both trigrams repeat
    assert r[3]["dup_word_frac"] == 0.0 and r[3]["top_bigram_frac"] == 0.0
    assert r[4]["top_bigram_frac"] == 0.0 and r[4]["dup_trigram_char_frac"] == 0.0


def test_hash_split(spark):
    from scoobie_spark.extras.sampling import hash_sample, hash_split

    d = spark.range(2000).withColumnRenamed("id", "k")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    s1 = {r["k"]: r["split"] for r in hash_split(d, "k", fr).collect()}
    # deterministic: a re-run over a different partitioning agrees per key
    s2 = {
        r["k"]: r["split"]
        for r in hash_split(d.repartition(7), "k", fr).collect()
    }
    assert s1 == s2
    counts = {}
    for v in s1.values():
        counts[v] = counts.get(v, 0) + 1
    assert set(counts) == {"train", "val", "test"}
    assert 0.75 < counts["train"] / 2000 < 0.85
    # hash_sample(rate) keeps exactly the bucket-prefix subset
    kept = {r["k"] for r in hash_sample(d, "k", 0.8).collect()}
    assert kept == {k for k, v in s1.items() if v == "train"}
    with pytest.raises(ValueError):
        hash_split(d, "k", {"a": 0.5, "b": 0.4})


def test_stratified_sample_exact_quota(spark):
    from scoobie_spark.extras.sampling import stratified_sample

    d = (
        spark.range(300)
        .withColumnRenamed("id", "k")
        .withColumn("grp", (F.col("k") % 4).cast("string"))
    )
    out = stratified_sample(d, key="k", group="grp", n_per_group=7).collect()
    by_grp: dict = {}
    for r in out:
        by_grp.setdefault(r["grp"], []).append(r)
    assert set(by_grp) == {"0", "1", "2", "3"}
    assert all(len(v) == 7 for v in by_grp.values())
    # kept = lowest-hash prefix per group (replay via Spark's own hash)
    hashes = {
        r["k"]: r["h"]
        for r in d.select("k", F.xxhash64("k").alias("h")).collect()
    }
    for g, rows in by_grp.items():
        members = sorted(
            (k for k in hashes if str(k % 4) == g), key=lambda k: (hashes[k], k)
        )
        rows.sort(key=lambda r: r["hash_rank"])
        assert [r["k"] for r in rows] == members[:7]
    # quota larger than the stratum keeps everything
    small = stratified_sample(d.filter("k < 6"), "k", "grp", 99).collect()
    assert len(small) == 6
    with pytest.raises(ValueError):
        stratified_sample(d, "k", "grp", 0)


def test_token_counts(spark, docs):
    t = {r["doc_id"]: r for r in textstats.token_counts(docs).collect()}
    assert t[0]["ws_tokens"] == 14
    assert t[0]["bpe_tokens"] >= t[0]["ws_tokens"]
    assert t[5]["ws_tokens"] == 0


def test_language_id(spark, docs):
    l = {r["doc_id"]: r["lang_guess"] for r in textstats.language_id(docs).collect()}
    assert l[0] == "en"
    assert l[4] == "es"
    assert l[5] == "und"


def test_fingerprints(spark, docs):
    fp = {r["doc_id"]: r for r in textstats.fingerprints(docs).collect()}
    assert fp[0]["fingerprint"] == fp[1]["fingerprint"]  # identical docs
    assert fp[0]["fingerprint"] != fp[3]["fingerprint"]
    assert fp[5]["fp_count"] == 0


def test_multimodal_features(spark):
    media = multimodal.synthesize_media(spark, n=12)
    feats = multimodal.extract_features(media)
    rows = feats.collect()
    assert len(rows) == 12
    for r in rows:
        assert len(r["feature"]) == 16
        assert all(0.0 <= v <= 1.0 for v in r["feature"])
    # determinism: same media_id → same features on re-run
    again = {r["media_id"]: r["feature"] for r in multimodal.extract_features(media).collect()}
    assert again[0] == rows[0]["feature"] or again[rows[0]["media_id"]] == rows[0]["feature"]


def test_frame_sample_plan(spark):
    media = multimodal.synthesize_media(spark, n=9)
    plan = multimodal.frame_sample_plan(media, every_ms=500)
    rows = plan.groupBy("media_id").count().collect()
    assert rows and all(r["count"] >= 1 for r in rows)


def test_fingerprints_match_scalar_oracle(spark):
    """The vectorized polyhash path must be bit-identical to the
    original per-character scalar recurrence (incl. unicode + empties)."""
    B, M = 1_000_003, (1 << 61) - 1

    def oracle(t, window=8):
        toks = t.lower().split()
        hs = []
        h = 0
        for tok in toks:
            th = 0
            for ch in tok.encode("utf-8"):
                th = (th * B + ch) % M
            h = (h * B + th) % M
            hs.append(h)
        return sorted(
            {min(hs[i:i + window]) for i in range(0, max(len(hs) - window + 1, 1))}
        ) if hs else []

    texts = [
        "The quick brown fox jumps over the lazy dog again and again and again",
        "Überraschung: naïve café-goers résumé — größer straße",
        "one",
        "",
        "   ",
        "a b c d e f g h i j k l m n o p q r s t u v w x y z " * 4,
        "Ωμέγα σύμβολα καὶ ἑλληνικά κείμενα μὲ τόνους",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["fingerprint"] for r in textstats.fingerprints(docs).collect()}
    for i, t in enumerate(texts):
        assert got[i] == oracle(t), f"doc {i}"


def test_multimodal_resize_and_audio_windows(spark):
    media = multimodal.synthesize_media(spark, n=12)
    resized = multimodal.resize_media(media, width=8, height=4).collect()
    assert resized  # images present in the synth table
    for r in resized:
        assert r["width"] == 8 and r["height"] == 4
        assert len(r["payload"]) == 8 * 4  # payload size tracks target dims
    # determinism
    again = {r["media_id"]: bytes(r["payload"])
             for r in multimodal.resize_media(media, width=8, height=4).collect()}
    assert {r["media_id"]: bytes(r["payload"]) for r in resized} == again

    wins = multimodal.audio_window_plan(media, window_ms=1000, hop_ms=500).collect()
    assert wins
    by_media = {}
    for w in wins:
        assert w["win_start_ms"] < w["win_end_ms"]
        assert w["win_end_ms"] - w["win_start_ms"] <= 1000
        by_media.setdefault(w["media_id"], []).append(w["win_start_ms"])
    for starts in by_media.values():
        starts.sort()
        assert all(b - a == 500 for a, b in zip(starts, starts[1:]))  # hop


def test_fnv1a64_many_matches_scalar():
    """Position-parallel FNV must be bit-identical to the scalar loop
    (unicode, single chars, long tokens)."""
    toks = [
        "the", "a", "Überraschung", "naïve", "café",
        "x" * 200, "Ωμέγα", "zorro", "1234567890",
    ]
    got = dedup._fnv1a64_many(toks)
    for t, h in zip(toks, got):
        assert np.uint64(h) == dedup._fnv1a64(t), t


def test_simhash_hamming_zero(spark, docs):
    """max_hamming=0 (one 64-bit band) must run and find exactly the
    exact-fingerprint duplicates — it used to die building a 64-bit
    band mask literal."""
    pairs = {(r["a"], r["b"]) for r in dedup.simhash_near_pairs(docs, max_hamming=0).collect()}
    assert (0, 1) in pairs
    assert (0, 3) not in pairs and (0, 2) not in pairs


def test_media_plans_zero_duration(spark):
    """A duration_ms == 0 (or null) row yields zero windows/frames for
    that row instead of killing the job (F.sequence(0, -1, hop) raises)."""
    rows = [
        (0, "audio", "application/x-fake-audio", bytearray(b"abc"), None, None, 0),
        (1, "audio", "application/x-fake-audio", bytearray(b"abc"), None, None, 2000),
        (2, "video", "application/x-fake-video", bytearray(b"abc"), None, None, 0),
        (3, "video", "application/x-fake-video", bytearray(b"abc"), None, None, 1500),
        (4, "audio", "application/x-fake-audio", bytearray(b"abc"), None, None, None),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    wins = multimodal.audio_window_plan(media, window_ms=1000, hop_ms=500).collect()
    assert {w["media_id"] for w in wins} == {1}
    frames = multimodal.frame_sample_plan(media, every_ms=500).collect()
    assert {f["media_id"] for f in frames} == {3}


def test_resize_empty_payload(spark):
    """One zero-byte image row must not abort the Arrow pass — it maps
    to an all-zero payload of the target size."""
    rows = [
        (0, "image", "application/x-fake-image", bytearray(b""), 4, 4, None),
        (1, "image", "application/x-fake-image", bytearray(b"abcdefgh"), 4, 4, None),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = {r["media_id"]: bytes(r["payload"])
           for r in multimodal.resize_media(media, width=4, height=2).collect()}
    assert out[0] == b"\x00" * 8
    assert len(out[1]) == 8 and out[1] != b"\x00" * 8


def test_redact_pii_planted(spark):
    """Category order, placeholder text and counts on hand-built PII;
    the email host wins over the phone shape (no double count), an
    all-digit host is left for the IPv4 stage, short digit runs are
    not phones."""
    from scoobie_spark.extras import pii

    rows = [
        (0, "mail a.b-c%d+e@sub.Example.ORG or x@y.io now"),
        (1, "host 10.20.30.40 and 1.2.3.4, but 1.2.3 is not an ip"),
        (2, "call +1 (555) 010-1234 or 555 0100 999 but not 12345"),
        (3, "mixed u5@h0.net on 192.168.0.1 dial +49 30 123456"),
        (4, "clean text with no personal data at all"),
        (5, "addr user@192.168.1.1 keeps digits for the ip stage"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in pii.redact_pii(df).collect()}
    assert out[0]["n_emails"] == 2 and out[0]["n_ipv4"] == 0 and out[0]["n_phones"] == 0
    assert out[0]["redacted"] == "mail [EMAIL] or [EMAIL] now"
    assert out[1]["n_ipv4"] == 2 and out[1]["n_phones"] == 0
    assert "1.2.3 is not an ip" in out[1]["redacted"]
    assert out[2]["n_phones"] == 2 and out[2]["n_emails"] == 0
    assert "not 12345" in out[2]["redacted"]
    assert (out[3]["n_emails"], out[3]["n_ipv4"], out[3]["n_phones"]) == (1, 1, 1)
    assert out[3]["redacted"] == "mixed [EMAIL] on [IP] dial [PHONE]"
    assert (out[4]["n_emails"], out[4]["n_ipv4"], out[4]["n_phones"]) == (0, 0, 0)
    assert out[4]["redacted"] == rows[4][1]
    # all-digit host is not an email (alpha TLD required) -> IP stage takes it
    assert out[5]["n_emails"] == 0 and out[5]["n_ipv4"] == 1


def test_contamination_planted(spark):
    """8-gram overlap flags exactly the docs sharing a benchmark
    8-gram; short docs have zero grams and stay clean; counts are
    distinct-gram counts."""
    from scoobie_spark.extras import decontam

    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota"
    rows = [
        (0, bench_text + " extra tail words here"),          # contains bench grams
        (1, "alpha beta gamma delta epsilon zeta eta THETA iota"),  # case-folded hit
        (2, "one two three four five six seven eight nine ten"),    # clean
        (3, "too short"),                                           # < 8 words
        (4, "alpha beta gamma delta epsilon zeta eta x " * 2),      # 7-prefix only, no full 8-gram
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame([(bench_text,)], "text string")
    out = {r["doc_id"]: r for r in decontam.contamination(docs, bench, n=8).collect()}
    assert out[0]["contaminated"] == 1 and out[0]["n_hits"] == 2
    assert out[1]["contaminated"] == 1  # lowercasing folds THETA
    assert out[2]["contaminated"] == 0 and out[2]["n_grams"] == 3
    assert out[3]["contaminated"] == 0 and out[3]["n_grams"] == 0
    assert out[4]["contaminated"] == 0
    # n_grams counts distinct grams: doc 4 repeats its text, 16 words -> 9
    # positions but the repeated block collapses
    assert out[4]["n_grams"] < 9


def test_zero_norm_embeddings_do_not_crash(spark):
    """Spark 4 runs ANSI mode by default, where an unguarded cosine
    division raised DIVIDE_BY_ZERO on a single zero-norm vector and
    killed the whole query. Every cosine path floors the norm now: the
    zero vector scores ~0 (never ≥ threshold / never a top neighbor by
    similarity), the rest of the corpus is unaffected."""
    rows = [(i, [float((i * 7 + j * 3) % 11) - 5.0 for j in range(8)]) for i in range(6)]
    rows.append((6, [0.0] * 8))  # the poison row
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    topk = similarity.cosine_topk(e, e.filter(F.col("vec_id") < 2), k=3).collect()
    assert len(topk) == 6  # 2 queries x 3 neighbors, no crash

    flat = similarity.ivf_flat_topk(
        e, e.filter(F.col("vec_id") < 2), k=3, n_cells=4, n_probe=2
    ).collect()
    assert flat  # assignment divides by every corpus norm — must survive

    ivf = similarity.ivf_topk(
        e, e.filter(F.col("vec_id") < 2), k=3, n_cells=4, n_probe=2
    ).collect()
    assert ivf

    near = dedup.embedding_near_dupes(e, threshold=0.35).collect()
    assert all(r["a"] != 6 and r["b"] != 6 for r in near)  # zero vec never a dup


def test_segment_dedup(spark):
    # doc 2 shares doc 1's first 15-word segment; doc 1 is untouched
    # (unique text reassembles identically); NULL texts are one empty
    # segment deduping against each other; within-corpus first
    # occurrence is by (doc_id, pos)
    seg1 = "a b c d e f g h i j k l m n o"
    rows = [
        (1, seg1 + " p q r s t"),
        (2, seg1 + " x y z"),
        (3, None),
        (4, None),
        (5, "unique words only here nothing shared at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["clean_text"], r["n_segments"], r["n_dropped"])
        for r in dedup.segment_dedup(df).collect()
    }
    assert out[1] == (seg1 + " p q r s t", 2, 0)
    assert out[2] == ("x y z", 2, 1)
    assert out[3] == ("", 1, 0)
    assert out[4] == ("", 1, 1)
    assert out[5] == ("unique words only here nothing shared at all", 1, 0)


def test_segment_dedup_reassembly_identity(spark):
    # corpus with no repeated segment: clean_text == text for every doc
    rows = [(i, " ".join(f"w{i}x{j}" for j in range(37))) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup.segment_dedup(df).collect()}
    for i, text in rows:
        assert out[i]["clean_text"] == text
        assert out[i]["n_segments"] == 3  # ceil(37/15)
        assert out[i]["n_dropped"] == 0


def test_dsir_select_prefers_target_like_docs(spark):
    from scoobie_spark.extras import sampling

    # two vocabularies; target corpus speaks A — raw docs speaking A
    # must outscore docs speaking B, and the selection must skew to A
    voc_a = ["alpha", "beta", "gamma", "delta"]
    voc_b = ["uno", "dos", "tres", "cuatro"]
    rows = []
    for i in range(40):
        voc = voc_a if i % 2 == 0 else voc_b
        rows.append((i, " ".join(voc[(i + j) % 4] for j in range(30))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    target = docs.filter(F.pmod("doc_id", F.lit(2)) == 0).limit(10)
    out = {r["doc_id"]: r for r in sampling.dsir_select(docs, target, k=10).collect()}
    assert len(out) == 40 and sum(r["selected"] for r in out.values()) == 10
    a_scores = [out[i]["score_micro"] for i in range(0, 40, 2)]
    b_scores = [out[i]["score_micro"] for i in range(1, 40, 2)]
    assert min(a_scores) > max(b_scores)
    sel_a = sum(1 for i in range(0, 40, 2) if out[i]["selected"])
    assert sel_a >= 8  # Gumbel noise may admit a stray B doc, not many

    # deterministic: exact same output on a second run
    again = {r["doc_id"]: r for r in sampling.dsir_select(docs, target, k=10).collect()}
    assert {k: tuple(v) for k, v in out.items()} == {
        k: tuple(v) for k, v in again.items()
    }


def test_pack_chunks(spark):
    from scoobie_spark.extras import packing

    rows = [(i, " ".join(f"t{j}" for j in range(5 + i))) for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = sorted(
        ((r["tok_start"], r["doc_id"], r["n_tokens"], r["bin_first"], r["bin_last"])
         for r in packing.pack_chunks(docs, cap=16).collect())
    )
    # the stream is gapless and covers every doc once
    assert len(out) == 20
    pos = 0
    for tok_start, _, n, b_first, b_last in out:
        assert tok_start == pos
        assert b_first == pos // 16
        assert b_last == (pos + n - 1) // 16
        pos += n
    assert pos == sum(5 + i for i in range(20))

    # partition-count independence: identical placement whatever the
    # input partitioning or the two-phase range width
    a = {r["doc_id"]: tuple(r) for r in packing.pack_chunks(docs, cap=16).collect()}
    b = {
        r["doc_id"]: tuple(r)
        for r in packing.pack_chunks(docs.repartition(32), cap=16).collect()
    }
    assert a == b
    import pyspark.sql.functions as SF

    base = docs.select(
        "doc_id",
        SF.size(SF.split("text", " ")).cast("long").alias("n_tokens"),
        SF.xxhash64("doc_id").alias("_ord"),
    )
    c2 = {
        r["doc_id"]: r["_cum_before"]
        for r in packing.running_total(
            base, "n_tokens", ["_ord", "doc_id"], num_partitions=2
        ).collect()
    }
    c32 = {
        r["doc_id"]: r["_cum_before"]
        for r in packing.running_total(
            base, "n_tokens", ["_ord", "doc_id"], num_partitions=32
        ).collect()
    }
    assert c2 == c32


def test_lm_quality_flags_improbable_docs(spark):
    # 9 docs from one vocabulary + 1 doc of corpus-rare grams: the
    # outlier must carry the highest length-normalized NLL
    rows = [(i, "alpha beta gamma delta " * 8) for i in range(9)]
    rows.append((9, "zz qq xx vv " * 8))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in textstats.lm_quality(docs).collect()}
    assert len(out) == 10
    rare = out[9]["avg_nll_micro"]
    assert all(out[i]["avg_nll_micro"] < rare for i in range(9))
    # exact-integer contract: identical values on a rerun
    again = {r["doc_id"]: tuple(r) for r in textstats.lm_quality(docs).collect()}
    assert {k: tuple(v) for k, v in out.items()} == again


def test_dedup_survivors_transitive(spark):
    # a~b and b~c but never a~c: the cluster must still collapse to one
    # keeper (transitive closure), and the unpaired doc keeps itself
    docs = spark.createDataFrame([(i, f"doc {i}") for i in range(5)], "doc_id long, text string")
    pairs = spark.createDataFrame([(0, 1), (1, 2)], "a long, b long")
    out = {r["doc_id"]: (r["keeper_id"], r["is_survivor"]) for r in dedup.survivors(docs, pairs).collect()}
    assert out == {0: (0, True), 1: (0, False), 2: (0, False), 3: (3, True), 4: (4, True)}


def test_bpe_pair_counts(spark):
    rows = [
        (0, "a b a b c"),      # pairs: a b, b a, a b, b c
        (1, "  a b  "),        # trims + collapses runs → a b
        (2, "solo"),           # one token → nothing
        (3, ""),               # empty → nothing
        (4, None),             # NULL → nothing (no sequence(1,0) descent)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = [(r["pair"], r["n"]) for r in textstats.bpe_pair_counts(docs, k=2).collect()]
    # top-2 with the (n desc, pair asc) total order: 'a b'×3 then 'b a'×1
    # (ties between 'b a' and 'b c' break on pair text)
    assert out == [("a b", 3), ("b a", 1)]


def test_boilerplate_line_removal(spark):
    from scoobie_spark.extras.textstats import remove_boilerplate_lines

    footer = "Subscribe now."
    rows = [(i, f"unique {i}\n{footer}\nok {i}") for i in range(5)]
    rows.append((99, None))  # NULL text -> one empty line, kept
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r.asDict()
        for r in remove_boilerplate_lines(docs, min_docs=5).collect()
    }
    # the recurring footer dropped, order of survivors preserved
    assert out[0]["cleaned"] == "unique 0\nok 0"
    assert (out[0]["n_kept"], out[0]["n_removed"]) == (2, 1)
    assert out[4]["cleaned"] == "unique 4\nok 4"
    assert out[99]["cleaned"] == "" and out[99]["n_removed"] == 0
    # below min_docs the same line survives everywhere
    out4 = {
        r["doc_id"]: r.asDict()
        for r in remove_boilerplate_lines(docs, min_docs=6).collect()
    }
    assert out4[0]["cleaned"] == f"unique 0\n{footer}\nok 0"
    # short recurring lines are never boilerplate candidates
    short = spark.createDataFrame(
        [(i, f"ok\nline {i}") for i in range(5)], "doc_id long, text string"
    )
    outs = remove_boilerplate_lines(short, min_docs=5).collect()
    assert all(r["cleaned"].startswith("ok\n") for r in outs)


def test_semantic_decontaminate_brute_force(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(50, 8)).astype("float64")
    vecs[17] = vecs[2] * 1.5  # corpus vec 17 ~ bench vec 2 (cos = 1)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(50)],
        "vec_id long, embedding array<double>",
    )
    bench = emb.filter("vec_id < 5")
    corpus = emb.filter("vec_id >= 5")
    out = {
        r["vec_id"]: r
        for r in similarity.semantic_decontaminate(corpus, bench, tau=0.9).collect()
    }
    assert len(out) == 45
    norms = np.maximum(np.linalg.norm(vecs, axis=1), 1e-9)
    sims = (vecs @ vecs.T) / np.outer(norms, norms)
    for i in range(5, 50):
        best = min(range(5), key=lambda b: (-sims[i, b], b))
        r = out[i]
        assert r["top_bench_id"] == best, (i, r)
        assert abs(r["top_cosine"] - round(sims[i, best], 4)) < 1e-9
        assert r["flagged"] == (1 if sims[i, best] >= 0.9 else 0)
    assert out[17]["flagged"] == 1 and out[17]["top_bench_id"] == 2
    assert sum(r["flagged"] for r in out.values()) == 1
    # empty benchmark flags nothing and keeps every corpus row
    none = similarity.semantic_decontaminate(
        corpus, bench.filter("vec_id < 0"), tau=0.9
    ).collect()
    assert len(none) == 45
    assert all(r["flagged"] == 0 and r["top_bench_id"] == -1 for r in none)


def test_length_percentiles_exact_lower_quantile(spark):
    rows = []
    # group A: lengths 1..100 (one doc each) -> p50=50, p90=90, p99=99
    for i in range(1, 101):
        rows.append((i, "A", " ".join(["w"] * i)))
    # group B: 3 docs incl. an empty one -> lengths {0, 2, 5}
    rows += [(201, "B", ""), (202, "B", "a b"), (203, "B", "a b c d e")]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["source"]: r for r in textstats.length_percentiles(df).collect()}
    a = out["A"]
    assert (a["n_docs"], a["p50_tokens"], a["p90_tokens"], a["p99_tokens"]) == (
        100, 50, 90, 99,
    )
    b = out["B"]
    # thresholds for n=3: ceil(1.5)=2 -> 2nd value (2), ceil(2.7)=3 -> 5
    assert (b["n_docs"], b["p50_tokens"], b["p90_tokens"], b["p99_tokens"]) == (
        3, 2, 5, 5,
    )


def test_kmv_distinct_sketch(spark):
    from scoobie_spark.extras.sketches import kmv_distinct

    rows = []
    # group "big": 600 distinct tokens across docs; "small": 5 distinct
    for d in range(30):
        toks = " ".join(f"tok{d}_{i}" for i in range(20))
        rows.append((d, "big", toks))
    rows.append((100, "small", "a b c a b"))
    rows.append((101, "small", "c d e"))
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["source"]: r for r in kmv_distinct(df, k=64).collect()}
    # small group: < k distinct -> exact passthrough, kth null -> 0
    assert out["small"]["n_distinct_exact"] == 5
    assert out["small"]["est_distinct"] == 5
    assert out["small"]["kth_min_hash"] == 0
    big = out["big"]
    assert big["n_distinct_exact"] == 600
    # replay: kth smallest unsigned hash via Spark's own xxhash64
    hs = sorted(
        r["h"] % (1 << 64)
        for r in df.filter("source = 'big'")
        .select(F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("t"))
        .select(F.xxhash64("t").alias("h"))
        .distinct()
        .collect()
    )
    kth = hs[63]
    assert big["kth_min_hash"] % (1 << 64) == kth
    assert big["est_distinct"] == (63 << 64) // kth
    # the estimate lands in the sketch's expected error band (~1/sqrt(k))
    assert 300 < big["est_distinct"] < 1200
    import pytest as _pytest

    with _pytest.raises(ValueError):
        kmv_distinct(df, k=1)


def test_doc_tfidf_matches_brute_force(spark):
    import math

    docs = [
        (1, "apple banana apple cherry"),
        (2, "banana banana dog"),
        (3, "cherry dog elephant elephant elephant"),
        (4, "  apple \t dog  "),
        (5, None),
        (6, "   "),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = textstats.doc_tfidf(df, k=2).collect()
    # brute force in python: N = docs with >=1 token
    toks = {d: (t or "").lower().split() for d, t in docs}
    toks = {d: t for d, t in toks.items() if t}
    n = len(toks)
    dfreq: dict = {}
    for t in toks.values():
        for w in set(t):
            dfreq[w] = dfreq.get(w, 0) + 1
    expect = {}
    for d, t in toks.items():
        tf: dict = {}
        for w in t:
            tf[w] = tf.get(w, 0) + 1
        scored = [
            (w, c, dfreq[w], c * round(math.log(n / dfreq[w]) * 1e6))
            for w, c in tf.items()
        ]
        scored.sort(key=lambda x: (-x[3], x[0]))
        expect[d] = scored[:2]
    got: dict = {}
    for r in out:
        got.setdefault(r["doc_id"], []).append(
            (r["rank"], r["term"], r["tf"], r["df"], r["score_micro"])
        )
    assert set(got) == set(expect)  # empty/null docs emit nothing
    for d, rows in got.items():
        rows.sort()
        assert [(t, tf, dfq, s) for _, t, tf, dfq, s in rows] == expect[d]


def test_prototypes_prune_quota_and_hardness(spark):
    import math

    import numpy as np

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(60, 8)).astype("float64")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    out = similarity.prototypes_prune(emb, keep_frac=0.5, n_cells=4).collect()
    assert len(out) == 60
    by_cell: dict = {}
    for r in out:
        by_cell.setdefault(r["cell"], []).append(r)
    for cell, rows in by_cell.items():
        n = len(rows)
        quota = math.ceil(0.5 * n)
        kept = [r for r in rows if r["kept"] == 1]
        assert len(kept) == quota
        # the kept set is exactly the lowest-cosine (hardest) prefix
        rows.sort(key=lambda r: r["hardness_rank"])
        assert [r["kept"] for r in rows] == [1] * quota + [0] * (n - quota)
        cos = [r["proto_cosine"] for r in rows]
        assert cos == sorted(cos)
    # keep_frac=1 keeps everything
    all_kept = similarity.prototypes_prune(emb, keep_frac=1.0, n_cells=4).collect()
    assert all(r["kept"] == 1 for r in all_kept)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        similarity.prototypes_prune(emb, keep_frac=0.0)


def test_label_propagate_matches_python_replay(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    # three well-separated clusters so propagation has signal
    centers = rng.normal(size=(3, 8)) * 4
    rows = []
    for i in range(45):
        c = i % 3
        v = centers[c] + rng.normal(size=8) * 0.3
        rows.append((i, [float(x) for x in v], int(c)))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = {
        r["vec_id"]: r
        for r in similarity.label_propagate(
            emb, rounds=3, k=4, n_cells=4, n_probe=2
        ).collect()
    }
    assert len(out) == 45
    # replay: same seed rule (via Spark's own xxhash64), same edges
    seeds = {
        r["vec_id"]
        for r in emb.select(
            "vec_id", (F.pmod(F.xxhash64("vec_id"), F.lit(10)) < 3).alias("s")
        ).collect()
        if r["s"]
    }
    edges = [
        (r["src"], r["dst"])
        for r in similarity.knn_graph(emb, k=4, n_cells=4, n_probe=2).collect()
    ]
    truth = {i: i % 3 for i in range(45)}
    lab = {s: truth[s] for s in seeds}
    for _ in range(3):
        votes: dict = {}
        for s, d in edges:
            if d in lab:
                votes.setdefault(s, {}).setdefault(lab[d], 0)
            if d in lab:
                votes[s][lab[d]] += 1
        nxt = dict((s, truth[s]) for s in seeds)
        for s, vs in votes.items():
            if s not in seeds:
                nxt[s] = min(vs, key=lambda l: (-vs[l], l))
        lab = nxt
    for i in range(45):
        r = out[i]
        assert r["is_seed"] == (1 if i in seeds else 0)
        assert r["labeled"] == (1 if i in lab else 0)
        assert r["label"] == lab.get(i, -1), (i, r, lab.get(i))
    # seeds keep their ground-truth label
    assert all(out[s]["label"] == truth[s] for s in seeds)


def test_knn_graph_exact_when_probing_all_cells(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 8)).astype("float64")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    out = similarity.knn_graph(emb, k=3, n_cells=4, n_probe=4).collect()
    got = {}
    for r in out:
        got.setdefault(r["src"], []).append((r["rank"], r["dst"], r["mutual"]))
    norms = np.linalg.norm(vecs, axis=1)
    sims = (vecs @ vecs.T) / np.outer(norms, norms)
    edge_set = {(r["src"], r["dst"]) for r in out}
    for s in range(40):
        # brute-force top-3 by (cosine desc, id asc), self excluded
        order = sorted(
            (d for d in range(40) if d != s), key=lambda d: (-sims[s, d], d)
        )[:3]
        mine = [dst for _, dst, _ in sorted(got[s])]
        assert mine == order, (s, mine, order)
        for rank, dst, mutual in got[s]:
            assert mutual == ((dst, s) in edge_set)
    # probing all cells makes the graph exact, so every src has k edges
    assert all(len(v) == 3 for v in got.values())
