"""B5/B6: POS layer, NP chunking, phrase stitching, candidate gate."""

from pyspark.sql import functions as F

from scoobie_spark import pos, textproc
from scoobie_spark.fixtures import micro_docs, micro_kb
from scoobie_spark.pipeline import PipelineConfig, extract_triples


def test_pos_and_chunks(spark):
    docs = spark.createDataFrame(
        [(1, "The quick brown Fox jumps over the lazy dog. Percy Jackson trains.")],
        "doc_id long, content string",
    )
    tagged = pos.pos_tag(docs)
    tags = {r["word"]: r["pos"] for r in tagged.collect()}
    assert tags["The"] == "DT" or tags["The"] == "NNP"  # sentence-initial caps
    assert tags["over"] == "IN"
    assert tags["Fox"] == "NNP"
    assert tags["Percy"] == "NNP"
    assert tags["."] == "."

    phrases = pos.noun_phrases(pos.np_chunks(tagged))
    ph = {r["phrase"] for r in phrases.collect()}
    assert "Percy Jackson" in ph
    assert any("Fox" in p for p in ph)
    # phrases never span the O-tagged verb 'over'
    assert not any("over" in p for p in ph)


def test_phrase_gap_not_merged(spark):
    docs = spark.createDataFrame(
        [(1, "Alpha Bravo is Charlie Delta")], "doc_id long, content string"
    )
    phrases = pos.noun_phrases(pos.np_chunks(pos.pos_tag(docs)))
    ph = sorted(r["phrase"] for r in phrases.collect())
    assert ph == ["Alpha Bravo", "Charlie Delta"]


def test_np_candidate_filter_pipeline(spark):
    """micro fixture: all planted exact-case mentions start uppercase, so
    the B6 gate keeps them; the lowercase-only doc1 mention disappears."""
    docs, kb = micro_docs(spark), micro_kb(spark)
    out = extract_triples(spark, docs, kb, PipelineConfig(np_candidate_filter=True))
    objs = {r["obj"] for r in out.filter(F.col("graph") == "recognized").collect()}
    assert "Percy Jackson" in objs and "Camp Halfblood" in objs
    assert "percy jackson" not in objs and "camp halfblood" not in objs


# ---------------------------------------------------------------------------
# trained conll2000 models (perceptron.py) — TestNounPhraseChunker mirror
# ---------------------------------------------------------------------------

import os

import pytest

from scoobie_spark import perceptron

_CONLL = "/root/reference/corpora/conll2000"
needs_corpus = pytest.mark.skipif(
    not os.path.exists(os.path.join(_CONLL, "test_conll2000.txt.zip")),
    reason="reference conll2000 corpus not present",
)
needs_models = pytest.mark.skipif(
    not perceptron.models_available(),
    reason="trained models absent — run scripts/train_conll2000.py",
)


@needs_models
@needs_corpus
def test_trained_chunker_conll2000():
    """Mirror of the reference's TestNounPhraseChunker: per-token
    accuracy on the bundled test file (NounPhraseChunker.testCrf:369-395)
    plus the NP-segment P/R/F1 view of its MultiSegmentationEvaluator.
    Frozen from the committed artifacts: acc .9528, NP F1 .9222."""
    test = perceptron.read_conll2000(os.path.join(_CONLL, "test_conll2000.txt.zip"))
    chunker = perceptron.AveragedPerceptron.load(perceptron.CHUNK_MODEL)
    assert perceptron.token_accuracy(chunker, test, "chunk") >= 0.95
    p, r, f1 = perceptron.np_phrase_f1(chunker, test)
    assert f1 >= 0.915 and p >= 0.90 and r >= 0.90


@needs_models
@needs_corpus
def test_trained_pos_conll2000():
    """Trained-B5: per-token POS accuracy on the conll2000 test file
    (the reference's maxent tagger layer). Frozen: .9714."""
    test = perceptron.read_conll2000(os.path.join(_CONLL, "test_conll2000.txt.zip"))
    tagger = perceptron.AveragedPerceptron.load(perceptron.POS_MODEL)
    assert perceptron.token_accuracy(tagger, test, "pos") >= 0.965


@needs_models
def test_trained_dataframe_layer(spark):
    """pos_tag_trained + np_chunks_trained end-to-end over documents:
    same schema as the rule path, NP spans stitch through the shared
    noun_phrases, and obvious proper-noun phrases survive."""
    docs = spark.createDataFrame(
        [
            (1, "The quick brown fox jumps over the lazy dog. Percy Jackson trains hard."),
            (2, "Confidence in the pound is widely expected to fall sharply."),
        ],
        "doc_id long, content string",
    )
    tagged = perceptron.pos_tag_trained(docs)
    tags = {r["word"]: r["pos"] for r in tagged.collect()}
    assert tags["over"] == "IN"
    assert tags["Percy"] == "NNP" and tags["Jackson"] == "NNP"
    assert tags["is"] == "VBZ" and tags["expected"] == "VBN"
    phrases = pos.noun_phrases(perceptron.np_chunks_trained(tagged))
    ph = {r["phrase"] for r in phrases.collect()}
    assert "Percy Jackson" in ph
    assert any("fox" in p for p in ph)
    assert any("pound" in p for p in ph)
    assert not any("expected" in p for p in ph)


def test_np_filter_precision_recall_effect(spark):
    """Measured P/R effect of the B6 candidate gate on the micro
    fixture: with the filter ON precision stays 1.0 while recall drops
    only by the planted lowercase mentions; OFF is the P=R=1.0 baseline."""
    from scoobie_spark.fixtures import MICRO_EXPECTED_TRIPLES

    docs, kb = micro_docs(spark), micro_kb(spark)
    expected = set(MICRO_EXPECTED_TRIPLES)

    def pr(cfg):
        got = {
            (r["graph"], r["subj"], r["pred"], r["obj"])
            for r in extract_triples(spark, docs, kb, cfg).collect()
        }
        tp = len(got & expected)
        return tp / max(len(got), 1), tp / max(len(expected), 1)

    p_off, r_off = pr(PipelineConfig())
    p_on, r_on = pr(PipelineConfig(np_candidate_filter=True))
    assert (p_off, r_off) == (1.0, 1.0)
    assert p_on == 1.0          # the gate never admits junk
    assert 0.5 <= r_on < 1.0    # it pays recall: lowercase mentions gone


@needs_models
def test_np_chunker_candidate_gate(spark):
    """PipelineConfig(np_candidate_filter="chunker"): the trained NP-span
    gate keeps the planted proper-noun mentions (they sit inside
    predicted NPs) — and unlike the "caps" gate it may also keep
    lowercase NPs, so it is measured as ≥ the caps gate's recall."""
    from scoobie_spark.fixtures import MICRO_EXPECTED_TRIPLES

    docs, kb = micro_docs(spark), micro_kb(spark)
    expected = set(MICRO_EXPECTED_TRIPLES)

    def triples(cfg):
        return {
            (r["graph"], r["subj"], r["pred"], r["obj"])
            for r in extract_triples(spark, docs, kb, cfg).collect()
        }

    got_chunker = triples(PipelineConfig(np_candidate_filter="chunker"))
    got_caps = triples(PipelineConfig(np_candidate_filter=True))
    assert got_chunker <= expected          # gate never admits junk
    assert len(got_chunker) >= len(got_caps)
    assert any(obj == "Percy Jackson" for _, _, _, obj in got_chunker)


# ---------------------------------------------------------------------------
# German (TIGER) models — the reference's DE chunker leg
# (TestNounPhraseChunker.java:37,43) — and token/phrase frequencies
# ---------------------------------------------------------------------------

_TIGER = "/root/reference/corpora/tiger"
needs_tiger = pytest.mark.skipif(
    not os.path.exists(os.path.join(_TIGER, "training_tiger.txt.zip")),
    reason="reference tiger corpus not present",
)
needs_de_models = pytest.mark.skipif(
    not perceptron.models_available("de"),
    reason="trained DE models absent — run scripts/train_tiger.py",
)


@needs_de_models
@needs_tiger
def test_trained_chunker_tiger_de():
    """DE mirror of TestNounPhraseChunker (TRAIN_FILE_DE → DE.crf):
    per-token chunk accuracy + NP-segment F1 on the deterministic
    10% held-out tail of training_tiger.txt (TIGER ships no test
    split). Frozen from the committed artifacts
    (scripts/train_tiger.py): POS .9562, chunk .9595, NP F1 .8788."""
    sents = perceptron.read_conll2000(
        os.path.join(_TIGER, "training_tiger.txt.zip")
    )
    test = sents[int(len(sents) * 0.9):]
    chunker = perceptron.AveragedPerceptron.load(perceptron.CHUNK_MODEL_DE)
    assert perceptron.token_accuracy(chunker, test, "chunk") >= 0.955
    p, r, f1 = perceptron.np_phrase_f1(chunker, test)
    assert f1 >= 0.87

    tagger = perceptron.AveragedPerceptron.load(perceptron.POS_MODEL_DE)
    assert perceptron.token_accuracy(tagger, test, "pos") >= 0.95


@needs_de_models
def test_trained_dataframe_layer_de(spark):
    """lang="de" end-to-end: STTS tags from the TIGER tagger, German NP
    spans through the shared noun_phrases stitch."""
    docs = spark.createDataFrame(
        [(1, "Der schnelle braune Fuchs springt über den faulen Hund. "
             "Die Bundesregierung plant eine neue Steuerreform.")],
        "doc_id long, content string",
    )
    tagged = perceptron.pos_tag_trained(docs, lang="de")
    tags = {r["word"]: r["pos"] for r in tagged.collect()}
    assert tags["Der"] == "ART" and tags["über"] == "APPR"
    assert tags["Bundesregierung"] == "NN"
    phrases = pos.noun_phrases(
        perceptron.np_chunks_trained(tagged, lang="de")
    )
    ph = {r["phrase"] for r in phrases.collect()}
    assert any("Fuchs" in p for p in ph)
    assert any("Steuerreform" in p for p in ph)
    # the verb never lands inside a phrase
    assert not any("springt" in p for p in ph)


def test_unknown_chunker_lang_raises():
    with pytest.raises(ValueError, match="no trained B5/B6 models"):
        perceptron._lang_models("fr")


def test_token_phrase_frequency(spark):
    """The five PhraseExperiment CSV columns recomputed independently in
    pandas from the same chunked layer — exact match per doc."""
    docs = spark.createDataFrame(
        [
            (1, "The quick brown fox jumps over the lazy dog. Alice saw Bob."),
            (2, "nothing verbs here"),
        ],
        "doc_id long, content string",
    )
    chunked = pos.np_chunks(pos.pos_tag(docs))
    got = {
        r["doc_id"]: r.asDict()
        for r in pos.token_phrase_frequency(chunked).collect()
    }
    pdf = chunked.toPandas()
    for doc_id, g in pdf.groupby("doc_id"):
        g = g.sort_values("start")
        inside = g[g["np"] != "O"]
        nps = 0
        for _, s in g.groupby("sent_id"):
            prev = "O"
            for tag in s["np"]:
                if tag == "B-NP" or (tag == "I-NP" and prev == "O"):
                    nps += 1
                prev = tag
        row = got[doc_id]
        assert row["tokens"] == len(g)
        assert row["noun_phrases"] == nps
        assert row["tokens_in_nps"] == len(inside)
        assert row["distinct_tokens_in_nps"] == inside["word"].nunique()
        assert row["distinct_tokens"] == g["word"].nunique()


@needs_models
@needs_de_models
def test_np_span_filter_auto_dispatch(spark):
    """lang="auto": per-document model routing on the input table's
    lang column — the result equals applying each language's gate to
    its own documents."""
    docs = spark.createDataFrame(
        [
            (1, "en", "Percy Jackson visited London yesterday."),
            (2, "de", "Die Bundesregierung plant eine neue Steuerreform."),
            (3, "zz", "Alpha Bravo spoke."),  # unmodeled lang → en fallback
        ],
        "doc_id long, lang string, content string",
    )
    cands = spark.createDataFrame(
        [(1, 0), (1, 22), (1, 14), (2, 4), (2, 31), (2, 20), (3, 0)],
        "doc_id long, begin int",
    )
    auto = perceptron.np_span_filter(cands, docs, lang="auto")

    def one(doc_id, lang):
        return perceptron.np_span_filter(
            cands.filter(F.col("doc_id") == doc_id),
            docs.filter(F.col("doc_id") == doc_id),
            lang=lang,
        )

    expected = one(1, "en").unionByName(one(2, "de")).unionByName(one(3, "en"))
    got = sorted(tuple(r) for r in auto.collect())
    want = sorted(tuple(r) for r in expected.collect())
    assert got == want and len(got) > 0


# ---------------------------------------------------------------------------
# vectorized decode (perceptron.VectorizedPerceptron) — differential golden
# ---------------------------------------------------------------------------


@needs_models
@needs_corpus
def test_vectorized_decode_differential():
    """The int64-matrix batch decode must reproduce the scalar dict
    decode bit-for-bit — every POS tag and chunk tag on a slice of the
    conll2000 test file, plus the budget-slicing path (forced tiny
    _TOKEN_BUDGET), plus degenerate inputs."""
    test = perceptron.read_conll2000(os.path.join(_CONLL, "test_conll2000.txt.zip"))[:400]
    tagger = perceptron.AveragedPerceptron.load(perceptron.POS_MODEL)
    chunker = perceptron.AveragedPerceptron.load(perceptron.CHUNK_MODEL)
    vt, vc = perceptron._vectorize(tagger), perceptron._vectorize(chunker)
    words_l = [[w for w, _, _ in s] for s in test]
    tags_l = [[t for _, t, _ in s] for s in test]

    scalar_pos = [perceptron.tag_sentence(tagger, ws) for ws in words_l]
    assert perceptron.tag_sentences_vec(vt, words_l) == scalar_pos

    pairs = list(zip(words_l, tags_l))
    scalar_ch = [perceptron.chunk_sentence(chunker, ws, ts) for ws, ts in pairs]
    assert perceptron.chunk_sentences_vec(vc, pairs) == scalar_ch

    # budget-slicing path must not change a single tag
    orig = perceptron._TOKEN_BUDGET
    try:
        perceptron._TOKEN_BUDGET = 64
        assert perceptron.tag_sentences_vec(vt, words_l) == scalar_pos
        assert perceptron.chunk_sentences_vec(vc, pairs) == scalar_ch
    finally:
        perceptron._TOKEN_BUDGET = orig

    # degenerate shapes: no sentences, empty sentence, unicode digits
    assert perceptron.tag_sentences_vec(vt, []) == []
    assert perceptron.tag_sentences_vec(vt, [[]]) == [[]]
    odd = [["m²", "Ab3", "été", "..."]]
    assert perceptron.tag_sentences_vec(vt, odd) == [
        perceptron.tag_sentence(tagger, odd[0])
    ]


def test_wide_window_int32_exactness():
    """A chunker window wider than the constructor's _MAX_FEATS sizing
    (window=7 → 34 weight rows per token) must upcast the int32 matrix
    before summing: weights are chosen so the B-score sits just past
    2^31 at 34 rows — without ensure_exact the int32 sum wraps negative
    and the vectorized decode silently flips every tag to O."""
    words = [f"w{i}" for i in range(15)]
    tags = ["NN"] * 15
    feats = set()
    for prev, prev2 in [("-<S>-", "-<S>-"), ("B", "-<S>-"), ("B", "B")]:
        for i in range(len(words)):
            feats |= set(
                perceptron.chunk_features(i, words, tags, prev, prev2, window=7)
            )
    m = perceptron.AveragedPerceptron(["B", "O"])
    # q = 65e6: 32 rows stay under 2^31 (constructor keeps int32) but
    # the decoder's 34 rows/token exceed it
    m.weights = {f: {"B": 65.0} for f in feats}
    vm = perceptron.VectorizedPerceptron(m)
    assert vm.W.dtype == perceptron.np.int32
    scalar = perceptron.chunk_sentence(m, words, tags, window=7)
    assert scalar == ["B"] * 15
    assert perceptron.chunk_sentences_vec(vm, [(words, tags)], window=7) == [scalar]
    assert vm.W.dtype == perceptron.np.int64  # upcast actually happened


def test_vectorize_cache_is_weak():
    """_vectorize keys on the live model object; dropping the model must
    drop the cache entry (an id()-keyed cache would both leak and alias
    a recycled address to the wrong weight matrix)."""
    import gc

    m = perceptron.AveragedPerceptron(["A", "B"])
    m.weights = {"bias": {"A": 1.0}}
    before = len(perceptron._vec_cached)
    vm = perceptron._vectorize(m)
    assert perceptron._vectorize(m) is vm
    assert len(perceptron._vec_cached) == before + 1
    del m, vm
    gc.collect()
    assert len(perceptron._vec_cached) == before
