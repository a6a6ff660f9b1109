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
