"""SPARQL-template filters (O1), streaming mode, evaluator, ratings,
regex NER, alternate resolvers."""

import pytest
from pyspark.sql import functions as F

from scoobie_spark import evaluate, rating, regexner, streaming, textproc
from scoobie_spark.filters import compile_template
from scoobie_spark.fixtures import (
    EX_INST,
    EX_ONT,
    RDFS_LABEL,
    micro_docs,
    micro_kb,
)
from scoobie_spark.pipeline import PipelineConfig, extract_triples


TEMPLATE = f"""
PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
PREFIX ex: <{EX_ONT}>
SELECT * WHERE {{
  GRAPH <http://example#recognized> {{
    ?s rdfs:label ?l .
    ?s a ex:Person .
    ?s ex:livesIn ?place .
  }}
}}
"""


def test_compile_template(spark):
    kb = micro_kb(spark)
    ctx = compile_template(TEMPLATE, kb)
    assert ctx.datatype_properties == {7}        # rdfs:label
    assert ctx.object_properties == {4}          # ex:livesIn
    assert ctx.types == {2}                      # ex:Person
    gaz = ctx.filter_gazetteer(kb.gazetteer())
    assert gaz.count() == 2  # both literals are rdfs:label


def test_template_pushdown_restricts_extraction(spark):
    """A template naming a property absent from the KB symbols yields an
    empty gazetteer → no recognized triples."""
    kb = micro_kb(spark)
    t = """
    PREFIX foaf: <http://xmlns.com/foaf/0.1/>
    SELECT * WHERE { GRAPH <http://x#recognized> { ?s foaf:name "x" . } }
    """
    cfg = PipelineConfig(template=t)
    out = extract_triples(spark, micro_docs(spark), kb, cfg)
    assert out.count() == 0


def test_resolver_variants_agree_on_micro(spark):
    """All resolver strategies keep the micro fixture's unambiguous
    resolution identical (no ambiguous components there)."""
    docs, kb = micro_docs(spark), micro_kb(spark)
    base = None
    for r in ("degree", "flow", "pagerank", "hub", "authority", "hits", "hits2", "random"):
        got = {
            (x["graph"], x["subj"], x["pred"], x["obj"])
            for x in extract_triples(spark, docs, kb, PipelineConfig(resolver=r)).collect()
        }
        if base is None:
            base = got
        assert got == base, r


def test_streaming_extract(spark, tmp_path):
    """Streaming ingestion: corpus parquet → readStream → foreachBatch
    pipeline → parquet triples sink; result equals the batch run."""
    docs = micro_docs(spark)
    src = str(tmp_path / "src")
    docs.write.parquet(src)
    kb = micro_kb(spark)

    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = streaming.streaming_extract(
        spark, stream, kb, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    got = {
        (r["graph"], r["subj"], r["pred"], r["obj"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    batch = {
        (r["graph"], r["subj"], r["pred"], r["obj"])
        for r in extract_triples(spark, docs, kb).collect()
    }
    assert got == batch


def test_windowed_and_session_static(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    w = streaming.windowed_event_counts(events, window="1 hour")
    assert w.count() > 0
    s = streaming.sessionized_events(events, gap="30 minutes")
    total = s.agg(F.sum("n_events")).first()[0]
    assert total == events.count()


def test_evaluator_pr_and_map(spark):
    found = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], "doc_id long, subject string"
    )
    truth = spark.createDataFrame(
        [(1, "a"), (1, "x"), (2, "c")], "doc_id long, subject string"
    )
    pr = evaluate.set_precision_recall(found, truth, ["doc_id", "subject"])
    assert pr["precision"] == pytest.approx(2 / 3)
    assert pr["recall"] == pytest.approx(2 / 3)

    ranked = spark.createDataFrame(
        [(1, "a", 0.9), (1, "b", 0.8), (1, "x", 0.7), (2, "c", 1.0)],
        "doc_id long, subject string, score double",
    )
    m = evaluate.mean_average_precision(ranked, truth)
    # doc1: rels a(rank1, p=1), x(rank3, p=2/3) → AP=5/6; doc2: AP=1 → MAP=11/12
    assert m == pytest.approx((5 / 6 + 1) / 2)


def test_relevance_rating_default_capacity(spark):
    docs, kb = micro_docs(spark), micro_kb(spark)
    from scoobie_spark import linking, spotting
    from scoobie_spark.pipeline import extract_triples  # noqa: F401

    d = textproc.with_doc_id(docs)
    prefixes = [r[0] for r in kb.literals.select("prefix").collect()]
    cand = textproc.suffix_candidates(d, prefixes)
    mentions = spotting.spot(cand, kb.gazetteer())
    resolved = linking.disambiguate(linking.resolve_instances(mentions, kb), kb)
    scores = rating.relevance_scores(resolved, kb, d, metrics=["capacity", "degree", "tf"])
    rows = scores.collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["score"] <= 1.0


def test_regexner(spark):
    docs = spark.createDataFrame(
        [(1, "meet on 2024-01-05, mail bob@example.org, pi is 3.14")],
        "doc_id long, content string",
    )
    ents = {(r["regex"], r["value"]) for r in regexner.regex_entities(docs).collect()}
    assert ("DATE", "2024-01-05") in ents
    assert ("MAIL", "bob@example.org") in ents
    assert ("FLOAT", "3.14") in ents


def test_rdfa_serializer(spark):
    from scoobie_spark import linking, serialize, spotting

    docs, kb = micro_docs(spark), micro_kb(spark)
    d = textproc.with_doc_id(docs)
    prefixes = [r[0] for r in kb.literals.select("prefix").collect()]
    mentions = spotting.spot(textproc.suffix_candidates(d, prefixes), kb.gazetteer())
    resolved = linking.disambiguate(linking.resolve_instances(mentions, kb), kb)
    rdfa = {r["doc_id"]: r["rdfa"] for r in serialize.rdfa_serialize(d, resolved, kb).collect()}
    percy_doc = d.filter(F.col("path") == "docs/percy.txt").first()["doc_id"]
    markup = rdfa[percy_doc]
    assert '<span about="http://example.org/instance#Percy_Jackson"' in markup
    assert ">Percy Jackson</span>" in markup
    assert markup.count("<span") == 2


def test_streaming_dedup_first(spark, tmp_path):
    """applyInPandasWithState exact-dedup: one row per content hash
    across micro-batches."""
    from scoobie_spark.fixtures import micro_docs
    from scoobie_spark.streaming import streaming_dedup_first

    src = tmp_path / "in"
    src.mkdir()
    docs = micro_docs(spark)
    # duplicate the corpus → every sha appears twice in the stream
    docs.write.parquet(str(src / "a"))
    docs.write.parquet(str(src / "b"))
    stream = spark.readStream.schema(docs.schema).parquet(str(src) + "/*")
    q = (
        streaming_dedup_first(stream)
        .writeStream.format("memory")
        .queryName("dedup_first")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT sha256 FROM dedup_first").collect()
    shas = [r["sha256"] for r in got]
    n_unique = docs.select("sha256").distinct().count()
    assert len(shas) == len(set(shas)) == n_unique


def test_template_infer_expands_filters(spark):
    """FilterContext.infer parity (FilterContext.java:248-284,
    QueryExperiment.java:216-302): a template naming ONLY an object
    property spots nothing literally (no datatype property compiled),
    but after infer() the markov chain resolves livesIn's domain/range
    clusters and the proper-noun ratings add rdfs:label — so the same
    template now drives a real extraction."""
    from scoobie_spark.fixtures import synth_corpus, synth_kb
    from scoobie_spark.kb.stats import markov_chain, proper_noun_rating, type_clusters

    kb = synth_kb(spark, n_instances=60)
    clusters = type_clusters(kb, sample_per_type=None)
    mc = markov_chain(kb, clusters)
    pn = proper_noun_rating(kb, clusters)
    docs = synth_corpus(spark, n_docs=30, n_instances=60)
    t = f"""
    PREFIX ex: <{EX_ONT}>
    SELECT * WHERE {{ GRAPH <http://x#recognized> {{ ?s ex:livesIn ?o . }} }}
    """

    literal = extract_triples(spark, docs, kb, PipelineConfig(template=t))
    assert literal.filter(F.col("graph") == "recognized").count() == 0

    inferred = extract_triples(
        spark,
        docs,
        kb,
        PipelineConfig(
            template=t,
            template_infer=True,
            markov_chain=mc,
            type_clusters=clusters,
            proper_noun=pn,
        ),
    )
    n = inferred.filter(F.col("graph") == "recognized").count()
    assert n > 0, "inferred rdfs:label property must enable spotting"


def test_template_infer_type_substitution(spark):
    """infer() substitutes literal template types with their cluster
    labels (the getCluster step)."""
    from scoobie_spark.filters import compile_template
    from scoobie_spark.fixtures import synth_kb
    from scoobie_spark.kb.stats import markov_chain, proper_noun_rating, type_clusters

    kb = synth_kb(spark, n_instances=60)
    clusters = type_clusters(kb, sample_per_type=None)
    mc = markov_chain(kb, clusters)
    pn = proper_noun_rating(kb, clusters)
    t = f"""
    PREFIX ex: <{EX_ONT}>
    SELECT * WHERE {{ GRAPH <http://x#recognized> {{ ?s a ex:Person . }} }}
    """
    ctx = compile_template(t, kb)
    before = set(ctx.types)
    ctx.infer(mc, clusters, pn)
    cl_map = {r["type"]: r["cluster"] for r in clusters.collect()}
    assert ctx.types == {cl_map.get(x, x) for x in before}
    # the cluster's high-rated labeling property joined the filter
    assert ctx.datatype_properties


def test_streaming_extract_with_chunker_config(spark, tmp_path):
    """The streaming path accepts the full PipelineConfig surface: with
    the trained conll2000 NP-chunker gate on, the streamed triple set
    equals the batch run under the same config (and checkpoint_dir in
    the pipeline config is rejected — batches would collide)."""
    from scoobie_spark.pipeline import PipelineConfig

    docs = micro_docs(spark)
    src = str(tmp_path / "src")
    docs.write.parquet(src)
    kb = micro_kb(spark)
    cfg = PipelineConfig(np_candidate_filter="chunker")

    stream = spark.readStream.schema(docs.schema).parquet(src)
    with pytest.raises(ValueError):
        streaming.streaming_extract(
            spark, stream, kb, str(tmp_path / "o2"), str(tmp_path / "c2"),
            config=PipelineConfig(checkpoint_dir=str(tmp_path / "bad")),
        )
    q = streaming.streaming_extract(
        spark, stream, kb, str(tmp_path / "out"), str(tmp_path / "ckpt"),
        config=cfg,
    )
    q.awaitTermination(120)

    got = {
        (r["graph"], r["subj"], r["pred"], r["obj"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    batch = {
        (r["graph"], r["subj"], r["pred"], r["obj"])
        for r in extract_triples(spark, docs, kb, cfg).collect()
    }
    assert got == batch and got


def test_template_subject_filter_applied(spark):
    """A template naming an explicit subject URI restricts the
    recognized graph to that subject (the filter used to compile into
    ctx.subjects and then be silently ignored)."""
    from scoobie_spark.fixtures import EX_INST

    kb = micro_kb(spark)
    docs = micro_docs(spark)
    t = f"""
    PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
    SELECT * WHERE {{
      GRAPH <http://example#recognized> {{
        <{EX_INST}Percy_Jackson> rdfs:label ?l .
      }}
    }}
    """
    out = extract_triples(spark, docs, kb, PipelineConfig(template=t))
    rows = {
        (r["graph"], r["subj"]) for r in out.select("graph", "subj").collect()
    }
    subjects = {s for _, s in rows}
    assert subjects, "explicit-subject template must still extract"
    assert subjects == {EX_INST + "Percy_Jackson"}
    # unknown subject URI compiles to the impossible id -> empty output
    t_missing = t.replace("Percy_Jackson", "No_Such_Instance")
    assert extract_triples(spark, docs, kb, PipelineConfig(template=t_missing)).count() == 0
