"""End-to-end KG-construction pipeline with lineage + resumability.

Orchestrates SURVEY.md §2 B1-B25 over a corpus in BASELINE.json
input_hint shape ``(repo, path, commit, lang, content, sha256)``:

    docs → sha256 invariant check → tokenize/candidates (one Arrow pass)
         → gazetteer prefix join → per-doc match filters
         → instance resolution → CC disambiguation → known facts
         → (doc_id, graph, subj, pred, obj) triples

Per north_rule:
* **sha256 invariant** — recomputed with Spark's JVM-side ``sha2``
  (no UDF) and compared per row; any mismatch fails the run.
* **skew** — input is salted-repartitioned by hash(repo, path, commit,
  salt) before the Arrow stages so a giant repo spreads across
  partitions; AQE skew-join splitting handles the join side.
* **checkpoints + lineage** — each stage can persist its output to
  ``<checkpoint_dir>/<stage>`` with a row-count + wall-time metrics
  record appended to ``<checkpoint_dir>/metrics.jsonl``; a re-run with
  the same dir resumes from the last completed stage (parquet is the
  recovery point — cheaper and more portable than Spark's RDD
  checkpoint format).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import facts, linking, serialize, spotting, textproc
from .kb.model import KB


@dataclass
class PipelineConfig:
    checkpoint_dir: str | None = None
    check_sha256: bool = True
    recommend: bool = False            # B24 (needs markov stats)
    resolver: str = "degree"           # B20 strategy (degree|flow|pagerank|hub|authority)
    template: str | None = None        # SPARQL extraction template (O1 pushdown)
    # B6 proper-name gate on candidate starts: False = off, True/"caps" =
    # first-char uppercase/digit (cheap, fully inside the vectorized
    # scan), "chunker" = trained conll2000 NP spans (perceptron.py — the
    # reference's filterNounPhrases; slower, catches lowercase NPs)
    np_candidate_filter: bool | str = False
    # language for the trained chunker path — "en" (conll2000 models) or
    # "de" (TIGER models; reference ships DE alongside EN,
    # TestNounPhraseChunker.java:37,43). Mirrors the per-document
    # Language argument of pipeline.createDocument.
    chunker_lang: str = "en"
    fused: bool = True                 # ONE shuffle+Arrow pass for B8-B21; False =
                                       # staged path (finer checkpoints for resume)
    # broadcast the KB relation graph as a per-subject adjacency when it
    # has at most this many non-type edges — the expansion edges then
    # never shuffle (rebuilt per doc inside the Arrow pass). Above the
    # cap (or above linking.kb_adjacency's ~64MB byte estimate, which
    # this default sits just under) the edge-join path runs instead.
    # 0 = off.
    adjacency_max_rows: int = 240_000
    # north_rule URI canonicalization (min-hash union-find over labels):
    # rewrite emitted subject URIs through the canonical map. Off by
    # default — it intentionally changes the triple set vs the reference.
    canonicalize: bool = False
    salt_partitions: int | None = None  # docs repartition width
    markov_chain: DataFrame | None = None
    type_clusters: DataFrame | None = None
    # FilterContext.infer (FilterContext.java:248-284): expand template
    # filters via markov domain/range + proper-noun ratings. Needs
    # markov_chain + type_clusters + proper_noun stats.
    template_infer: bool = False
    proper_noun: DataFrame | None = None
    infer_markov_probability: float = 0.0
    infer_rating: float = 0.0
    # stages that get a lineage cut / durable checkpoint. Only stages
    # consumed by MULTIPLE downstream operators need one; single-consumer
    # stages fuse into their consumer's job (fewer job barriers = less
    # fixed overhead per run). 'resolved' feeds recognized/known/types.
    # 'candidates' is consumed TWICE by the fused stage (the span rows
    # and the expansion-edge fetch are two branches of one cogroup
    # union) — without a cut the tokenize/suffix Arrow pass, the most
    # expensive stage, would execute once per branch. 'resolved' feeds
    # recognized/known/types. 'candidates_resolved' (staged path only)
    # is likewise consumed twice by disambiguate's cogroup union
    # (tagged rows + expansion_edges) — without a cut the whole
    # spot→resolve subtree would run once per branch.
    cut_stages: tuple = ("candidates", "candidates_resolved", "resolved", "summary")
    # cut the KB tables' lineage up front (needed for ETL-built KBs whose
    # plans would otherwise be re-embedded by every stage; a KB made of
    # local/in-memory relations can skip it)
    materialize_kb: bool = True
    # per-partition row counts in metrics.jsonl (skew audit). Off by
    # default: the extra groupBy(spark_partition_id) re-scans each
    # checkpointed stage's full output just for telemetry.
    partition_lineage: bool = False
    metrics: list = field(default_factory=list)


class Sha256MismatchError(RuntimeError):
    pass


def _stage(cfg: PipelineConfig, name: str, df: DataFrame, spark: SparkSession) -> DataFrame:
    """Stage boundary: durable parquet checkpoint + metrics when a
    checkpoint_dir is set, else an executor-local lineage cut.

    The cut is not optional at scale: stage outputs (mentions,
    candidates, resolved) are each consumed by several downstream joins,
    and every consumer re-embeds the producer's logical plan — without a
    boundary the plan tree grows multiplicatively per stage (observed:
    Catalyst OOMs building the explain string long before any data
    pressure)."""
    if not cfg.checkpoint_dir:
        if name not in cfg.cut_stages:
            return df
        t0 = time.time()
        out = df.localCheckpoint()
        cfg.metrics.append(
            {"stage": name, "wall_sec": round(time.time() - t0, 3)}
        )
        return out
    path = os.path.join(cfg.checkpoint_dir, name)
    marker = os.path.join(path, "_SUCCESS")
    t0 = time.time()
    if not os.path.exists(marker):
        df.write.mode("overwrite").parquet(path)
    out = spark.read.parquet(path)
    rec = {"stage": name, "wall_sec": round(time.time() - t0, 3)}
    if cfg.partition_lineage:
        # per-partition lineage: row count per physical partition of the
        # checkpoint (skew telemetry + resumable audit, north_rule).
        # Opt-in: this is one extra full scan of the stage output.
        per_part = {
            r["pid"]: r["count"]
            for r in out.groupBy(F.spark_partition_id().alias("pid")).count().collect()
        }
        n = sum(per_part.values())
        sizes = sorted(per_part.values())
        rec.update(
            rows=n,
            n_partitions=len(per_part),
            partition_rows_min=sizes[0] if sizes else 0,
            partition_rows_max=sizes[-1] if sizes else 0,
            partition_skew=round(sizes[-1] * len(sizes) / max(n, 1), 3)
            if sizes
            else 0.0,
        )
    cfg.metrics.append(rec)
    with open(os.path.join(cfg.checkpoint_dir, "metrics.jsonl"), "a") as fh:
        fh.write(json.dumps(rec) + "\n")
        if cfg.partition_lineage:
            fh.write(json.dumps({"stage": name, "partition_rows": per_part}) + "\n")
    return out


def _stage_done(cfg: PipelineConfig, name: str) -> bool:
    """True when the stage already has a durable checkpoint — eager
    driver-side work feeding only that stage can then be skipped."""
    return bool(cfg.checkpoint_dir) and os.path.exists(
        os.path.join(cfg.checkpoint_dir, name, "_SUCCESS")
    )


def check_sha256(docs: DataFrame) -> DataFrame:
    """Per-row content sha256 equality vs the source table (input_hint).
    Adds ``sha_ok``; ``assert_sha256`` enforces it. Fail-closed on
    NULLs: a row with NULL content or NULL sha256 is unverifiable and
    counts as a mismatch — a bare ``==`` would yield sha_ok = NULL,
    which ``~sha_ok`` then silently drops, letting corrupt rows pass
    the invariant."""
    return docs.withColumn(
        "sha_ok",
        F.coalesce(F.sha2(F.col("content"), 256) == F.col("sha256"), F.lit(False)),
    )


def assert_sha256(docs: DataFrame) -> None:
    bad = docs.filter(~F.col("sha_ok")).limit(1).count()
    if bad:
        raise Sha256MismatchError("content sha256 mismatch against source table")


def _source_parallelism(docs: DataFrame) -> int:
    """Partition count of ``docs`` WITHOUT executing anything: under
    AQE, ``Dataset.rdd`` materializes every upstream query stage just
    to learn the runtime partition count (measured: one real job on a
    shuffle-bearing plan), and the actual action would then run those
    shuffles again. Instead of toggling AQE off session-wide (a race:
    any query another thread plans during the probe window — e.g.
    streaming's foreachBatch — would silently lose AQE and its
    skew-join splitting), read the count from ``queryExecution().
    sparkPlan()`` — the physical plan BEFORE adaptive preparation,
    whose partition counts are static, built without touching session
    conf. Under AQE the executed plan is AdaptiveSparkPlanExec; its
    ``initialPlan`` is that same static plan after stage preparation
    (exchanges planted), so ``execute()`` on it only assembles the RDD
    chain lazily (verified job-free in tests/test_skew.py). One
    residual cost: plans with broadcast joins still collect their
    (by-definition small) dim sides at prepare — bounded by the
    broadcast threshold, never the corpus itself."""
    plan = docs._jdf.queryExecution().executedPlan()
    if plan.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        plan = plan.initialPlan()
    return plan.execute().getNumPartitions()


def spread_if_narrow(df: DataFrame, *key_cols: str) -> DataFrame:
    """Generic gated input spread for operator-library entry points:
    repartition ``df`` across default parallelism by
    ``xxhash64(key_cols)`` ONLY when the source plan has fewer
    partitions (a single-split parquet file, a hand-built DataFrame) —
    otherwise the operator's narrow pre-shuffle compute (token
    explodes, per-row quantizer folds, regex scans) serializes on one
    task. Same policy as :func:`spread_input` (which additionally
    honors the flagship's cfg.salt_partitions); a byte-split 100 TB
    scan already has the partitions, so at scale this is a no-op and
    no blanket shuffle is paid."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if _source_parallelism(df) < target:
        return df.repartition(target, F.xxhash64(*[F.col(c) for c in key_cols]))
    return df


def spread_input(spark: SparkSession, docs: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Skew-spread the input corpus ONLY when the source is
    under-parallel (one giant file / a hand-built DataFrame): at 100 TB
    the parquet reader's byte-bounded splits already balance the scan,
    and a blanket full-text shuffle of the whole input ahead of a
    *narrow* Arrow pass would be the dominant cost of the job (removing
    it was worth +65% flagship throughput at ×960 — BASELINE.md).

    The partition-COUNT gate cannot see row skew hiding *inside* enough
    partitions (e.g. a filter that keeps only one repo's rows from a
    corpus file-clustered by repo) — a narrow Arrow stage downstream
    cannot be rebalanced by AQE either. For such inputs set
    ``cfg.salt_partitions``, which force-spreads by
    ``xxhash64(repo, path, commit)`` regardless of the count."""
    n_parts = cfg.salt_partitions or spark.sparkContext.defaultParallelism * 2
    if cfg.salt_partitions or _source_parallelism(docs) < n_parts:
        return docs.repartition(n_parts, F.xxhash64("repo", "path", "commit"))
    return docs


def extract_triples(
    spark: SparkSession,
    docs: DataFrame,
    kb: KB,
    cfg: PipelineConfig | None = None,
) -> DataFrame:
    """The flagship job: corpus + KB → (doc_id, graph, subj, pred, obj)."""
    cfg = cfg or PipelineConfig()
    if cfg.materialize_kb:
        kb = kb.materialize()

    # --- driver-side prep, overlapped ----------------------------------
    # Three eager dictionary-scale jobs gate the corpus stages: the
    # well-known-URI lookups (rdf:type / rdfs:label — kb.model.uri_ids,
    # one batched collect), the prefix-set + suffix-cap aggregation, and
    # (fused path) the adjacency broadcast build. They read disjoint,
    # already-checkpointed KB tables, so they run on worker threads
    # while the driver keeps going — the adjacency future is only
    # joined right before spot_resolve needs it, which lets it overlap
    # the candidates checkpoint job too. Profiled at sf0.1 ×1: the same
    # work serial was the longest driver chain (~1 s of the 7 s wall).
    from concurrent.futures import ThreadPoolExecutor

    from .kb.model import RDF_TYPE
    from .linking import RDFS_LABEL_URI

    prep = ThreadPoolExecutor(max_workers=2)
    f_uri = prep.submit(kb.uri_ids, [RDF_TYPE, RDFS_LABEL_URI])
    f_pref = (
        None
        if _stage_done(cfg, "candidates")
        else prep.submit(
            kb.literals.groupBy("prefix")
            .agg(F.max(F.length("literal")).alias("ml"))
            .collect
        )
    )

    # --- ingest + skew spreading ---------------------------------------
    # sha256 invariant is enforced INSIDE the candidates Arrow pass
    # (textproc.suffix_candidates) — no separate corpus scan.
    docs = spread_input(spark, docs, cfg)
    docs = textproc.with_doc_id(docs)

    # --- B1-B9: candidates + gazetteer join ---------------------------
    # ONE dictionary-scale job yields both the distinct prefix set and
    # max(len(literal)); the latter caps emitted suffixes at
    # max_lit + 1 (the +1 feeds the B12 tiling probe) — shrinking every
    # candidate row shipped through the spot join. Skipped entirely when
    # the candidates checkpoint will be reused (resume path).
    if f_pref is None:
        kb_prefixes, suffix_cap = [], textproc.MAX_SUFFIX_LEN
    else:
        pref_rows = f_pref.result()
        kb_prefixes = [r["prefix"] for r in pref_rows]
        max_lit = max((r["ml"] for r in pref_rows), default=0)
        suffix_cap = min(textproc.MAX_SUFFIX_LEN, max_lit + 1)
    f_uri.result()  # cache filled before any stage asks for rdf_type_id
    # fused-path adjacency build (eager toPandas + sc.broadcast) starts
    # now so it overlaps the candidates checkpoint job below; memoized
    # on the KB, so streaming micro-batches resolve instantly
    f_adj = (
        prep.submit(linking.kb_adjacency_broadcast, kb, cfg.adjacency_max_rows)
        if cfg.fused and cfg.adjacency_max_rows and not _stage_done(cfg, "resolved")
        else None
    )
    prep.shutdown(wait=False)
    np_mode = cfg.np_candidate_filter
    cand_df = textproc.suffix_candidates(
        docs,
        kb_prefixes,
        check_sha256=cfg.check_sha256,
        np_filter=bool(np_mode) and np_mode != "chunker",
        max_suffix_len=suffix_cap,
    )
    if np_mode == "chunker":
        from . import perceptron

        cand_df = perceptron.np_span_filter(cand_df, docs, lang=cfg.chunker_lang)
    candidates = _stage(cfg, "candidates", cand_df, spark)
    gazetteer = kb.gazetteer()
    ctx = None
    typed = None
    if cfg.template:
        from .filters import compile_template

        ctx = compile_template(cfg.template, kb)
        if (
            cfg.template_infer
            and cfg.markov_chain is not None
            and cfg.type_clusters is not None
            and cfg.proper_noun is not None
        ):
            ctx.infer(
                cfg.markov_chain,
                cfg.type_clusters,
                cfg.proper_noun,
                cfg.infer_markov_probability,
                cfg.infer_rating,
            )
        gazetteer = ctx.filter_gazetteer(gazetteer)
        # The reference compiles type/subject/object-property filters
        # but only ever APPLIES the datatype-property one
        # (RDFLiteralSpotting.java:62 is the sole IndexFilter consumer);
        # pushing types and explicit subjects into candidate resolution
        # is this port's O1 extension — both compose as one AND'd
        # subject allow-list.
        if ctx.types:
            # keep only candidate subjects carrying a requested rdf:type
            typed = kb.relations.filter(
                (F.col("p") == kb.rdf_type_id) & F.col("o").isin(*ctx.types)
            ).select(F.col("s").alias("subject"))
        if ctx.subjects:
            # a template naming explicit subject URIs restricts the
            # recognized graph to them (previously compiled but ignored)
            subj_df = spark.createDataFrame(
                [(int(s),) for s in sorted(ctx.subjects)], "subject long"
            )
            typed = (
                subj_df
                if typed is None
                else typed.join(F.broadcast(subj_df), "subject", "left_semi")
            )

    # --- B8-B21: spotting + linking + disambiguation ------------------
    if cfg.fused:
        # ONE doc_id shuffle + ONE Arrow pass for span filters +
        # disambiguation (gazetteer/symbols joins stay narrow upstream).
        # The adjacency broadcast was built on a prep thread above,
        # overlapping the candidates checkpoint; join it here.
        adjacency = f_adj.result() if f_adj is not None else None
        resolved = _stage(
            cfg,
            "resolved",
            linking.spot_resolve(
                candidates,
                kb,
                cfg.resolver,
                gazetteer=gazetteer,
                subject_filter=typed,
                adjacency=adjacency,
            ),
            spark,
        )
    else:
        mentions = _stage(cfg, "mentions", spotting.spot(candidates, gazetteer), spark)
        cand_subjects = linking.resolve_instances(mentions, kb)
        if typed is not None:
            cand_subjects = cand_subjects.join(typed, "subject", "left_semi")
        cand_subjects = _stage(cfg, "candidates_resolved", cand_subjects, spark)
        resolved = _stage(
            cfg, "resolved", linking.disambiguate(cand_subjects, kb, cfg.resolver), spark
        )

    # --- B22-B25: facts + triples --------------------------------------
    # ONE dedup shuffle over the resolved table; every output branch
    # (recognized labels, rdf:type rows, known facts) derives from it
    summary = _stage(
        cfg,
        "summary",
        resolved.select("doc_id", "subject", "prop_id", "surface").distinct(),
        spark,
    )
    types = linking.subject_types(summary, kb)
    recognized = serialize.recognized_triples(summary, types, kb, assume_distinct=True)
    known = serialize.known_triples(facts.known_facts(summary, kb), kb)
    triples = recognized.unionByName(known)

    if cfg.recommend and cfg.markov_chain is not None and cfg.type_clusters is not None:
        predicted = facts.recommend_facts(
            resolved, kb, cfg.markov_chain, cfg.type_clusters
        )
        triples = triples.unionByName(serialize.predicted_triples(predicted, kb))

    if cfg.canonicalize:
        canon = linking.canonicalize_by_label(kb)
        triples = linking.apply_canonical_map(triples, canon, kb.resources)

    # NO distinct here: every graph branch dedups in id space before the
    # uri decode, and the branches are disjoint on `graph` — a final
    # distinct would shuffle the full decoded-string output once more
    return _stage(cfg, "triples", triples, spark)


def precision_recall(found: DataFrame, expected: DataFrame) -> dict[str, float]:
    """Triple-set P/R (reference per-stage compare protocol,
    e.g. InstanceRecognition.compare:257-305) over (graph, subj, pred,
    obj) — delegates to the one set-P/R implementation
    (evaluate.set_precision_recall, which also unpersists its working
    caches; the previous inline copy leaked two cached DataFrames per
    call)."""
    from .evaluate import set_precision_recall

    r = set_precision_recall(found, expected, ["graph", "subj", "pred", "obj"])
    r["expected"] = r.pop("truth")
    return r
