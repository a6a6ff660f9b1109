"""DuckDB SQL twin of the FLAGSHIP pipeline — an independent replay of
B1-B25 (candidates → gazetteer spotting → span filters → instance
resolution → degree disambiguation → known facts → triples) in pure
ANSI-ish SQL, value-for-value against ``pipeline.extract_triples`` over
``fixtures.synth_corpus`` + ``fixtures.synth_kb``.

This converts the flagship query from a rows-only driver check to a
full hash-verified oracle. Every stage is recomputed from the raw
``documents`` table — nothing is copied from the Spark side:

* corpus + KB synthesis replays ``fixtures.synth_corpus`` /
  ``synth_kb_rows`` (pure hash-derived content, so SQL can rebuild it);
* ``doc_id`` replays Spark's chained 3-column ``xxhash64(repo, path,
  commit)`` bit-for-bit via :mod:`scoobie_spark.xxh64_sql` (each
  column's hash seeds the next, catalyst XxHash64 fold);
* spotting (reference ``RDFLiteralSpotting.java:58-246``) reduces to a
  positional scan: a mention exists at 0-based ``begin`` iff ``begin``
  is a token start with an alnum head (SuffixArray.java:114) and the
  document text equals the literal case-insensitively over its length.
  The 4-char prefix-hash probe needs no replay here: every fixture
  literal is ≥ 4 chars, so the candidate's lowercase prefix hash equals
  the literal's stored prefix exactly when the ci-startswith residual
  holds (hash collisions only ever ADD candidates, and those are
  removed by the same residual);
* B10 longest-match: the per-doc greedy scan over (begin asc, end
  desc)-sorted spans (spotting.py:_filter_batch) is provably equivalent
  to "drop a span iff SOME strictly-longer span in the doc contains
  it" — containment is transitive and the sort order guarantees any
  strictly-longer container precedes the contained span, so the greedy
  anchor chain reaches it (anchor-chain induction: if the current
  anchor contains span i strictly and the next kept anchor k is not the
  same span, then k extends past the old anchor's end and still
  contains i strictly). Hence an EXISTS anti-filter;
* B11 case filter keys on (doc, surface): a non-exact row drops iff
  some B10-surviving row with the SAME surface is case-exact
  (RDFLiteralSpotting.filterCaseMatches:216-246);
* B12 tiling is the 2-char word-boundary test computed at join time in
  Spark (spotting.py:join_gazetteer) — replayed with substr + regexp;
* B16-B21 (linking.py:_resolve_one): bipartite phrase edges, per-doc
  weak components as min-reachable-node (recursive CTE — the
  union-find roots at the min node id, so closure-min is identical),
  anchor-guarded KB expansion edges (forward from unambiguous anchors,
  backward into ambiguous ones, traverseForward/Backward
  EntityDisambiguation.java:409-465), degree-≤1 intermediate pruning,
  winner per ambiguous component = max score with min-subject-id
  tie-break. The B20 score is pluggable (``resolver`` arg): degree =
  in+out over the edge multiset; random = splitmix64(subject) in
  UBIGINT ops; pagerank = 15 unrolled damped iterations; hits/hits2 =
  10 unrolled normalize-each-half HITS iterations (f64 — summation-
  order drift vs numpy cannot flip the argmax winner unless two
  scores agree to ~1e-15, and exact ties fall to the same id rule);
* B22/B25 (facts.known_facts, serialize.recognized/known_triples):
  joins + dictionary decode, id-space dedup before decode.

The SQL assumes the driver defaults the flagship runs under in the
correctness harness: ``n_instances=200``, ``filler_repeat=1``,
``corpus_factor=1`` (queries.q_flagship_triples env defaults).
"""

from __future__ import annotations

from .fixtures import (
    _CLASSES,
    _FIRST,
    _LAST,
    _REL_PREDS,
    EX_INST,
    EX_ONT,
    RDF_TYPE,
    RDFS_LABEL,
)
from .xxh64_sql import xxh64_string_ctes


def _values(words: list[str]) -> str:
    return ", ".join(f"({i}, '{w}')" for i, w in enumerate(words))


def _signed64(h: str) -> str:
    return (
        f"CAST(CASE WHEN {h} >= 9223372036854775808 "
        f"THEN CAST({h} AS HUGEINT) - 18446744073709551616 "
        f"ELSE CAST({h} AS HUGEINT) END AS BIGINT)"
    )


# ASCII word-char class — content is verified ASCII, where Spark's
# rlike([\p{L}\p{N}_]) and Python's \w reduce to this
_W = "[0-9A-Za-z_]"


def _splitmix64_sql() -> str:
    """linking._resolve_one's deterministic RandomResolver stand-in:
    score(subject) = splitmix64(subject id), replayed in UBIGINT ops."""
    from .xxh64_sql import add64, mul64

    x0 = add64("CAST(subject AS UBIGINT)", str(0x9E3779B97F4A7C15))
    x1 = mul64("xor(g0, g0 >> 30)", 0xBF58476D1CE4E5B9)
    x2 = mul64("xor(g1, g1 >> 27)", 0x94D049BB133111EB)
    return f"""score AS MATERIALIZED (
  SELECT doc_id, subject AS v, xor(g2, g2 >> 31) AS sc FROM (
    SELECT doc_id, subject, {x2} AS g2 FROM (
      SELECT doc_id, subject, {x1} AS g1 FROM (
        SELECT doc_id, subject, {x0} AS g0 FROM amb_subj)))
)"""


def _degree_score_sql() -> str:
    return """score AS MATERIALIZED (
  SELECT doc_id, v, count(*) AS sc FROM (
    SELECT doc_id, src AS v FROM ge UNION ALL SELECT doc_id, dst FROM ge)
  GROUP BY doc_id, v
)"""


def _iter_graph_ctes() -> str:
    """Shared prep for the iterative resolvers: BINARY adjacency over
    the doc graph (numpy sets adj[a,b]=1.0 — multiplicity collapses),
    restricted to docs that actually have an ambiguous component (the
    scores of other docs are never consulted)."""
    return """amb_docs AS (SELECT DISTINCT doc_id FROM amb_comp),
gedges AS MATERIALIZED (
  SELECT DISTINCT g.doc_id, g.src, g.dst FROM ge g JOIN amb_docs USING (doc_id)
),
gnodes AS MATERIALIZED (
  -- NOTE: inside a WITH RECURSIVE list, DuckDB (1.0) treats a
  -- top-level UNION in a non-recursive CTE body with recursive-union
  -- machinery and does NOT dedup across the two branches — endpoint
  -- unions must go through a subquery with an outer DISTINCT
  SELECT DISTINCT doc_id, v FROM (
    SELECT doc_id, src AS v FROM gedges
    UNION ALL SELECT doc_id, dst FROM gedges)
)"""


def _pagerank_score_sql(iters: int = 15) -> str:
    """PageRankBasedResolver replay (linking.py:_resolve_one): 15 rounds
    of r = 0.1 + 0.9 * (adj.T @ (r / max(outdeg, 1))) from r0 = 1,
    unrolled as chained CTEs (same simultaneous-update semantics as the
    numpy loop; f64 summation-order drift cannot flip the winner
    argmax unless two scores tie to ~1e-15, and exact ties resolve by
    the same min-id rule on both sides)."""
    ctes = [
        _iter_graph_ctes(),
        """gouts AS MATERIALIZED (
  SELECT doc_id, src AS v, greatest(count(*), 1)::DOUBLE AS outs
  FROM gedges GROUP BY doc_id, src
)""",
        "pr0 AS (SELECT doc_id, v, 1.0::DOUBLE AS r FROM gnodes)",
    ]
    for k in range(1, iters + 1):
        ctes.append(f"""pr{k} AS MATERIALIZED (
  SELECT n.doc_id, n.v, 0.1 + 0.9 * coalesce(c.con, 0) AS r
  FROM gnodes n LEFT JOIN (
    SELECT e.doc_id, e.dst AS v, sum(p.r / o.outs) AS con
    FROM gedges e
    JOIN pr{k - 1} p ON p.doc_id = e.doc_id AND p.v = e.src
    JOIN gouts o ON o.doc_id = e.doc_id AND o.v = e.src
    GROUP BY e.doc_id, e.dst) c ON c.doc_id = n.doc_id AND c.v = n.v
)""")
    ctes.append(f"score AS (SELECT doc_id, v, r AS sc FROM pr{iters})")
    return ",\n".join(ctes)


def _hits_score_sql(combine: str, iters: int = 10) -> str:
    """HITS replay (Hits/Hits2BasedResolver via linking.py): 10 rounds
    of a = A^T h; a /= max(||a||, 1e-12); h = A a; h /= max(||h||,
    1e-12) from h0 = 1. ``combine`` is the final per-node score:
    'h.x * a.x' (hits) or 'h.x + a.x' (hits2)."""
    ctes = [
        _iter_graph_ctes(),
        "h0 AS (SELECT doc_id, v, 1.0::DOUBLE AS x FROM gnodes)",
    ]
    for k in range(1, iters + 1):
        ctes.append(f"""a{k}_raw AS (
  SELECT n.doc_id, n.v, coalesce(c.s, 0) AS x
  FROM gnodes n LEFT JOIN (
    SELECT e.doc_id, e.dst AS v, sum(p.x) AS s
    FROM gedges e JOIN h{k - 1} p ON p.doc_id = e.doc_id AND p.v = e.src
    GROUP BY e.doc_id, e.dst) c ON c.doc_id = n.doc_id AND c.v = n.v
),
a{k} AS MATERIALIZED (
  SELECT doc_id, v,
         x / greatest(sqrt(sum(x * x) OVER (PARTITION BY doc_id)), 1e-12) AS x
  FROM a{k}_raw
),
h{k}_raw AS (
  SELECT n.doc_id, n.v, coalesce(c.s, 0) AS x
  FROM gnodes n LEFT JOIN (
    SELECT e.doc_id, e.src AS v, sum(p.x) AS s
    FROM gedges e JOIN a{k} p ON p.doc_id = e.doc_id AND p.v = e.dst
    GROUP BY e.doc_id, e.src) c ON c.doc_id = n.doc_id AND c.v = n.v
),
h{k} AS MATERIALIZED (
  SELECT doc_id, v,
         x / greatest(sqrt(sum(x * x) OVER (PARTITION BY doc_id)), 1e-12) AS x
  FROM h{k}_raw
)""")
    ctes.append(f"""score AS (
  SELECT h.doc_id, h.v, {combine} AS sc
  FROM h{iters} h JOIN a{iters} a ON a.doc_id = h.doc_id AND a.v = h.v
)""")
    return ",\n".join(ctes)


_RESOLVER_SCORE_SQL = {
    "degree": _degree_score_sql,
    "random": _splitmix64_sql,
    "pagerank": _pagerank_score_sql,
    "hits": lambda: _hits_score_sql("h.x * a.x"),
    "hits2": lambda: _hits_score_sql("h.x + a.x"),
}


def kb_synthesis_ctes(n: int) -> str:
    """CTE block replaying ``fixtures.synth_kb_rows(n)`` + the driver-side
    dictionary encode (fixtures.py:215-237): instance labels, string
    triples, row_number-over-sorted-uri ids, and the ``rel`` / ``litid``
    / ``symtab`` tables every synthetic-KB oracle starts from. Shared by
    the flagship oracle and the b14 maxent-decode oracle
    (:mod:`scoobie_spark.b14_sql`)."""
    nf, nl = len(_FIRST), len(_LAST)
    return f"""-- ====================== KB synthesis (fixtures.synth_kb_rows) ========
firsts(fi, fw) AS (VALUES {_values(_FIRST)}),
lasts(li, lw) AS (VALUES {_values(_LAST)}),
classes(ci, cw) AS (VALUES {_values(_CLASSES)}),
rpreds(pi, pw) AS (VALUES {_values(_REL_PREDS)}),
idx AS (SELECT unnest(generate_series(0, {n - 1})) AS i),
lab AS (
  SELECT i, fw || ' ' || lw AS label
  FROM idx JOIN firsts ON fi = i % {nf}
           JOIN lasts ON li = (i * 7 + i // {nf}) % {nl}
),
inst AS (  -- per-instance uri, class, planted (possibly shared) label
  SELECT a.i,
         '{EX_INST}inst_' || a.i AS uri,
         '{EX_ONT}' || cw AS cls_uri,
         CASE WHEN a.i > 0 AND a.i % 10 = 0 THEN p.label ELSE a.label END AS label
  FROM lab a JOIN classes ON ci = a.i % {len(_CLASSES)}
             LEFT JOIN lab p ON p.i = a.i - 1
),
rel_str(su, pu, ou) AS (
  SELECT uri, '{RDF_TYPE}', cls_uri FROM inst
  UNION ALL
  SELECT uri, '{EX_ONT}' || pw, '{EX_INST}inst_' || ((i + 1) % {n})
  FROM inst JOIN rpreds ON pi = i % {len(_REL_PREDS)}
  UNION ALL
  SELECT uri, '{EX_ONT}knows', '{EX_INST}inst_' || ((i + 7) % {n})
  FROM inst WHERE i % 3 = 0
),
urid AS MATERIALIZED (  -- dictionary: row_number over sorted uri (fixtures.py:215-224)
  SELECT u AS uri, row_number() OVER (ORDER BY u) - 1 AS id
  FROM (SELECT su AS u FROM rel_str UNION SELECT pu FROM rel_str
        UNION SELECT ou FROM rel_str UNION SELECT uri FROM inst
        UNION SELECT '{RDFS_LABEL}')
),
litid AS MATERIALIZED (
  SELECT label AS literal, row_number() OVER (ORDER BY label) - 1 AS lit_id
  FROM (SELECT DISTINCT label FROM inst)
),
rel AS MATERIALIZED (
  SELECT DISTINCT su.id AS s, pu.id AS p, ou.id AS o
  FROM rel_str JOIN urid su ON su.uri = rel_str.su
               JOIN urid pu ON pu.uri = rel_str.pu
               JOIN urid ou ON ou.uri = rel_str.ou
),
tid AS (SELECT id FROM urid WHERE uri = '{RDF_TYPE}'),
lblid AS (SELECT id FROM urid WHERE uri = '{RDFS_LABEL}'),
rel_nt AS MATERIALIZED (SELECT * FROM rel WHERE p <> (SELECT id FROM tid)),
symtab AS MATERIALIZED (  -- (subject, prop, lit): every label symbol
  SELECT su.id AS subject, (SELECT id FROM lblid) AS prop_id, l.lit_id
  FROM inst JOIN urid su ON su.uri = inst.uri
            JOIN litid l ON l.literal = inst.label
)"""


def corpus_ctes(
    n: int, giant_repo_fraction: int = 3, src_docs: str = "documents"
) -> str:
    """CTE block replaying ``fixtures.synth_corpus`` + the chained
    3-column xxhash64 doc id (``textproc.with_doc_id``) over the given
    source docs table → ``docs(doc_id, content)``. Shared by the
    flagship oracle and the micro-pipeline classification oracle
    (:mod:`scoobie_spark.micro_sql`)."""
    # --- doc_id = xxhash64(repo, path, commit), chained ----------------
    x1, f1 = xxh64_string_ctes("x1", "corp", "repo", "path, commit_c, content")
    x2, f2 = xxh64_string_ctes("x2", f1, "path", "commit_c, content", seed="h")
    x3, f3 = xxh64_string_ctes("x3", f2, "commit_c", "content", seed="h")

    return f"""-- ====================== corpus synthesis (fixtures.synth_corpus) =====
corp0 AS (
  SELECT d.doc_id AS k, d.text,
         l1.label AS label1,
         CASE WHEN d.doc_id % 2 = 0 THEN l2.label END AS label2,
         CASE WHEN d.doc_id % 5 = 0 THEN l3.label END AS label3
  FROM {src_docs} d
  LEFT JOIN lab l1 ON l1.i = (d.doc_id * 13 + 7) % {n}
  LEFT JOIN lab l2 ON l2.i = (d.doc_id * 29 + 3) % {n}
  LEFT JOIN lab l3 ON l3.i = (d.doc_id * 41 + 11) % {n}
),
corp AS MATERIALIZED (
  SELECT CASE WHEN k % {giant_repo_fraction} = 0 THEN 'repo-giant'
              ELSE 'repo-' || (k % 50) END AS repo,
         'src/f' || k || '.txt' AS path,
         substring(sha256('commit:' || k), 1, 40) AS commit_c,
         concat_ws(' ',
           coalesce(label1, ''),
           'was seen near',
           coalesce(label2, 'nothing'),
           '.',
           substring(text, 1, 200),
           CASE WHEN k % 7 = 0 THEN lower(label1) ELSE '' END,
           CASE WHEN k % 11 = 0
                THEN split_part(coalesce(label3, label2, label1), ' ', 1)
                ELSE coalesce(label3, '') END
         ) AS content
  FROM corp0
),
{x1}, {x2}, {x3},
docs AS MATERIALIZED (
  SELECT {_signed64('h')} AS doc_id, content FROM {f3}
)"""


def flagship_oracle_sql(
    n_instances: int = 200,
    giant_repo_fraction: int = 3,
    src_docs: str = "documents",
    resolver: str = "degree",
) -> str:
    n = n_instances
    return f"""
WITH RECURSIVE
{kb_synthesis_ctes(n)},
{corpus_ctes(n, giant_repo_fraction, src_docs)},
{_engine_ctes(resolver)}
{_TRIPLES_TAIL}"""


def _esc(expr: str) -> str:
    """Python html.escape(s, quote=True) as a SQL replace chain, same
    order (& first, then < > \" ')."""
    e = f"replace({expr}, '&', '&amp;')"
    e = f"replace({e}, '<', '&lt;')"
    e = f"replace({e}, '>', '&gt;')"
    e = f"replace({e}, '\"', '&quot;')"
    return f"replace({e}, chr(39), '&#x27;')"


def micro_rdfa_oracle_sql() -> str:
    """SQL twin of ``queries.q_micro_rdfa`` — B26 RDFa serialization
    (serialize.rdfa_serialize, reference RDFaSerializer.java:50-159)
    over the micro fixture: the same spotting/filter/degree-resolver
    engine as the flagship twin, then per-doc markup assembly. The
    greedy overlap drop (keep a span iff its begin ≥ the last KEPT
    span's end, spans sorted like Spark's sort_array struct order)
    runs as a per-doc recursive scan; segment stitching is one
    string_agg over lag() windows. html.escape is replayed as the
    replace chain in :func:`_esc`."""
    from .fixtures import MICRO_DOCS, MICRO_LITERALS, MICRO_RELATIONS, MICRO_SYMBOLS, MICRO_URIS

    doc_vals = ", ".join(
        f"('{path}', '{content.replace(chr(39), chr(39) * 2)}')"
        for _, path, content in MICRO_DOCS
    )
    uri_vals = ", ".join(f"({i}, '{u}')" for i, u in enumerate(MICRO_URIS))
    lit_vals = ", ".join(f"({i}, '{l}')" for i, l in enumerate(MICRO_LITERALS))
    rel_vals = ", ".join(f"({s}, {p}, {o})" for s, p, o in MICRO_RELATIONS)
    sym_vals = ", ".join(f"({s}, {p}, {l})" for s, p, l, _ in MICRO_SYMBOLS)

    x1, f1 = xxh64_string_ctes("x1", "corp", "repo", "path, commit_c, content")
    x2, f2 = xxh64_string_ctes("x2", f1, "path", "commit_c, content", seed="h")
    x3, f3 = xxh64_string_ctes("x3", f2, "commit_c", "content", seed="h")

    return f"""
WITH RECURSIVE
-- ============== micro fixture (fixtures.py MICRO_* constants) ========
urid(id, uri) AS (VALUES {uri_vals}),
litid(lit_id, literal) AS (VALUES {lit_vals}),
rel(s, p, o) AS (VALUES {rel_vals}),
symtab(subject, prop_id, lit_id) AS (VALUES {sym_vals}),
tid AS (SELECT id FROM urid WHERE uri = '{RDF_TYPE}'),
rel_nt AS (SELECT * FROM rel WHERE p <> (SELECT id FROM tid)),
corp AS MATERIALIZED (
  SELECT 'repo-micro' AS repo, path,
         substring(sha256('repo-micro/' || path), 1, 40) AS commit_c,
         content
  FROM (VALUES {doc_vals}) t(path, content)
),
{x1}, {x2}, {x3},
docs AS MATERIALIZED (
  SELECT {_signed64('h')} AS doc_id, content FROM {f3}
),
{_engine_ctes('degree')}
-- ====================== B26: RDFa assembly ==========================
span_set AS (
  SELECT r.doc_id, r."begin", r."end", su.uri AS subj_uri, pu.uri AS prop_uri
  FROM resolved r JOIN urid su ON su.id = r.subject
                  JOIN urid pu ON pu.id = r.prop_id
),
spans_o AS MATERIALIZED (  -- Spark sort_array struct order
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY "begin", "end", subj_uri, prop_uri) AS rn
  FROM span_set
),
greedy AS (  -- sequential left-to-right overlap drop (rdfa_serialize)
  SELECT doc_id, 0 AS rn, CAST(-1 AS BIGINT) AS last_end, false AS keep
  FROM (SELECT DISTINCT doc_id FROM spans_o)
  UNION ALL
  SELECT s.doc_id, s.rn,
         CASE WHEN s."begin" >= g.last_end THEN s."end" ELSE g.last_end END,
         s."begin" >= g.last_end
  FROM greedy g JOIN spans_o s ON s.doc_id = g.doc_id AND s.rn = g.rn + 1
),
kept_spans AS MATERIALIZED (
  SELECT s.*, d.content,
         lag(s."end", 1, 0) OVER (PARTITION BY s.doc_id ORDER BY s.rn) AS prev_end
  FROM spans_o s
  JOIN greedy g ON g.doc_id = s.doc_id AND g.rn = s.rn AND g.keep
  JOIN docs d ON d.doc_id = s.doc_id
),
assembled AS (
  SELECT doc_id,
         string_agg(
           {_esc('substring(content, prev_end + 1, "begin" - prev_end)')}
           || '<span about="' || {_esc('subj_uri')}
           || '" property="' || {_esc('prop_uri')} || '">'
           || {_esc('substring(content, "begin" + 1, "end" - "begin")')}
           || '</span>',
           '' ORDER BY rn) AS mid,
         max("end") AS tail_from
  FROM kept_spans GROUP BY doc_id
)
SELECT d.doc_id,
       CASE WHEN a.mid IS NULL THEN {_esc('d.content')}
            ELSE a.mid || {_esc('substring(d.content, a.tail_from + 1)')}
       END AS rdfa
FROM docs d LEFT JOIN assembled a USING (doc_id)
"""


def spot_component_ctes() -> str:
    """The B7-B16 CTE chain: spotting, span filters, bipartite phrase
    edges, per-doc weak components, ambiguous-component views. Expects
    upstream CTEs ``docs(doc_id, content)``, ``litid(literal,
    lit_id)``, ``symtab(subject, prop_id, lit_id)``. Shared by the
    flagship/resolver oracles (via :func:`_engine_ctes`) and the
    micro-pipeline classification oracle, whose resolver consumes the
    components but not the KB-expansion graph."""
    return f"""-- ====================== B7-B9: spotting =============================
-- mention at 0-based begin iff: token start (prev char not word-class,
-- SuffixArray token semantics for an alnum head), alnum head, and
-- ci-equality over the literal's length. ≥4-char literals make the
-- prefix-hash probe equivalent to this residual (module docstring).
doclit AS (
  SELECT d.doc_id, d.content, l.lit_id, l.literal, length(l.literal) AS ll
  FROM docs d JOIN litid l ON contains(lower(d.content), lower(l.literal))
),
pos AS (
  SELECT doc_id, content, lit_id, literal, ll,
         unnest(generate_series(1, length(content) - ll + 1)) AS b
  FROM doclit
),
men0 AS MATERIALIZED (
  SELECT doc_id, b - 1 AS "begin", b - 1 + ll AS "end", lit_id, literal,
         substring(content, b, ll) AS surface,
         NOT (regexp_matches(substring(content, b + ll - 1, 1), '{_W}')
              AND regexp_matches(substring(content, b + ll, 1), '{_W}')) AS tile_ok
  FROM pos
  WHERE lower(substring(content, b, ll)) = lower(literal)
    AND regexp_matches(substring(content, b, 1), '[0-9A-Za-z]')
    AND (b = 1 OR NOT regexp_matches(substring(content, b - 1, 1), '{_W}'))
),
men AS MATERIALIZED (  -- fused symbols join (linking.spot_resolve)
  SELECT m.*, s.prop_id, s.subject
  FROM men0 m JOIN symtab s USING (lit_id)
),
-- ====================== B10-B12: span filters =======================
f10 AS MATERIALIZED (
  SELECT * FROM men m
  WHERE NOT EXISTS (
    SELECT 1 FROM men0 x
    WHERE x.doc_id = m.doc_id AND x."begin" <= m."begin"
      AND x."end" >= m."end"
      AND (x."end" - x."begin") > (m."end" - m."begin"))
),
f12 AS MATERIALIZED (
  SELECT * FROM f10 m
  WHERE tile_ok
    AND (m.surface = m.literal OR NOT EXISTS (
      SELECT 1 FROM f10 x
      WHERE x.doc_id = m.doc_id AND x.surface = m.surface
        AND x.surface = x.literal))
),
-- ====================== B16-B21: disambiguation =====================
bip AS MATERIALIZED (  -- edge multiset: one per (phrase, lit, subject)
  SELECT DISTINCT doc_id, lower(surface) AS phrase,
         -(lit_id + 1) AS src, subject AS dst
  FROM f12
),
bipx AS MATERIALIZED (
  -- per-phrase cross of lits × subjects as a MULTISET (one row per
  -- (phrase, lit, subject)) — exactly the engine's B16 edge list
  -- (_resolve_one builds graph_edges from phrase_lits × phrase_subj
  -- per phrase, without cross-phrase dedup), so the resolver degree/
  -- rank scores below count a pair once per linking phrase like the
  -- engine does. Two case-variant KB literals sharing one lowercased
  -- surface make this differ from the observed `bip` rows.
  SELECT pl.doc_id, pl.src, ps.dst
  FROM (SELECT DISTINCT doc_id, phrase, src FROM bip) pl
  JOIN (SELECT DISTINCT doc_id, phrase, dst FROM bip) ps
    USING (doc_id, phrase)
),
bipe AS (  -- deduped view of the cross, for connectivity only
  SELECT DISTINCT doc_id, src, dst FROM bipx
),
-- top-level UNIONs here would hit the WITH RECURSIVE no-cross-branch-
-- dedup quirk (see gnodes) — subquery + DISTINCT instead (the branches
-- are sign-disjoint today, but don't rely on it)
nodes AS (SELECT DISTINCT doc_id, v FROM (
  SELECT doc_id, src AS v FROM bipe UNION ALL SELECT doc_id, dst FROM bipe)),
ue AS (SELECT DISTINCT doc_id, a, b FROM (
  SELECT doc_id, src AS a, dst AS b FROM bipe
  UNION ALL SELECT doc_id, dst, src FROM bipe)),
reach AS (  -- weak CC: component = min reachable node (= union-find root)
  SELECT doc_id, v, v AS r FROM nodes
  UNION
  SELECT w.doc_id, w.v, e.b FROM reach w JOIN ue e ON e.doc_id = w.doc_id AND e.a = w.r
),
comp AS MATERIALIZED (
  SELECT doc_id, v, min(r) AS component FROM reach GROUP BY doc_id, v
),
amb_comp AS MATERIALIZED (  -- components with ≥2 candidate subjects
  SELECT doc_id, component FROM comp WHERE v >= 0
  GROUP BY doc_id, component HAVING count(DISTINCT v) > 1
),
amb_subj AS MATERIALIZED (
  SELECT c.doc_id, c.v AS subject, c.component
  FROM comp c JOIN amb_comp a USING (doc_id, component) WHERE c.v >= 0
)"""


def _engine_ctes(resolver: str) -> str:
    """The pipeline-engine CTE chain (B7-B21): spotting, span filters,
    disambiguation → ``resolved``. Expects upstream CTEs ``docs(doc_id,
    content)``, ``litid(literal, lit_id)``, ``symtab(subject, prop_id,
    lit_id)``, ``rel``/``rel_nt``/``tid``/``urid`` — any fixture
    front-end (synthetic corpus or the micro VALUES fixture) composes
    with any serializer tail."""
    score_ctes = _RESOLVER_SCORE_SQL[resolver]()
    return f"""{spot_component_ctes()},
ds AS MATERIALIZED (SELECT DISTINCT doc_id, subject FROM f12),
kept AS MATERIALIZED (  -- anchor-guarded expansion edges, set semantics
  SELECT DISTINCT doc_id, s, o FROM (
    SELECT d.doc_id, r.s, r.o          -- forward from UNambiguous anchors
    FROM ds d JOIN rel_nt r ON r.s = d.subject
    WHERE NOT EXISTS (SELECT 1 FROM amb_subj a
                      WHERE a.doc_id = d.doc_id AND a.subject = d.subject)
    UNION ALL
    SELECT d.doc_id, r.s, r.o          -- backward into ambiguous anchors
    FROM ds d JOIN rel_nt r ON r.o = d.subject
    WHERE EXISTS (SELECT 1 FROM amb_subj a
                  WHERE a.doc_id = d.doc_id AND a.subject = d.subject))
),
degk AS (  -- B19: endpoint degrees over the kept set
  SELECT doc_id, v, count(*) AS deg FROM (
    SELECT doc_id, s AS v FROM kept UNION ALL SELECT doc_id, o FROM kept)
  GROUP BY doc_id, v
),
pruned AS (  -- keep edge iff both endpoints are candidates or deg ≥ 2
  SELECT k.doc_id, k.s, k.o FROM kept k
  WHERE (EXISTS (SELECT 1 FROM ds d WHERE d.doc_id = k.doc_id AND d.subject = k.s)
         OR (SELECT deg FROM degk g WHERE g.doc_id = k.doc_id AND g.v = k.s) >= 2)
    AND (EXISTS (SELECT 1 FROM ds d WHERE d.doc_id = k.doc_id AND d.subject = k.o)
         OR (SELECT deg FROM degk g WHERE g.doc_id = k.doc_id AND g.v = k.o) >= 2)
),
ge AS MATERIALIZED (  -- the doc graph edge multiset (phrase-cross bipartite
  -- edges, engine's graph_edges = list(bip_edges), + pruned KB edges)
  SELECT doc_id, src, dst FROM bipx
  UNION ALL SELECT doc_id, s, o FROM pruned
),
{score_ctes},
losers AS MATERIALIZED (  -- per ambiguous component: keep max(score, -id)
  SELECT doc_id, subject FROM (
    SELECT a.doc_id, a.subject,
           row_number() OVER (PARTITION BY a.doc_id, a.component
                              ORDER BY coalesce(s.sc, 0) DESC, a.subject ASC) AS rn
    FROM amb_subj a LEFT JOIN score s ON s.doc_id = a.doc_id AND s.v = a.subject)
  WHERE rn > 1
),
resolved AS MATERIALIZED (
  SELECT f.* FROM f12 f
  WHERE NOT EXISTS (SELECT 1 FROM losers l
                    WHERE l.doc_id = f.doc_id AND l.subject = f.subject)
),"""


# B22-B25 triples tail over ``resolved`` (serialize.recognized_triples,
# known_triples, facts.known_facts — id-space dedup before uri decode)
_TRIPLES_TAIL = f"""-- ====================== B22-B25: triples ============================
summary AS MATERIALIZED (
  SELECT DISTINCT doc_id, subject, prop_id, surface FROM resolved
),
doc_subj AS (SELECT DISTINCT doc_id, subject FROM summary),
stypes AS (  -- linking.subject_types
  SELECT DISTINCT c.subject, r.o AS type_id
  FROM (SELECT DISTINCT subject FROM summary) c
  JOIN rel r ON r.s = c.subject AND r.p = (SELECT id FROM tid)
)
SELECT doc_id, 'recognized' AS graph, su.uri AS subj, pu.uri AS pred,
       surface AS obj
FROM summary JOIN urid su ON su.id = subject JOIN urid pu ON pu.id = prop_id
UNION ALL
SELECT d.doc_id, 'recognized', su.uri, '{RDF_TYPE}', ou.uri
FROM doc_subj d JOIN stypes t USING (subject)
JOIN urid su ON su.id = d.subject JOIN urid ou ON ou.id = t.type_id
UNION ALL
SELECT doc_id, 'known', su.uri, pu.uri, ou.uri
FROM (SELECT DISTINCT d.doc_id, r.s, r.p, r.o
      FROM doc_subj d JOIN rel_nt r ON r.s = d.subject)
JOIN urid su ON su.id = s JOIN urid pu ON pu.id = p JOIN urid ou ON ou.id = o
"""
