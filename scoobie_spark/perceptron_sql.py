"""DuckDB replay of the TRAINED B5/B6 perceptron decode.

Turns the two trained-model driver queries (``b6_noun_phrases_trained``,
``token_phrase_frequency``) from rows-only into full value oracles.
Why a trained-model path is exactly SQL-replayable here:

* The vectorized weights are INTEGERS (``average()`` rounds to 6
  decimals, ×1e6 is lossless — perceptron.VectorizedPerceptron), so
  every score is an exact integer sum: no float order-of-operations
  anywhere in the decode.
* Greedy left-to-right decoding is a per-sentence recursion on the two
  previous predicted tags — a recursive CTE advancing every sentence
  one token per iteration (same shape as the rule-path oracle
  SQL_B6_NOUN_PHRASES, but with exact segmentation: the trained tagger
  consumes sentence-final punctuation as context, so the boundary
  tokens cannot be dropped; a sentinel ``chr(1)`` is appended after
  every ``[.!?]+(\\s+|$)`` match and the text split on it, which keeps
  each sentence's trailing punctuation — position-for-position the
  engine's ``_SENT_RE``/``_TOKEN_RE`` stream on ASCII text, and the
  driver corpus is verified pure ASCII).
* Ties break like ``numpy.argmax`` on the reversed score vector (the
  LAST maximum, i.e. the largest class name — classes are sorted at
  training): ``nc - list_position(list_reverse(L), max(L)) + 1``.
* Unknown features hit weight-matrix row 0 (all zeros) in the engine;
  here they are LEFT-JOIN misses coalesced to 0 — identical.

The weight matrices ship as parquet next to the model artifacts
(scripts/export_weights_parquet.py); the oracle embeds their absolute
paths and is only offered when they exist (queries.oracle_sql gates on
:func:`trained_sql_available`), so a checkout without the artifacts
degrades to the documented rows-only check instead of erroring.

Parity evidence: every POS tag and every NP tag of the sf0.001 corpus
(27 939 tokens) matches the engine stream exactly;
tests/test_oracles_sql.py pins both final aggregates.
"""

from __future__ import annotations

import os

from . import perceptron as P


def _weights_path(model_path: str) -> str:
    return model_path.replace(".json.gz", "_weights.parquet")


def trained_sql_available() -> bool:
    return (
        P.models_available("en")
        and os.path.exists(_weights_path(P.POS_MODEL))
        and os.path.exists(_weights_path(P.CHUNK_MODEL))
    )


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _cls_list(classes: list[str]) -> str:
    return "[" + ", ".join(_sql_str(c) for c in classes) + "]"


def _trained_ctes() -> str:
    pos_classes = P._vectorize(P._load(P.POS_MODEL)).classes
    chk_classes = P._vectorize(P._load(P.CHUNK_MODEL)).classes
    npos, nchk = len(pos_classes), len(chk_classes)
    wpos_path, wchk_path = _weights_path(P.POS_MODEL), _weights_path(P.CHUNK_MODEL)

    psums = ", ".join(f"sum(coalesce(w.c{k}, 0)) AS s{k}" for k in range(npos))
    pterms = ", ".join(
        f"st.s{k} + coalesce(p1.c{k},0) + coalesce(p2.c{k},0)"
        f" + coalesce(p12.c{k},0) + coalesce(pw.c{k},0)"
        for k in range(npos)
    )
    # pos_features(i, word, context, prev, prev2) static slots
    # (perceptron.py:162; history slots p1/p2/p1p2/p1w join in the
    # recursion). context[i±k] padding: [-START-, -START2-, ..., -END-,
    # -END2-], so w-1 of the FIRST token is '-START2-' and w-2 is
    # '-START-' (list order), mirrored in the coalesce defaults.
    pfeats = ", ".join([
        "'bias'",
        "'suf=' || right(nw, 3)",
        "'pre=' || substring(nw, 1, 1)",
        "'w=' || nw",
        "'w-1=' || nm1",
        "'w-1suf=' || right(nm1, 3)",
        "'w-2=' || nm2",
        "'w+1=' || np1",
        "'w+1suf=' || right(np1, 3)",
        "'w+2=' || np2",
        "'shape=' || (CASE WHEN regexp_matches(substring(word,1,1), '[A-Z]') THEN 'U' ELSE 'l' END)"
        " || (CASE WHEN regexp_matches(word, '[0-9]') THEN 'd' ELSE '' END)",
    ])
    csums = ", ".join(f"sum(coalesce(w.c{k}, 0)) AS s{k}" for k in range(nchk))
    cterms = ", ".join(
        f"st.s{k} + coalesce(c1.c{k},0) + coalesce(c2.c{k},0) + coalesce(c1t.c{k},0)"
        for k in range(nchk)
    )
    # chunk_features(i, words, tags, prev, prev2, window=3) static slots
    # (perceptron.py:201): T=/W= of the token and its ±3 neighbors with
    # '-<S>-' padding; c1/c2/c1T join in the recursion.
    cf = ["'bias'", "'T=' || t0", "'W=' || lw"]
    for d in (1, 2, 3):
        cf.append(f"'T-{d}=' || tm{d}")
        cf.append(f"'T{d}=' || tp{d}")
        cf.append(f"'W-{d}=' || wm{d}")
        cf.append(f"'W{d}=' || wp{d}")
    cfeats = ", ".join(cf)
    cwins = ",\n         ".join(
        f"coalesce(lag(tag, {d}) OVER w2, '-<S>-') AS tm{d},\n"
        f"         coalesce(lead(tag, {d}) OVER w2, '-<S>-') AS tp{d},\n"
        f"         coalesce(lag(lw, {d}) OVER w2, '-<S>-') AS wm{d},\n"
        f"         coalesce(lead(lw, {d}) OVER w2, '-<S>-') AS wp{d}"
        for d in (1, 2, 3)
    )
    return rf"""
WITH RECURSIVE
wpos AS MATERIALIZED (SELECT * FROM '{wpos_path}'),
wchk AS MATERIALIZED (SELECT * FROM '{wchk_path}'),
docs0 AS (
  SELECT doc_id,
         regexp_replace(coalesce(text, ''), '(?i)<[^>]*>|&[a-z]+;', ' ', 'g') AS txt
  FROM documents
),
marked AS (
  SELECT doc_id, regexp_replace(txt, '([.!?]+(\s+|$))', '\1' || chr(1), 'g') AS m
  FROM docs0
),
sents AS MATERIALIZED (
  SELECT doc_id, i AS sent_id, regexp_extract_all(parts[i], '\w+|[^\w\s]') AS toks
  FROM (SELECT doc_id, string_split(m, chr(1)) AS parts FROM marked),
       unnest(generate_series(1, len(parts))) AS u(i)
  WHERE len(regexp_extract_all(parts[i], '\w+|[^\w\s]')) > 0
),
sentmeta AS (SELECT doc_id, sent_id, len(toks) AS n FROM sents),
tok AS MATERIALIZED (
  SELECT doc_id, sent_id, i, len(toks) AS n, toks[i] AS word,
         CASE WHEN contains(toks[i], '-') AND substring(toks[i], 1, 1) <> '-' THEN '!HYPHEN'
              WHEN regexp_full_match(toks[i], '[0-9]+')
                THEN CASE WHEN length(toks[i]) = 4 THEN '!DIGITS' ELSE '!DIG' END
              ELSE lower(toks[i]) END AS nw
  FROM sents, unnest(generate_series(1, len(toks))) AS u(i)
),
pctx AS (
  SELECT *,
         coalesce(lag(nw) OVER w, '-START2-') AS nm1,
         coalesce(lag(nw, 2) OVER w,
                  CASE WHEN i = 1 THEN '-START-' ELSE '-START2-' END) AS nm2,
         coalesce(lead(nw) OVER w, '-END-') AS np1,
         coalesce(lead(nw, 2) OVER w,
                  CASE WHEN i = n THEN '-END2-' ELSE '-END-' END) AS np2
  FROM tok
  WINDOW w AS (PARTITION BY doc_id, sent_id ORDER BY i)
),
pfeats AS (
  SELECT doc_id, sent_id, i, unnest([{pfeats}]) AS f FROM pctx
),
pstat AS MATERIALIZED (
  SELECT doc_id, sent_id, i, {psums}
  FROM pfeats LEFT JOIN wpos w ON w.feature = f
  GROUP BY 1, 2, 3
),
pchain AS (
  SELECT doc_id, sent_id, n, 0 AS i, '-START2-' AS ptag, '-START-' AS tag
  FROM sentmeta
  UNION ALL
  SELECT q.doc_id, q.sent_id, q.n, q.i, q.ptag,
         {_cls_list(pos_classes)}[{npos} - list_position(list_reverse(q.L), list_aggregate(q.L, 'max')) + 1] AS tag
  FROM (
    SELECT ch.doc_id, ch.sent_id, ch.n, ch.i + 1 AS i, ch.tag AS ptag,
           [{pterms}] AS L
    FROM pchain ch
    JOIN pstat st ON st.doc_id = ch.doc_id AND st.sent_id = ch.sent_id AND st.i = ch.i + 1
    JOIN tok tk ON tk.doc_id = ch.doc_id AND tk.sent_id = ch.sent_id AND tk.i = ch.i + 1
    LEFT JOIN wpos p1 ON p1.feature = 'p1=' || ch.tag
    LEFT JOIN wpos p2 ON p2.feature = 'p2=' || ch.ptag
    LEFT JOIN wpos p12 ON p12.feature = 'p1p2=' || ch.tag || '+' || ch.ptag
    LEFT JOIN wpos pw ON pw.feature = 'p1w=' || ch.tag || '+' || tk.nw
    WHERE ch.i < ch.n
  ) q
),
tokpos AS MATERIALIZED (
  SELECT t.doc_id, t.sent_id, t.i, t.n, t.word, lower(t.word) AS lw, c.tag
  FROM tok t JOIN pchain c USING (doc_id, sent_id, i)
  WHERE c.i >= 1
),
cctx AS (
  SELECT doc_id, sent_id, i, n, word, lw, tag AS t0,
         {cwins}
  FROM tokpos
  WINDOW w2 AS (PARTITION BY doc_id, sent_id ORDER BY i)
),
cfeats AS (
  SELECT doc_id, sent_id, i, unnest([{cfeats}]) AS f FROM cctx
),
cstat AS MATERIALIZED (
  SELECT doc_id, sent_id, i, {csums}
  FROM cfeats LEFT JOIN wchk w ON w.feature = f
  GROUP BY 1, 2, 3
),
cchain AS (
  SELECT doc_id, sent_id, n, 0 AS i, '-<S>-' AS ptag, '-<S>-' AS tag
  FROM sentmeta
  UNION ALL
  SELECT q.doc_id, q.sent_id, q.n, q.i, q.ptag,
         {_cls_list(chk_classes)}[{nchk} - list_position(list_reverse(q.L), list_aggregate(q.L, 'max')) + 1] AS tag
  FROM (
    SELECT ch.doc_id, ch.sent_id, ch.n, ch.i + 1 AS i, ch.tag AS ptag,
           [{cterms}] AS L
    FROM cchain ch
    JOIN cstat st ON st.doc_id = ch.doc_id AND st.sent_id = ch.sent_id AND st.i = ch.i + 1
    JOIN tokpos tp ON tp.doc_id = ch.doc_id AND tp.sent_id = ch.sent_id AND tp.i = ch.i + 1
    LEFT JOIN wchk c1 ON c1.feature = 'c1=' || ch.tag
    LEFT JOIN wchk c2 ON c2.feature = 'c2=' || ch.ptag
    LEFT JOIN wchk c1t ON c1t.feature = 'c1T=' || ch.tag || '+' || tp.tag
    WHERE ch.i < ch.n
  ) q
),
chunked AS (
  SELECT tp.doc_id, tp.sent_id, tp.i, tp.word,
         CASE WHEN cc.tag IN ('B-NP', 'I-NP') THEN cc.tag ELSE 'O' END AS np
  FROM tokpos tp JOIN cchain cc USING (doc_id, sent_id, i)
  WHERE cc.i >= 1
),
npp AS (
  SELECT doc_id, sent_id, i, word, np,
         lag(np) OVER (PARTITION BY doc_id, sent_id ORDER BY i) AS pnp
  FROM chunked
)"""


def trained_np_counts_sql() -> str:
    """Oracle for b6_noun_phrases_trained: per-doc phrase-start counts
    (the pos.noun_phrases stitch: B-NP, or I-NP after O/sentence
    start)."""
    return _trained_ctes() + """
SELECT doc_id, count(*) AS n_phrases
FROM npp
WHERE np = 'B-NP' OR (np = 'I-NP' AND coalesce(pnp, 'O') = 'O')
GROUP BY doc_id
"""


def trained_phrase_frequency_sql() -> str:
    """Oracle for token_phrase_frequency (pos.token_phrase_frequency
    over the trained chunk layer): the five per-doc columns of the
    reference's token_phrase_frequency_*.csv."""
    return _trained_ctes() + """
SELECT doc_id,
       count(*) AS tokens,
       CAST(sum(CASE WHEN np = 'B-NP' OR (np = 'I-NP' AND coalesce(pnp, 'O') = 'O')
                     THEN 1 ELSE 0 END) AS BIGINT) AS noun_phrases,
       CAST(sum(CASE WHEN np <> 'O' THEN 1 ELSE 0 END) AS BIGINT) AS tokens_in_nps,
       count(DISTINCT CASE WHEN np <> 'O' THEN word END) AS distinct_tokens_in_nps,
       count(DISTINCT word) AS distinct_tokens
FROM npp
GROUP BY doc_id
"""
