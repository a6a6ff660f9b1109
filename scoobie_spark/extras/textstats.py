"""Text analysis operators: language ID, quality scoring, token
counting, document fingerprinting.

Everything here is either a pure Column expression (quality, token
counts — JVM-side, whole-stage-codegen'd, DuckDB-oracle-friendly) or an
Arrow-batched numpy pass (language ID, fingerprints).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# tiny built-in stopword lists → n-gram-free language heuristic that
# needs no model artifacts (containers ship no NLP libs)
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "with", "was", "on"},
    "de": {"der", "die", "das", "und", "ist", "von", "mit", "für", "auf", "nicht", "ein", "zu"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "es", "por", "con", "para"},
    "fr": {"le", "la", "de", "et", "un", "une", "est", "pour", "que", "dans", "les", "des"},
}


def quality_scores(docs: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """Per-doc quality signals, all Column expressions:
    n_chars, n_tokens (whitespace), alpha_ratio, punct_ratio,
    stopword_ratio (en), mean_token_len, upper_ratio.

    NULL text counts as empty (the sibling operators' fillna("")
    contract): without the coalesce a failed-fetch row yields all-null
    scores under ANSI mode — or, with ANSI off, size(split(NULL)) = -1
    and the row gets n_tokens=-1 / stopword_ratio=-1.0, silently
    corrupting threshold filters downstream."""
    t = F.coalesce(F.col(text), F.lit(""))
    toks = F.split(F.trim(t), r"\s+")
    n_tokens = F.when(F.length(F.trim(t)) == 0, 0).otherwise(F.size(toks))
    alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    digits = F.length(F.regexp_replace(t, r"[^0-9]", ""))
    punct = F.length(F.regexp_replace(t, r"[^.,;:!?'\"()\[\]{}-]", ""))
    upper = F.length(F.regexp_replace(t, r"[^A-Z]", ""))
    stop_list = F.array(*[F.lit(w) for w in sorted(_STOPWORDS["en"])])
    n_stop = F.size(
        F.filter(F.transform(toks, lambda x: F.lower(x)), lambda x: F.array_contains(stop_list, x))
    )
    return docs.select(
        F.col(key).alias("doc_id"),
        F.length(t).alias("n_chars"),
        n_tokens.cast("int").alias("n_tokens"),
        (alpha / F.greatest(F.length(t), F.lit(1))).alias("alpha_ratio"),
        (digits / F.greatest(F.length(t), F.lit(1))).alias("digit_ratio"),
        (punct / F.greatest(F.length(t), F.lit(1))).alias("punct_ratio"),
        (upper / F.greatest(F.length(t), F.lit(1))).alias("upper_ratio"),
        (n_stop / F.greatest(n_tokens, F.lit(1))).alias("stopword_ratio"),
        (F.length(F.regexp_replace(t, r"\s+", "")) / F.greatest(n_tokens, F.lit(1))).alias(
            "mean_token_len"
        ),
    )


def token_counts(docs: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """Whitespace tokens + a BPE-ish subword proxy count (word chars
    split into runs of ≤4 + residual punctuation), both JVM-side.
    NULL text counts as empty (see quality_scores)."""
    t = F.coalesce(F.col(text), F.lit(""))
    ws = F.when(F.length(F.trim(t)) == 0, 0).otherwise(F.size(F.split(F.trim(t), r"\s+")))
    # BPE-ish: every ≤4-char chunk of each word-char run + each non-space symbol
    word_chars = F.length(F.regexp_replace(t, r"[^\w]", ""))
    symbols = F.length(F.regexp_replace(t, r"[\w\s]", ""))
    bpe = F.ceil(word_chars / 4) + symbols
    return docs.select(
        F.col(key).alias("doc_id"),
        ws.cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("bpe_tokens"),
    )


def bpe_pair_counts(
    docs: DataFrame, key: str = "doc_id", text: str = "text", k: int = 100
) -> DataFrame:
    """Top-k adjacent-token-pair frequencies — the counting kernel of
    one BPE merge round (Sennrich et al. 2016), run corpus-wide the way
    tokenizer training does at scale.

    Pairs are built with a narrow in-array zip (``transform`` over the
    index sequence + ``element_at``) — no posexplode self-join, so the
    only wide stages are the partial-aggregated pair count and the
    global top-k, which Spark executes as TakeOrderedAndProject
    (map-side per-partition top-k + driver merge of k-row heaps, never
    a single-partition sort of the full pair histogram). Ties at the
    cut are broken by pair text, making the k-row result total-ordered
    and oracle-exact.

    NULL/empty/one-token docs contribute nothing (the guard matters:
    ``sequence(1, 0)`` would DESCEND, fabricating an out-of-range
    index, not return empty)."""
    from ..pipeline import spread_if_narrow

    docs = spread_if_narrow(docs, key)
    toks = F.split(F.trim(F.coalesce(F.col(text), F.lit(""))), r"\s+")
    idx = F.when(F.size(toks) >= 2, F.sequence(F.lit(1), F.size(toks) - 1)).otherwise(
        F.array().cast("array<int>")
    )
    pairs = F.transform(
        idx, lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1))
    )
    return (
        docs.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(k)
    )


def language_id(docs: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """Stopword-vote language guess (B2-equivalent; reference used Nutch
    LanguageIdentifier, LanguageIdentification.java:55-84). Arrow-batched;
    'und' when nothing votes."""
    from ..pipeline import spread_if_narrow

    cols = spread_if_narrow(
        docs.select(F.col(key).alias("doc_id"), F.col(text).alias("text")), "doc_id"
    )

    import re

    # ASCII \s+ tokenization ≡ the DuckDB oracle's RE2 split (plain
    # str.split also breaks on unicode whitespace, which RE2 does not)
    ws_re = re.compile(r"\s+", re.ASCII)

    lang_names = list(_STOPWORDS)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            pdf = pdf.reset_index(drop=True)  # explode() indexes by row
            n = len(pdf)
            votes = np.zeros((n, len(lang_names)), dtype=np.int64)
            # vectorized: one split/explode pass + an isin per language,
            # instead of a Python set-intersection loop per document
            toks = (
                pdf["text"].fillna("").str.lower().str.split(ws_re).explode()
            )
            pairs = pd.DataFrame(
                {"r": toks.index.to_numpy(), "t": toks.values}
            ).drop_duplicates()
            for j, lang in enumerate(lang_names):
                hit = pairs.loc[pairs["t"].isin(_STOPWORDS[lang]), "r"]
                np.add.at(votes[:, j], hit.to_numpy(), 1)
            best = votes.argmax(axis=1)  # first-max wins, like the
            langs = np.array(lang_names, dtype=object)[best]  # scalar loop's `>`
            langs[votes.max(axis=1) == 0] = "und"
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "lang_guess": langs})

    return cols.mapInPandas(gen, "doc_id long, lang_guess string")


def repetition_scores(docs: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021,
    "Scaling Language Models: ...", appendix A1.1 — the public
    training-data filter spec), defined over word n-grams since the
    corpus shape is line-free text:

    * ``dup_word_frac`` — fraction of word occurrences beyond the first
      of each distinct word: ``1 - distinct/total``.
    * ``top_bigram_frac`` — occurrences of the most frequent word
      2-gram over all 2-gram occurrences.
    * ``dup_trigram_char_frac`` — fraction of 3-gram characters inside
      3-grams that occur more than once.

    Tokenization = lower + whitespace split, the same convention as
    :func:`language_id` and the n-gram dedup family. Everything is
    Column expressions + partial-aggregable groupBys (JVM-side,
    whole-stage codegen): per-doc n-gram counts are bounded by doc
    length, so no hot keys — the 100 TB shape is three map-side-combined
    aggregations joined on doc_id."""
    from ..pipeline import spread_if_narrow

    docs = spread_if_narrow(docs, key)
    toks = docs.select(
        F.col(key).alias("doc_id"),
        F.filter(
            F.split(F.lower(F.trim(F.col(text))), r"\s+"),
            lambda x: F.length(x) > 0,
        ).alias("t"),
    )
    words = toks.select("doc_id", F.explode("t").alias("w"))
    wstats = words.groupBy("doc_id").agg(
        F.count("*").alias("n_w"), F.countDistinct("w").alias("d_w")
    )
    bi = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(slice(t, 1, greatest(size(t)-1, 0)),"
                " (x, i) -> concat(x, ' ', t[i+1]))"
            )
        ).alias("g"),
    )
    bstats = (
        bi.groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("n_b"), F.max("c").alias("mx_b"))
    )
    tri = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(slice(t, 1, greatest(size(t)-2, 0)),"
                " (x, i) -> concat(x, ' ', t[i+1], ' ', t[i+2]))"
            )
        ).alias("g"),
    )
    tstats = (
        tri.groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("c") >= 2, F.col("c") * F.length("g")).otherwise(0)
            ).alias("dup_ch"),
            F.sum(F.col("c") * F.length("g")).alias("tot_ch"),
        )
    )
    return (
        docs.select(F.col(key).alias("doc_id"))
        .join(wstats, "doc_id", "left")
        .join(bstats, "doc_id", "left")
        .join(tstats, "doc_id", "left")
        .select(
            "doc_id",
            F.round(
                F.coalesce((F.col("n_w") - F.col("d_w")) / F.col("n_w"), F.lit(0.0)), 6
            ).alias("dup_word_frac"),
            F.round(F.coalesce(F.col("mx_b") / F.col("n_b"), F.lit(0.0)), 6).alias(
                "top_bigram_frac"
            ),
            F.round(F.coalesce(F.col("dup_ch") / F.col("tot_ch"), F.lit(0.0)), 6).alias(
                "dup_trigram_char_frac"
            ),
        )
    )


def fingerprints(
    docs: DataFrame, window: int = 8, key: str = "doc_id", text: str = "text"
) -> DataFrame:
    """Winnowing-style document fingerprint: rolling polynomial hash over
    normalized tokens, keep the min hash of every ``window`` positions →
    (doc_id, fingerprint array<long>, fp_count). Arrow-batched AND
    numpy-vectorized: token hashes are one segmented byte-level
    prefix-hash pass, doc rolling hashes one token-level pass
    (:mod:`._polyhash`), window minima a strided sliding view — the only
    per-row Python left is tokenize/encode (O(tokens), not O(chars))."""
    import numpy as np

    from ._polyhash import seg_prefix_hash, token_hashes

    from ..pipeline import spread_if_narrow

    cols = spread_if_narrow(
        docs.select(F.col(key).alias("doc_id"), F.col(text).alias("text")), "doc_id"
    )

    # docs containing non-ASCII whitespace take the per-doc tokenize
    # path (python str.split splits on these; the byte tokenizer would
    # not) — C-speed regex scan, rare hits
    _UNICODE_WS = "[\\x1c-\\x1f\\x85\\xa0\\u1680\\u2000-\\u200a\\u2028\\u2029\\u202f\\u205f\\u3000]"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ._polyhash import token_hashes_from_buffer

        for pdf in batches:
            if not len(pdf):
                continue
            texts = pdf["text"].fillna("").str.lower()
            slow = texts.str.contains(_UNICODE_WS, regex=True, na=False).to_numpy()

            # ---- byte-level tokenization, zero per-token Python ------
            enc = [t.encode("utf-8") if not s else b"" for t, s in zip(texts, slow)]
            doc_lens = np.fromiter(map(len, enc), dtype=np.int64, count=len(enc))
            buf = np.frombuffer(b"\n".join(enc) + b"\n", dtype=np.uint8)
            doc_starts = np.cumsum(doc_lens + 1) - (doc_lens + 1)
            ws = (
                (buf == 32) | (buf == 9) | (buf == 10)
                | (buf == 11) | (buf == 12) | (buf == 13)
            )
            nw = ~ws
            tok_starts = np.flatnonzero(nw & np.concatenate(([True], ws[:-1])))
            tok_ends = np.flatnonzero(nw & np.concatenate((ws[1:], [True]))) + 1
            tok_lens = tok_ends - tok_starts
            doc_of_tok = np.searchsorted(doc_starts, tok_starts, side="right") - 1
            n_toks = np.bincount(doc_of_tok, minlength=len(pdf))
            th = token_hashes_from_buffer(buf, tok_starts, tok_lens)
            # per-doc tokenize for unicode-whitespace docs
            for k in np.flatnonzero(slow):
                toks = [t.encode("utf-8") for t in texts.iloc[k].split()]
                n_toks[k] = len(toks)
                ths = token_hashes(toks)
                ins = np.searchsorted(doc_of_tok, k, side="left")
                th = np.concatenate((th[:ins], ths, th[ins:]))
                doc_of_tok = np.concatenate(
                    (doc_of_tok[:ins], np.full(len(toks), k), doc_of_tok[ins:])
                )
            hs = seg_prefix_hash(th, n_toks).astype(np.int64)

            n_docs = len(pdf)
            ends = np.cumsum(n_toks)
            starts = ends - n_toks
            fps: list = [[]] * n_docs
            counts = np.zeros(n_docs, dtype=np.int32)

            # short docs (1 ≤ len ≤ window): one min over the whole doc
            short = np.flatnonzero((n_toks > 0) & (n_toks <= window))
            if len(short):
                # reduceat over (start, end) pairs; even slots = doc mins
                idx = np.empty(2 * len(short), dtype=np.int64)
                idx[0::2] = starts[short]
                idx[1::2] = ends[short]
                if idx[-1] == len(hs):
                    idx = idx[:-1]
                smins = np.minimum.reduceat(hs, idx)[0::2]
                for i, k in enumerate(short):
                    fps[k] = [int(smins[i])]
                counts[short] = 1

            # long docs: global sliding-window minima, one lexsort dedupe
            long_ = np.flatnonzero(n_toks > window)
            if len(long_):
                sw = np.lib.stride_tricks.sliding_window_view(hs, window).min(axis=1)
                cnt = n_toks[long_] - window + 1       # windows per long doc
                total = int(cnt.sum())
                first = np.repeat(starts[long_], cnt)
                off = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
                vals = sw[first + off]
                doc_of = np.repeat(long_, cnt)
                order = np.lexsort((vals, doc_of))
                dv, dd = vals[order], doc_of[order]
                keep = np.ones(total, dtype=bool)
                keep[1:] = (dd[1:] != dd[:-1]) | (dv[1:] != dv[:-1])
                dv, dd = dv[keep], dd[keep]
                ucnt = np.bincount(dd, minlength=n_docs)[long_]
                for arr, k in zip(np.split(dv, np.cumsum(ucnt)[:-1]), long_):
                    fps[k] = arr.tolist()
                counts[long_] = ucnt.astype(np.int32)

            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].to_numpy(dtype="int64"),
                 "fingerprint": pd.Series(fps, dtype="object"),
                 "fp_count": pd.Series(counts, dtype="int32")}
            )

    return cols.mapInPandas(gen, "doc_id long, fingerprint array<long>, fp_count int")


def lm_quality(
    docs: DataFrame,
    n_buckets: int = 4096,
    alpha: float = 1.0,
    key: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Model-based quality signal (the CCNet-style LM filter with the
    in-repo hashed bag model standing in for KenLM): fit a smoothed
    hashed-unigram+bigram model on the corpus itself and score every
    document by its negative log-likelihood under it — unusually
    improbable gram distributions (boilerplate soup, encoding damage,
    wrong-language fragments) surface as high NLL.

    Same exact-integer design as ``sampling.dsir_select``: per-bucket
    -ln(p̂) snaps to micro-units, so per-doc sums are exact integers —
    order-independent and value-replayable in SQL. Returns
    (doc_id, n_grams, nll_micro, avg_nll_micro) for every doc;
    ``avg_nll_micro`` is the length-normalized figure to threshold on
    (integral DIV — consumers needing fractional precision divide the
    two exact columns themselves).

    Scale shape: one gram explode → per-(doc, bucket) counts (map-side
    combinable), corpus model derived from the same counts, ≤ n_buckets
    weight rows broadcast back.
    """
    import math

    from .sampling import _grams

    if alpha <= 0:
        raise ValueError(f"alpha must be > 0 (smooths empty buckets), got {alpha}")
    B = n_buckets
    from ..pipeline import spread_if_narrow

    docs = spread_if_narrow(docs, key)
    doc_b = (
        docs.select(F.col(key).alias("doc_id"), F.explode(_grams(text)).alias("g"))
        .groupBy("doc_id", F.pmod(F.xxhash64("g"), F.lit(B)).alias("b"))
        .agg(F.count("*").alias("c"))
        .localCheckpoint()
    )
    c_b = doc_b.groupBy("b").agg(F.sum("c").alias("cb")).localCheckpoint()
    total = c_b.agg(F.sum("cb")).first()[0] or 0
    log_denom = math.log(total + alpha * B)
    w = c_b.select(
        "b",
        F.round(
            (F.lit(log_denom) - F.log(F.col("cb") + F.lit(alpha)))
            * F.lit(1_000_000.0)
        ).cast("long").alias("w_micro"),
    )
    return (
        doc_b.join(F.broadcast(w), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_grams"),
            F.sum(F.col("c") * F.col("w_micro")).alias("nll_micro"),
        )
        .select(
            "doc_id",
            "n_grams",
            "nll_micro",
            F.expr("nll_micro DIV n_grams").alias("avg_nll_micro"),
        )
    )


def doc_tfidf(
    docs: DataFrame, k: int = 3, key: str = "doc_id", text: str = "text"
) -> DataFrame:
    """Per-document top-``k`` TF-IDF keywords
    ``(doc_id, term, tf, df, score_micro, rank)`` — the classic
    keyword-extraction / document-representation operator (Spärck
    Jones 1972), over the corpus's own vocabulary.

    Tokenization = trim + lower + whitespace split (the
    :func:`repetition_scores` convention). IDF uses the in-repo exact-
    integer design (``sampling.dsir_select`` / :func:`lm_quality`):
    ``idf_micro = round(ln(N/df)·1e6)`` snaps the one float to micro-
    units, so ``score_micro = tf · idf_micro`` is an exact integer —
    order-independent, and the top-k rank (score DESC, term ASC)
    replays value-for-value in SQL. ``N`` = documents with ≥1 token.

    Scale shape: per-doc term counts and the document-frequency table
    are both partial-aggregated groupBys (map-side combine bounds the
    hot-key reducer rows at one per upstream partition); the tf⋈df
    equi-join on ``term`` is the one skewed stage (a stopword's tf rows
    all share its key) — AQE skew-join splits it at runtime, and hot
    terms are exactly the low-idf ones so no pruning shortcut is safe.
    The corpus size ships back as a 1-row broadcast; the final top-k is
    a per-doc window bounded by document vocabulary."""
    from ..pipeline import spread_if_narrow

    docs = spread_if_narrow(docs, key)
    t = F.coalesce(F.col(text), F.lit(""))
    toks = docs.select(
        F.col(key).alias("doc_id"),
        F.explode(
            F.filter(F.split(F.lower(F.trim(t)), r"\s+"), lambda x: F.length(x) > 0)
        ).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    tf = tf.localCheckpoint(eager=False)  # feeds df, N, and the join
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    nd = tf.agg(F.countDistinct("doc_id").alias("nd"))
    scored = (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(nd))
        .withColumn(
            "idf_micro",
            F.round(F.log(F.col("nd").cast("double") / F.col("df")) * 1e6).cast(
                "long"
            ),
        )
        .withColumn("score_micro", F.col("tf") * F.col("idf_micro"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_micro").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "df", "score_micro", "rank")
    )


def length_percentiles(
    docs: DataFrame,
    group: str = "source",
    key: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Per-``group`` token-length distribution summary
    ``(group, n_docs, p50_tokens, p90_tokens, p99_tokens)`` — the
    corpus-panorama numbers a packing/truncation policy is tuned on.

    Percentiles are EXACT lower quantiles computed from the per-group
    length histogram: p = the smallest length whose cumulative doc
    count reaches ``ceil(q·n_docs)``, with the threshold in pure
    integer arithmetic (``(n·q_num + 99) div 100``) — no
    interpolation, no float, value-replayable in SQL.

    Scale shape: the (group, length) histogram is a map-side-combinable
    aggregation; the cumulative window runs over each group's DISTINCT
    lengths (bounded by the length alphabet, not the corpus). This is
    the histogram route production percentile jobs take — Spark's exact
    ``percentile`` aggregate buffers every value per group instead."""
    t = F.coalesce(F.col(text), F.lit(""))
    n_tokens = F.when(F.length(F.trim(t)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(t), r"\s+"))
    )
    hist = (
        docs.select(F.col(group).alias("grp"), n_tokens.cast("long").alias("n"))
        .groupBy("grp", "n")
        .agg(F.count("*").alias("c"))
    )
    w_cum = (
        Window.partitionBy("grp").orderBy("n").rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("grp")
    cum = hist.withColumn("cum", F.sum("c").over(w_cum)).withColumn(
        "tot", F.sum("c").over(w_tot)
    )

    def pick(q_num: int):
        thr = F.expr(f"(tot * {q_num} + 99) div 100")
        return F.min(F.when(F.col("cum") >= thr, F.col("n")))

    return cum.groupBy(F.col("grp").alias(group)).agg(
        F.max("tot").alias("n_docs"),
        pick(50).alias("p50_tokens"),
        pick(90).alias("p90_tokens"),
        pick(99).alias("p99_tokens"),
    )


# boilerplate-line thresholds (RefinedWeb/CCNet-style): a line is
# boilerplate when it is at least MIN_BOILER_CHARS long AND appears in
# at least `min_docs` distinct documents
MIN_BOILER_CHARS = 4


def remove_boilerplate_lines(
    docs: DataFrame,
    key: str = "doc_id",
    text: str = "text",
    min_docs: int = 30,
    min_chars: int = MIN_BOILER_CHARS,
) -> DataFrame:
    """Corpus-level repeated-line (boilerplate) removal
    ``(doc_id, cleaned, n_kept, n_removed)``.

    Public spec: the CCNet / RefinedWeb cleanup recipes drop lines that
    recur across many documents (navigation menus, cookie banners,
    copyright footers) because they are template artifacts, not
    content. A line is boilerplate when it has at least ``min_chars``
    characters and occurs in at least ``min_docs`` distinct documents;
    surviving lines are reassembled in original order (``cleaned`` is
    the exact residual text, newline-joined).

    Physical shape at 100 TB: lines explode map-side; the frequency
    pass groups on ``xxhash64(line)`` ONLY (8-byte keys — the line
    text itself never shuffles into the count) with a
    partial-aggregated distinct-doc count; the boilerplate set (lines
    in ≥ min_docs docs — tiny by construction) comes back as a LEFT
    ANTI hash join that AQE broadcasts; reassembly is ONE doc_id
    shuffle with per-doc struct-sort (bounded by document size). A
    64-bit hash collision can at worst drop one innocent line
    corpus-wide — the standard trade every production line-dedup
    makes; the DuckDB oracle joins on the line STRINGS, so the
    differential also guards the hash shortcut.
    """
    from ..pipeline import spread_if_narrow

    docs = spread_if_narrow(docs, key)
    t = F.coalesce(F.col(text), F.lit(""))
    lines = docs.select(
        F.col(key).alias("doc_id"),
        F.posexplode(F.split(t, "\n", -1)).alias("pos", "line"),
    )
    boiler = (
        lines.filter(F.length("line") >= min_chars)
        .groupBy(F.xxhash64("line").alias("h"))
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("h")
    )
    kept = lines.withColumn("h", F.xxhash64("line")).join(boiler, "h", "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("cleaned"),
        F.count("*").cast("long").alias("n_kept"),
    )
    base = docs.select(
        F.col(key).alias("doc_id"),
        F.size(F.split(t, "\n", -1)).cast("long").alias("n_lines"),
    )
    return base.join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("cleaned"), F.lit("")).alias("cleaned"),
        F.coalesce(F.col("n_kept"), F.lit(0).cast("long")).alias("n_kept"),
        (F.col("n_lines") - F.coalesce(F.col("n_kept"), F.lit(0).cast("long"))).alias(
            "n_removed"
        ),
    )
