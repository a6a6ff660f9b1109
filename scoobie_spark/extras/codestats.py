"""Source-code quality heuristics and license detection for a
training-data pipeline over the input_hint repo-file table
``(repo, path, commit, lang, content)``.

Public spec: the StarCoder / The-Stack data-curation recipes (Kocetkov
et al. 2022, Li et al. 2023) filter raw repository files with cheap
per-file heuristics BEFORE any expensive pass: drop auto-generated
files, files with extreme line lengths, and files that are mostly
non-alphanumeric data blobs; keep only permissively-licensed files.
This module re-expresses those gates as pure Column expressions —
JVM-side, whole-stage-codegen'd, zero Python in the hot path — so at
100 TB each is a narrow map-only pass Catalyst fuses with the parquet
scan (only ``content`` and the key columns are read; everything
projects away before any shuffle).

All thresholds are applied with integer arithmetic (``4 * n_alnum >=
n_chars`` instead of a float ratio, ``n_chars > 100 * n_lines`` instead
of a float mean) so the DuckDB value oracle replays bit-exactly with no
summation-order or formatting ulps.

The regex constants are shared with the SQL-oracle builders in
queries.py — both engines compile the same pattern text, and the
subset used (character classes, alternation, inline ``(?i)``) has
identical semantics in Java's engine and RE2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# markers that identify machine-generated files (StarCoder drops these;
# they teach a model nothing and are near-duplicated across repos)
AUTOGEN_RE = r"(?i)@generated|auto-generated|automatically generated|do not edit"

# SPDX short-form header (the REUSE spec): group 1 is the license id
SPDX_RE = r"SPDX-License-Identifier:\s*([A-Za-z0-9.+-]+)"
PERMISSIVE_RE = r"^(MIT|Apache|BSD|ISC|Unlicense|Zlib|0BSD)"
COPYLEFT_RE = r"^(GPL|AGPL|LGPL|MPL|EPL|CDDL)"

# StarCoder-style gate thresholds (public recipe values)
MAX_LINE_LEN = 1000      # drop files with any line longer than this
MAX_AVG_LINE_LEN = 100   # drop files whose mean line length exceeds this
MIN_ALNUM_QUARTERS = 4   # keep only if alnum chars >= 1/4 of all chars


def code_quality(
    files: DataFrame, key: str = "path", content: str = "content"
) -> DataFrame:
    """Per-file code-quality stats + the StarCoder-style keep gate.

    Output columns (one row per input row):
      * ``n_lines`` / ``n_chars`` / ``max_line_len`` / ``n_alnum`` —
        long counters (NULL content counts as empty).
      * ``autogen`` — file carries a machine-generated marker.
      * ``keep`` — passes ALL gates: not autogen, no line over
        MAX_LINE_LEN, mean line length <= MAX_AVG_LINE_LEN (integer
        form: n_chars <= MAX_AVG_LINE_LEN * n_lines), and alnum chars
        >= 1/4 of all chars (integer form: 4*n_alnum >= n_chars).

    The whole row is computed from one pass over ``content``; no
    shuffle, no UDF. ``split`` with limit -1 keeps trailing empty
    lines, matching DuckDB's ``string_split`` — so ``n_lines`` is
    newline-count + 1 in both engines.
    """
    c = F.coalesce(F.col(content), F.lit(""))
    lines = F.split(c, "\n", -1)
    n_lines = F.size(lines).cast("long")
    n_chars = F.length(c).cast("long")
    max_line = F.array_max(F.transform(lines, lambda x: F.length(x))).cast("long")
    n_alnum = F.length(F.regexp_replace(c, "[^A-Za-z0-9]", "")).cast("long")
    autogen = c.rlike(AUTOGEN_RE)
    keep = (
        ~autogen
        & (max_line <= MAX_LINE_LEN)
        & (n_chars <= F.lit(MAX_AVG_LINE_LEN) * n_lines)
        & (F.lit(MIN_ALNUM_QUARTERS) * n_alnum >= n_chars)
    )
    return files.select(
        F.col(key).alias("path"),
        n_lines.alias("n_lines"),
        n_chars.alias("n_chars"),
        max_line.alias("max_line_len"),
        n_alnum.alias("n_alnum"),
        autogen.alias("autogen"),
        keep.alias("keep"),
    )


def license_detect(
    files: DataFrame, key: str = "path", content: str = "content"
) -> DataFrame:
    """SPDX short-form license detection + permissiveness family.

    Output: ``(path, spdx, family, license_ok)`` where ``spdx`` is the
    extracted identifier ('' when absent — both engines return the
    empty string for a non-matching regexp_extract), ``family`` is
    permissive / copyleft / none / other, and ``license_ok`` is the
    The-Stack inclusion gate (family = permissive).

    Narrow map-only pass like code_quality; at 100 TB the usual shape
    is this projection feeding a ``license_ok`` filter that Catalyst
    pushes into the scan's data filters.
    """
    c = F.coalesce(F.col(content), F.lit(""))
    spdx = F.regexp_extract(c, SPDX_RE, 1)
    family = (
        F.when(spdx == "", F.lit("none"))
        .when(spdx.rlike(PERMISSIVE_RE), F.lit("permissive"))
        .when(spdx.rlike(COPYLEFT_RE), F.lit("copyleft"))
        .otherwise(F.lit("other"))
    )
    return files.select(
        F.col(key).alias("path"),
        spdx.alias("spdx"),
        family.alias("family"),
        (family == "permissive").alias("license_ok"),
    )


def incremental_novel(
    snapshot: DataFrame,
    batch: DataFrame,
    content: str = "content",
    keys: tuple[str, ...] = ("repo", "path", "commit"),
) -> DataFrame:
    """Exact incremental dedup: rows of ``batch`` whose content was NOT
    already present in ``snapshot`` (the standard crawl-refresh /
    repo-resync shape: only novel content flows on to the expensive
    stages — near-dup, quality, PII).

    Both sides key on ``sha256(content)``; the snapshot side reduces to
    a distinct sha set BEFORE the join (map-side-combinable aggregate —
    at 100 TB the snapshot's 10^12 rows collapse to |distinct contents|
    keys), then a LEFT ANTI equi-join on the digest. sha256 keys are
    uniform by construction, so the shuffle cannot skew; AQE coalesces
    the post-aggregate side. No sort, no window, no Python.

    Output: the batch key columns + ``sha`` of novel rows.
    """
    sha = F.sha2(F.coalesce(F.col(content), F.lit("")), 256)
    seen = snapshot.select(sha.alias("sha")).distinct()
    return (
        batch.select(*[F.col(k) for k in keys], sha.alias("sha"))
        .join(seen, "sha", "left_anti")
        .select(*keys, "sha")
    )


# ---------------------------------------------------------------------------
# Secrets redaction (BigCode / StarCoder pre-training hygiene)
# ---------------------------------------------------------------------------

# Fixed application order, like pii.PII_PATTERNS: each category counts
# and redacts on the previous category's output, so a base64 run inside
# an already-redacted PEM block is never re-reported as an assigned
# secret. The subset used (character classes, bounded repetition,
# alternation, \b, (?i)) has identical semantics in Java's engine
# (Spark) and RE2 (DuckDB); the SQL-oracle builder doubles any single
# quotes, so the pattern text itself is shared verbatim.
SECRET_PATTERNS: list[tuple[str, str, str]] = [
    ("pem", r"-----BEGIN [A-Z ]{0,24}PRIVATE KEY-----", "[PEMKEY]"),
    ("aws_keys", r"\bAKIA[0-9A-Z]{16}\b", "[AWSKEY]"),
    (
        "assigned",
        r"(?i)\b(api_key|apikey|secret|token|passwd|password)\s*=\s*[\"'][A-Za-z0-9+/=_-]{12,}[\"']",
        "[SECRET]",
    ),
]


def secret_scan(
    files: DataFrame, key: str = "path", content: str = "content"
) -> DataFrame:
    """Per-file secret detection + redaction
    ``(path, n_pem, n_aws_keys, n_assigned, redacted)``.

    Public spec: the BigCode / StarCoder curation recipe redacts
    committed credentials (private-key blocks, AWS access key ids,
    hard-coded ``password = "..."`` assignments) from source files
    before training. Like :func:`scoobie_spark.extras.pii.redact_pii`
    this is pure Column expressions — ``regexp_count`` +
    ``regexp_replace``, JVM-side, whole-stage-codegen'd, zero Python —
    so at 100 TB it is a narrow map-only pass Catalyst fuses with the
    parquet scan. Counts are longs computed on the text as it stands
    before that category's replacement; NULL content counts as empty
    (the extras-family contract).
    """
    cur = F.coalesce(F.col(content), F.lit(""))
    cols = [F.col(key).alias("path")]
    for name, pat, rep in SECRET_PATTERNS:
        cols.append(F.regexp_count(cur, F.lit(pat)).cast("long").alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, rep)
    cols.append(cur.alias("redacted"))
    return files.select(*cols)


# license-file names that define a repository's license (The-Stack /
# REUSE convention); matched on the path's final segment, case-insensitive
LICENSE_FILE_RE = r"(?i)^(license|copying)([._-].*)?$"


def propagate_repo_license(
    files: DataFrame, repo: str = "repo", key: str = "path", content: str = "content"
) -> DataFrame:
    """Repo-level license resolution + per-file inheritance
    ``(repo, path, spdx, repo_spdx, effective_spdx, family,
    license_ok)``.

    Public spec: The-Stack / BigCode determine a repository's license
    from its license file (LICENSE*, COPYING*) and apply it to every
    file; a file carrying its own SPDX short-form header keeps that
    instead (the REUSE spec's precedence). ``spdx`` is the file's own
    header ('' when absent), ``repo_spdx`` the repo license-file's
    header ('' when the repo has none), ``effective_spdx`` the
    precedence result, and ``family``/``license_ok`` classify the
    effective id like :func:`license_detect`.

    Physical shape at 100 TB: per-file detection is a narrow map-only
    pass; the repo-license side first FILTERS to license files (a
    ~|repos|-row frame) and reduces with a map-side-combinable
    struct-min (deterministic tie rule: lowest path wins), then joins
    back on ``repo`` — AQE broadcasts the tiny aggregated side, so the
    big file table never shuffles. No sort, no window, no Python.
    """
    c = F.coalesce(F.col(content), F.lit(""))
    spdx = F.regexp_extract(c, SPDX_RE, 1)
    det = files.select(
        F.col(repo).alias("repo"),
        F.col(key).alias("path"),
        spdx.alias("spdx"),
    )
    fname = F.element_at(F.split(F.col("path"), "/"), -1)
    repo_lic = (
        det.filter(fname.rlike(LICENSE_FILE_RE))
        .groupBy("repo")
        .agg(F.min(F.struct("path", "spdx")).getField("spdx").alias("repo_spdx"))
    )
    joined = det.join(repo_lic, "repo", "left").select(
        "repo",
        "path",
        "spdx",
        F.coalesce(F.col("repo_spdx"), F.lit("")).alias("repo_spdx"),
    )
    eff = F.when(F.col("spdx") != "", F.col("spdx")).otherwise(F.col("repo_spdx"))
    family = (
        F.when(eff == "", F.lit("none"))
        .when(eff.rlike(PERMISSIVE_RE), F.lit("permissive"))
        .when(eff.rlike(COPYLEFT_RE), F.lit("copyleft"))
        .otherwise(F.lit("other"))
    )
    return joined.select(
        "repo",
        "path",
        "spdx",
        "repo_spdx",
        eff.alias("effective_spdx"),
        family.alias("family"),
        (family == "permissive").alias("license_ok"),
    )


# top-level python function: a `def` line plus its contiguous indented
# block. No lookaround, no backrefs — Java/RE2-identical (oracle-exact).
FUNC_RE = r"(?:^|\n)(def[ \t][^\n]*(?:\n[ \t]+[^\n]*)*)"


def function_snippets(files: DataFrame) -> DataFrame:
    """(repo, path, snippet_sha256): distinct top-level function
    bodies per file, hashed AT THE SCAN (sha2 over the matched snippet
    inside the extraction projection) so function text never crosses an
    exchange — only 64-hex-char digests shuffle.

    Public spec: function-granularity analysis of code corpora (the
    unit used by code-LLM dedup/contamination studies — a file is often
    half-original, half-vendored; file-level dedup misses the vendored
    half). The regex block heuristic (def line + contiguous indented
    lines) is the deliberate no-AST trade: exact for the synthesis and
    for most real Python, and the operator contract is the snippet SET,
    not a parse."""
    c = F.coalesce(F.col("content"), F.lit(""))
    return files.select(
        "repo",
        "path",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.regexp_extract_all(c, F.lit(FUNC_RE), F.lit(1)),
                    lambda x: F.sha2(x, 256),
                )
            )
        ).alias("snippet_sha256"),
    )


def dedup_functions(files: DataFrame) -> DataFrame:
    """Cross-repo duplicated functions: (snippet_sha256, n_repos,
    n_sites) for function bodies appearing in MORE than one repo —
    the function-granularity twin of exact file dedup (and the
    vendored-code detector file-level dedup cannot be). Pure
    aggregation over 8-byte-key-sized digests; no join, no text
    movement; n_sites counts distinct (repo, path) occurrences —
    countDistinct, not count(*), so a multi-version input (one row per
    commit for the same (repo, path), the stated table contract) does
    not inflate site counts (ADVICE r4); matches the SQL twin's
    DISTINCT-snips CTE."""
    s = function_snippets(files)
    return (
        s.groupBy("snippet_sha256")
        .agg(
            F.countDistinct("repo").alias("n_repos"),
            F.countDistinct(F.struct("repo", "path")).alias("n_sites"),
        )
        .filter(F.col("n_repos") > 1)
    )


def repo_documents(files: DataFrame, max_files: int = 10000) -> DataFrame:
    """StarCoder2-style repo-context assembly: every repo's files
    concatenated in deterministic path order into one training
    document — ``(repo, n_files, n_chars, doc_sha256)`` (the digest
    stands in for the document so corpus-scale outputs stay bounded;
    consumers that want the text drop the final select).

    Each file contributes ``### <path>\\n<content>``; pieces join with
    a newline. ``max_files`` caps a giant repo's contribution (the
    skew guard: repo assembly is inherently one group per repo, so the
    cap bounds both the row_number sort and the collect_list buffer —
    the same truncation the public repo-context recipes apply). The
    window and the aggregation hash-partition on the same key, so the
    whole operator is ONE exchange."""
    from pyspark.sql import Window

    w = Window.partitionBy("repo").orderBy("path")
    capped = (
        files.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= max_files)
        .select(
            "repo",
            "path",
            F.concat(
                F.lit("### "),
                F.col("path"),
                F.lit("\n"),
                F.coalesce(F.col("content"), F.lit("")),
            ).alias("piece"),
        )
    )
    agg = capped.groupBy("repo").agg(
        F.count("*").alias("n_files"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("path", "piece"))),
                lambda s: s["piece"],
            ),
            "\n",
        ).alias("doc"),
    )
    return agg.select(
        "repo",
        "n_files",
        F.length("doc").cast("long").alias("n_chars"),
        F.sha2(F.col("doc"), 256).alias("doc_sha256"),
    )


# a comment line: optional blank, then '#' (python-family); docstring:
# a non-greedy triple-quoted block. Both Java/RE2-identical.
COMMENT_LINE_RE = r"^[ \t]*#"
DOCSTRING_RE = '"""[\\s\\S]*?"""'


def comment_density(files: DataFrame, key: str = "path") -> DataFrame:
    """Per-file comment statistics + density gate — the documentation
    signal code-curation recipes score alongside :func:`code_quality`
    (near-zero comments correlates with minified/generated code; a
    file that is mostly comments is often license boilerplate).

    Output: ``(path, n_lines, n_comment_lines, n_docstrings, keep)``
    with ``keep`` = comment lines ≤ 4/5 of all lines (integer form —
    no float ratio, so the DuckDB oracle replays exactly). One narrow
    map-only pass; no shuffle, no Python."""
    c = F.coalesce(F.col("content"), F.lit(""))
    lines = F.split(c, "\n", -1)
    n_lines = F.size(lines).cast("long")
    n_comment = F.size(
        F.filter(lines, lambda x: x.rlike(COMMENT_LINE_RE))
    ).cast("long")
    n_doc = F.size(F.regexp_extract_all(c, F.lit(DOCSTRING_RE), F.lit(0))).cast(
        "long"
    )
    return files.select(
        F.col(key).alias("path"),
        n_lines.alias("n_lines"),
        n_comment.alias("n_comment_lines"),
        n_doc.alias("n_docstrings"),
        (5 * n_comment <= 4 * n_lines).alias("keep"),
    )


def latest_snapshot(files: DataFrame, commit: str = "commit") -> DataFrame:
    """HEAD-snapshot selection: one row per (repo, path) keeping the
    NEWEST commit — the first step of every snapshot-based corpus
    recipe (train on the latest file version, not every revision).

    Output: ``(repo, path, commit, n_versions, content_sha256)``.
    "Newest" is the max under the total (commit, content) order — a
    deterministic argmax even if a commit id repeats — computed as a
    map-side-combinable struct-max: ONE partial-aggregated groupBy, no
    window, no sort, no text movement after the agg (the digest stands
    in for the kept content)."""
    m = F.max(
        F.struct(
            F.col(commit).alias("c"),
            F.coalesce(F.col("content"), F.lit("")).alias("v"),
        )
    )
    return (
        files.groupBy("repo", "path")
        .agg(m.alias("m"), F.count("*").alias("n_versions"))
        .select(
            "repo",
            "path",
            F.col("m.c").alias("commit"),
            "n_versions",
            F.sha2(F.col("m.v"), 256).alias("content_sha256"),
        )
    )


def repo_churn(files: DataFrame, commit: str = "commit") -> DataFrame:
    """Per-repo version-churn statistics over the multi-version table
    ``(repo, path, commit, content)``: ``(repo, n_files, n_changed,
    n_versions, churn_bp)`` — ``n_files`` distinct paths,
    ``n_changed`` paths whose content actually differs across commits
    (distinct digests > 1: a re-commit of identical bytes is not
    churn), ``n_versions`` total version rows, and ``churn_bp`` the
    changed-file share in integer basis points
    (``10000·n_changed div n_files`` — floor division in both engines,
    so the DuckDB oracle replays exactly; no float ratio).

    The crawl-refresh prioritizer: repos with high churn_bp need
    re-snapshotting, frozen repos can keep their cached extraction
    (the incremental-dedup counterpart on the version axis). Scale
    shape: digests computed inside the scan projection (sha256, no
    content leaves the scan), ONE partial-aggregated groupBy per
    granularity level, no window, no join."""
    per = (
        files.groupBy("repo", "path")
        .agg(
            F.count("*").alias("nv"),
            F.countDistinct(
                F.sha2(F.coalesce(F.col("content"), F.lit("")), 256)
            ).alias("nc"),
        )
    )
    return (
        per.groupBy("repo")
        .agg(
            F.count("*").alias("n_files"),
            F.count(F.when(F.col("nc") > 1, 1)).alias("n_changed"),
            F.sum("nv").cast("long").alias("n_versions"),
        )
        .withColumn(
            "churn_bp",
            F.expr("CAST(10000 * n_changed DIV n_files AS BIGINT)"),
        )
    )


# code-curation funnel stages, in drop order
CODE_FUNNEL_STAGES = ["all", "quality", "license", "comments", "exact_dedup"]


def code_funnel(files: DataFrame) -> DataFrame:
    """The end-to-end code-curation funnel: ``(stage, n_files)`` — five
    rows with monotonically non-increasing counts. Stages compose the
    per-file gates this module already verifies individually:

    1. ``quality``  — :func:`code_quality` keep (autogen / line-length
       / alnum gates),
    2. ``license``  — AND permissive effective license
       (:func:`propagate_repo_license`: repo LICENSE file inheritance,
       REUSE precedence for own headers),
    3. ``comments`` — AND :func:`comment_density` keep,
    4. ``exact_dedup`` — AND the file is the canonical survivor of its
       exact content class (global first occurrence under the
       (repo, path) struct order — identical LICENSE texts across
       repos dedup here).

    Every signal is a join on (repo, path) or the content sha — all
    integer/boolean, so the funnel replays exactly in SQL. The flags
    frame gets a lazy lineage cut (multiple signal joins feed one
    aggregate; same policy as curation.curation_funnel)."""
    # NUL-separated (repo, path) key: '/' would collide for real forge
    # names — ("a/b", "c.py") vs ("a", "b/c.py") — since repo slugs are
    # owner/name; NUL cannot appear in a git path or a repo name, so
    # this key is injective on (repo, path) and the per-file signal
    # joins below cannot cross-match (ADVICE r4)
    fkey = F.concat_ws("\x00", "repo", "path")
    f2 = files.select(
        "repo", "path", "content", fkey.alias("fkey")
    )
    q = code_quality(f2, key="fkey").select(
        F.col("path").alias("fkey"), F.col("keep").alias("k1")
    )
    lic = propagate_repo_license(f2).select(
        "repo", "path", F.col("license_ok").alias("k2")
    )
    cd = comment_density(f2, key="fkey").select(
        F.col("path").alias("fkey"), F.col("keep").alias("k3")
    )
    sha = f2.select(
        "fkey",
        "repo",
        "path",
        F.sha2(F.coalesce(F.col("content"), F.lit("")), 256).alias("sha"),
    )
    keeper = sha.groupBy("sha").agg(
        F.min(F.struct("repo", "path")).alias("m")
    )
    flags = (
        sha.join(q, "fkey")
        .join(lic, ["repo", "path"])
        .join(cd, "fkey")
        .join(keeper, "sha")
        .select(
            F.col("k1").alias("s1"),
            (F.col("k1") & F.col("k2")).alias("s2"),
            (F.col("k1") & F.col("k2") & F.col("k3")).alias("s3"),
            (
                F.col("k1")
                & F.col("k2")
                & F.col("k3")
                & (F.col("m.repo") == F.col("repo"))
                & (F.col("m.path") == F.col("path"))
            ).alias("s4"),
        )
        .localCheckpoint(eager=False)
    )
    agg = flags.agg(
        F.count("*").alias("c0"),
        *[F.count(F.when(F.col(f"s{i}"), 1)).alias(f"c{i}") for i in range(1, 5)],
    )
    stack_args = ", ".join(
        f"'{s}', c{i}" for i, s in enumerate(CODE_FUNNEL_STAGES)
    )
    return agg.select(
        F.expr(f"stack(5, {stack_args}) AS (stage, n_files)")
    )


# shas present in more than this many repos are boilerplate (empty
# files, stock configs, LICENSE texts) — no fork evidence, and the
# self-join skew cap (the dedup family's df-cap philosophy)
FORK_SHA_MAX_REPOS = 100


def fork_detect(
    files: DataFrame,
    min_shared: int = 2,
    threshold_pct: int = 50,
    sha_max_repos: int = FORK_SHA_MAX_REPOS,
) -> DataFrame:
    """Near-duplicate repository (fork) detection by shared file
    content: ``(repo_a, repo_b, n_shared, n_a, n_b, jaccard)`` for
    repo pairs sharing at least ``min_shared`` distinct content
    digests AND a content-Jaccard of at least ``threshold_pct``/100 —
    the gate is applied in exact integer form
    (``100·n_shared ≥ pct·(n_a + n_b − n_shared)``), the reported
    ``jaccard`` is 6-decimal-rounded in both engines.

    Forks dominate raw repository corpora (the same project cloned
    thousands of times); detecting them at REPO granularity is what
    file-level dedup cannot express. Scale shape: per-repo distinct
    content digests (one partial-agg distinct), shas present in more
    than ``sha_max_repos`` repos dropped BEFORE the self-join
    (boilerplate carries no fork evidence and would explode the
    join — the dedup family's document-frequency cap), then an a<b
    equi-join on the digest where each key now has a bounded repo
    list, pair counting, and a broadcast-sized size join."""
    sha = files.select(
        "repo",
        F.sha2(F.coalesce(F.col("content"), F.lit("")), 256).alias("sha"),
    ).distinct()
    sizes = sha.groupBy("repo").agg(F.count("*").alias("n"))
    fanout = sha.groupBy("sha").agg(F.count("*").alias("n_repos"))
    sha = (
        sha.join(fanout.filter(F.col("n_repos") <= sha_max_repos), "sha")
        .select("repo", "sha")
    )
    a = sha.select(F.col("repo").alias("repo_a"), "sha")
    b = sha.select(F.col("repo").alias("repo_b"), "sha")
    pairs = (
        a.join(b, "sha")
        .filter(F.col("repo_a") < F.col("repo_b"))
        .groupBy("repo_a", "repo_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return (
        pairs.join(sizes.select(F.col("repo").alias("repo_a"), F.col("n").alias("n_a")), "repo_a")
        .join(sizes.select(F.col("repo").alias("repo_b"), F.col("n").alias("n_b")), "repo_b")
        .filter(
            100 * F.col("n_shared")
            >= threshold_pct * (F.col("n_a") + F.col("n_b") - F.col("n_shared"))
        )
        .select(
            "repo_a",
            "repo_b",
            "n_shared",
            "n_a",
            "n_b",
            F.round(
                F.col("n_shared")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
                6,
            ).alias("jaccard"),
        )
    )
