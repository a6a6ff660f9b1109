"""Generate DuckDB SQL that reproduces Spark's xxhash64 bit-for-bit.

Spark's ``F.xxhash64(str_col, int_lit)`` is XXH64 over the string's
UTF-8 bytes with seed 42, whose result seeds ``hashInt`` of the int
literal (catalyst XxHash64 folds columns left to right). Both pieces
are pure 64-bit wraparound arithmetic, expressible in SQL with UBIGINT
bit ops and HUGEINT intermediates:

* ``rotl(x, r)`` needs no widening: ``(x & (2^(64-r)-1)) * 2^r`` cannot
  overflow and the two halves never share bits, so ``+`` is ``|``.
* 64×64 multiplication mod 2^64 splits 32/32 limbs (the 128-bit
  product of two full words would overflow signed HUGEINT).
* additions widen to HUGEINT and reduce ``% 2^64``.

The per-stage accumulator chains through CTE columns and list_reduce
lambdas, never inline re-expansion, so expression size stays linear.
Validated against pyspark in tests/test_oracles_sql.py (the minhash
oracle is end-to-end evidence: every signature value must match).

Used by :mod:`scoobie_spark.queries` to build ``SQL_MINHASH`` and
``SQL_B17_COMPONENTS``.
"""

from __future__ import annotations

M64 = "18446744073709551616"
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5
MASK = (1 << 64) - 1


def add64(a: str, b: str) -> str:
    return f"CAST((CAST({a} AS HUGEINT) + CAST({b} AS HUGEINT)) % {M64} AS UBIGINT)"


def mul64(a: str, c: int) -> str:
    """(a * c) mod 2^64 for a full 64-bit column and a constant."""
    c_lo, c_hi = c & 0xFFFFFFFF, c >> 32
    return (
        f"CAST(((CAST(({a}) & 4294967295 AS HUGEINT) * {c_lo}) + "
        f"((((CAST(({a}) & 4294967295 AS HUGEINT) * {c_hi}) + "
        f"(CAST(({a}) >> 32 AS HUGEINT) * {c_lo})) % 4294967296) * 4294967296)) "
        f"% {M64} AS UBIGINT)"
    )


def mul_small(a: str, c: int) -> str:
    """(a * c) mod 2^64 when a < 2^63 (product fits signed HUGEINT)."""
    return f"CAST((CAST({a} AS HUGEINT) * {c}) % {M64} AS UBIGINT)"


def rotl(x: str, r: int) -> str:
    lo = (1 << (64 - r)) - 1
    return f"((({x}) & {lo}) * {1 << r} + (({x}) >> {64 - r}))"


def rnd(acc: str, lane: str) -> str:
    """XXH64 round: rotl(acc + lane*P2, 31) * P1 (mod 2^64)."""
    t = add64(acc, mul64(lane, P2))
    return mul64(rotl(t, 31), P1)


def rnd0(lane: str) -> str:
    """round(0, lane) = rotl(lane*P2, 31) * P1."""
    return mul64(rotl(mul64(lane, P2), 31), P1)


def merge_step(h: str, v: str) -> str:
    """mergeRound: (h ^ round(0, v)) * P1 + P4."""
    return add64(mul64(f"xor({h}, {rnd0(v)})", P1), str(P4))


def xxh64_string_ctes(
    prefix: str, src: str, s: str, carry: str, seed: "int | str" = 42
) -> tuple[str, str]:
    """CTE chain computing h = XXH64(utf8(s), seed) per row of
    ``src``. ASCII input assumed (byte == ord(char) — the driver
    testdata is verified ASCII). Returns (ctes_sql, final_cte_name);
    the final CTE has columns ``{carry}`` (pass-through, e.g. doc_id +
    the string) and ``h`` (UBIGINT hash).

    ``seed`` is an int (default 42, Spark's xxhash64 seed) or a SQL
    expression over ``src``'s columns — Spark's multi-column
    ``xxhash64(c1, c2, ...)`` folds left, each column's hash seeding
    the next (catalyst XxHash64), so a chained replay passes the
    previous final CTE's ``h`` here."""
    if isinstance(seed, int):
        v1c: str = str((seed + P1 + P2) & MASK)
        v2c: str = str((seed + P2) & MASK)
        v3c: str = str(seed & MASK)
        v4c: str = str((seed - P1) & MASK)
        h_short: str = str((seed + P5) & MASK)
        seed_col = ""
    else:
        # per-row seed: lane inits become columns carried from _b on
        seed_col = (
            f", {add64(add64(f'({seed})', str(P1)), str(P2))} AS xv1"
            f", {add64(f'({seed})', str(P2))} AS xv2"
            f", CAST(({seed}) AS UBIGINT) AS xv3"
            f", {add64(f'({seed})', str((-P1) & MASK))} AS xv4"
            f", {add64(f'({seed})', str(P5))} AS xhs"
        )
        v1c, v2c, v3c, v4c, h_short = "xv1", "xv2", "xv3", "xv4", "xhs"

    stripe_el = "CAST(el[1] AS INT)"
    lam = (
        f"(st, el) -> ["
        + ", ".join(
            rnd(f"st[{j + 1}]", f"w8[{stripe_el}*4+{j + 1}]") for j in range(4)
        )
        + "]"
    )
    # h0 for the long path: rotl(v1,1)+rotl(v2,7)+rotl(v3,12)+rotl(v4,18)
    h0 = add64(
        add64(rotl("st[1]", 1), rotl("st[2]", 7)),
        add64(rotl("st[3]", 12), rotl("st[4]", 18)),
    )

    ctes = f"""{prefix}_b AS (
  SELECT {carry},
         length({s}) AS n,
         list_transform(generate_series(1, length({s})), i -> ord(substring({s}, i, 1))::UBIGINT) AS bl{seed_col}
  FROM {src}
), {prefix}_w AS (
  SELECT *, list_transform(generate_series(0, n//8 - 1), k ->
           bl[8*k+1] + bl[8*k+2]*256 + bl[8*k+3]*65536 + bl[8*k+4]*16777216
         + bl[8*k+5]*4294967296 + bl[8*k+6]*1099511627776
         + bl[8*k+7]*281474976710656 + bl[8*k+8]*72057594037927936) AS w8,
         n//32 AS ns
  FROM {prefix}_b
), {prefix}_st AS (
  SELECT *, CASE WHEN n >= 32 THEN
           list_reduce(list_prepend([{v1c}::UBIGINT, {v2c}::UBIGINT, {v3c}::UBIGINT, {v4c}::UBIGINT],
                                    list_transform(generate_series(0, ns - 1), x -> [CAST(x AS UBIGINT)])),
                       {lam})
         ELSE NULL END AS st
  FROM {prefix}_w
), {prefix}_h0 AS (
  SELECT *, CASE WHEN n >= 32 THEN {h0} ELSE {h_short}::UBIGINT END AS acc0
  FROM {prefix}_st
), {prefix}_m1 AS (
  SELECT *, CASE WHEN n >= 32 THEN {merge_step("acc0", "st[1]")} ELSE acc0 END AS acc1 FROM {prefix}_h0
), {prefix}_m2 AS (
  SELECT *, CASE WHEN n >= 32 THEN {merge_step("acc1", "st[2]")} ELSE acc1 END AS acc2 FROM {prefix}_m1
), {prefix}_m3 AS (
  SELECT *, CASE WHEN n >= 32 THEN {merge_step("acc2", "st[3]")} ELSE acc2 END AS acc3 FROM {prefix}_m2
), {prefix}_m4 AS (
  SELECT *, {add64(f"CASE WHEN n >= 32 THEN {merge_step('acc3', 'st[4]')} ELSE acc3 END", "n")} AS acc4 FROM {prefix}_m3
), {prefix}_t8 AS (
  SELECT *, list_reduce(
           list_prepend(acc4, list_transform(generate_series(4*ns, n//8 - 1), x -> CAST(x AS UBIGINT))),
           (hh, kk) -> {add64(mul64(rotl(f"xor(hh, {rnd0('w8[CAST(kk AS INT)+1]')})", 27), P1), str(P4))}
         ) AS acc5
  FROM {prefix}_m4
), {prefix}_t4 AS (
  SELECT *, CASE WHEN n % 8 >= 4 THEN
           {add64(mul64(rotl(f"xor(acc5, {mul_small('(bl[8*(n//8)+1] + bl[8*(n//8)+2]*256 + bl[8*(n//8)+3]*65536 + bl[8*(n//8)+4]*16777216)', P1)})", 23), P2), str(P3))}
         ELSE acc5 END AS acc6,
         8*(n//8) + CASE WHEN n % 8 >= 4 THEN 4 ELSE 0 END AS tb0
  FROM {prefix}_t8
), {prefix}_t1 AS (
  SELECT *, list_reduce(
           list_prepend(acc6, list_transform(generate_series(tb0, n - 1), x -> CAST(x AS UBIGINT))),
           (hh, pp) -> {mul64(rotl(f"xor(hh, {mul_small('bl[CAST(pp AS INT)+1]', P5)})", 11), P1)}
         ) AS acc7
  FROM {prefix}_t4
), {prefix}_f1 AS (
  SELECT *, {mul64("xor(acc7, acc7 >> 33)", P2)} AS f1 FROM {prefix}_t1
), {prefix}_f2 AS (
  SELECT *, {mul64("xor(f1, f1 >> 29)", P3)} AS f2 FROM {prefix}_f1
), {prefix}_h AS (
  SELECT {carry}, xor(f2, f2 >> 32) AS h FROM {prefix}_f2
)"""
    return ctes, f"{prefix}_h"


def hashlong_sql(
    l: str, seed: str
) -> tuple[str, str, str, str, str, str, str]:
    """Spark ``XXH64.hashLong(l, seed)`` (the LongType leg of
    ``F.xxhash64``) as chained column expressions g0..g5 then the final;
    the caller lays them into successive CTEs with those exact column
    names. ``l`` must already be a UBIGINT expression (two's-complement
    cast for negative longs)."""
    g0 = mul64(l, P2)
    g1 = mul64(rotl("g0", 31), P1)
    g2 = f"xor({add64(seed, str((P5 + 8) & MASK))}, g1)"
    g3 = add64(mul64(rotl("g2", 27), P1), str(P4))
    g4 = mul64("xor(g3, g3 >> 33)", P2)
    g5 = mul64("xor(g4, g4 >> 29)", P3)
    return g0, g1, g2, g3, g4, g5, "xor(g5, g5 >> 32)"


def hashint_sql(i: str, seed: str) -> tuple[str, str, str, str, str]:
    """hashInt(i, seed) as chained column expressions (g0..g3 then the
    final); the caller lays them into successive CTEs with those exact
    column names. i must be < 2^31."""
    g0 = f"xor({add64(seed, str((P5 + 4) & MASK))}, {mul_small(i, P1)})"
    g1 = add64(mul64(rotl("g0", 23), P2), str(P3))
    g2 = mul64("xor(g1, g1 >> 33)", P2)
    g3 = mul64("xor(g2, g2 >> 29)", P3)
    return g0, g1, g2, g3, "xor(g3, g3 >> 32)"
