"""Local replica of the driver's differential-oracle check.

Runs every __spark_entry__.queries() entry on Spark and its
oracle_sql() twin on DuckDB over the same parquet tables, then compares
row count, sorted column names, and an order-insensitive value hash.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.9g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def value_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from scoobie_spark.session import get_spark

    spark = get_spark("oracle_check", cores=8, shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"{name:28s} rows-only: {len(srows)} rows in {t_spark:.1f}s")
            continue
        t0 = time.time()
        res = con.sql(oracles[name])
        drows = res.fetchall()
        dcols = [d[0] for d in res.description]
        t_duck = time.time() - t0
        ok_n = len(srows) == len(drows)
        ok_c = sorted(scols) == sorted(dcols)
        ok_h = ok_c and value_hash(srows, scols) == value_hash(drows, dcols)
        status = "OK " if (ok_n and ok_c and ok_h) else "FAIL"
        print(
            f"{name:28s} {status} rows {len(srows)}/{len(drows)} "
            f"cols={'=' if ok_c else f'{sorted(scols)} vs {sorted(dcols)}'} "
            f"hash={'=' if ok_h else 'DIFF'} ({t_spark:.1f}s/{t_duck:.1f}s)"
        )
        if status == "FAIL":
            failures.append(name)
            if ok_c and ok_n:
                # show first differing rows for debugging
                s_set = {tuple(canon(v) for v in r) for r in srows}
                d_set = {tuple(canon(v) for v in r) for r in drows}
                print("  spark-only:", list(s_set - d_set)[:3])
                print("  duck-only :", list(d_set - s_set)[:3])
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all oracle checks passed")


if __name__ == "__main__":
    main()
