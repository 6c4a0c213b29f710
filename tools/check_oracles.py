"""Local stand-in for the driver's correctness gate: run every queries()
entry and its oracle_sql() on the same sf dir, compare row count, schema
(column names), and order-insensitive values (floats rounded upstream).

Usage: PYTHONPATH=/root/repo python tools/check_oracles.py [sf_dir] [name...]
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from go_dcp_elasticsearch_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c] if not isinstance(r, tuple) else r[cols.index(c)]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL {name}: spark error: {str(e)[:400]}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            ores = con.sql(oracles[name])
            ocols = [c for c in ores.columns]
            orows = ores.fetchall()
        except Exception as e:
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"FAIL {name}: oracle error: {str(e)[:400]}")
            continue
        if sorted(scols) != sorted(ocols):
            failures.append((name, f"schema mismatch: spark={scols} duck={ocols}"))
            print(f"FAIL {name}: schema mismatch spark={scols} duck={ocols}")
            continue
        cols = sorted(scols)
        s_n = norm([{c: r[c] for c in scols} for r in srows], cols)
        o_n = norm([dict(zip(ocols, r)) for r in orows], cols)
        if len(s_n) != len(o_n):
            failures.append((name, f"rowcount: spark={len(s_n)} duck={len(o_n)}"))
            print(f"FAIL {name}: rowcount spark={len(s_n)} duck={len(o_n)}")
            continue
        if s_n != o_n:
            diff = [(a, b) for a, b in zip(s_n, o_n) if a != b][:5]
            failures.append((name, f"value mismatch: {diff}"))
            print(f"FAIL {name}: values differ, first diffs: {diff}")
            continue
        print(f"ok   {name}: {len(s_n)} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{'ALL OK' if not failures else f'{len(failures)} FAILURES'}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
