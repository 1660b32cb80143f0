"""Local stand-in for the driver's correctness gate: run each
__spark_entry__ query on Spark and its oracle on DuckDB over the same
parquet tables, compare row count + column names + order-insensitive
values. Usage: python scripts/check_oracle.py [sf_dir] [query ...]"""

from __future__ import annotations

import os
import sys
import datetime as dt
from decimal import Decimal

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        return format(v, ".10g")
    if isinstance(v, Decimal):
        return format(float(v), ".10g")
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    return str(v)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from gear5_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"[FAIL-spark] {name}: {e}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(srows)} rows, cols={scols}")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"[FAIL-oracle] {name}: {e}")
            continue
        if sorted(scols) != sorted(ocols):
            failures.append((name, f"cols {sorted(scols)} != {sorted(ocols)}"))
            print(f"[FAIL-cols] {name}: {sorted(scols)} != {sorted(ocols)}")
            continue
        if len(srows) != len(orows):
            failures.append((name, f"rows {len(srows)} != {len(orows)}"))
            print(f"[FAIL-count] {name}: {len(srows)} != {len(orows)}")
            continue
        order = sorted(range(len(scols)), key=lambda i: scols[i])
        oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
        sset = sorted(
            tuple(canon(r[i]) for i in order) for r in srows
        )
        oset = sorted(
            tuple(canon(r[i]) for i in oorder) for r in orows
        )
        if sset != oset:
            diff = [
                (a, b) for a, b in zip(sset, oset) if a != b
            ][:3]
            failures.append((name, f"values differ, first diffs: {diff}"))
            print(f"[FAIL-values] {name}: first diffs {diff}")
            continue
        print(f"[ok] {name}: {len(srows)} rows")
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {[f[0] for f in failures]}")
        return 1
    print("all checked queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
