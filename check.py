"""Local correctness harness mirroring the driver's gate.

For every key in __spark_entry__.queries(): run the Spark DataFrame
and the DuckDB oracle SQL on the same parquet dir, then compare
row count, sorted column names, and the full (column-name-sorted,
row-sorted) value multiset. Floats must match exactly — that is what
an order-insensitive value-hash implies — so any near-miss is
reported separately as a hash risk.

Usage: python check.py [key-substring ...] [--sf DIR]
"""
from __future__ import annotations

import datetime
import decimal
import math
import sys
import time

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return out, [cols[i] for i in order]


def main():
    argv, args, sf = sys.argv[1:], [], "/root/testdata/sf0.01"
    i = 0
    while i < len(argv):
        if argv[i] == "--sf":
            sf = argv[i + 1]
            i += 2
        else:
            if not argv[i].startswith("--"):
                args.append(argv[i])
            i += 1

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as E
    from engine.session import get_spark

    spark = get_spark("check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    qs, oracles = E.queries(), E.oracle_sql()
    keys = [k for k in sorted(qs) if not args or any(a in k for a in args)]
    passed = failed = rows_only = 0
    for k in keys:
        t0 = time.time()
        try:
            df = qs[k](spark, sf)
            scols = df.columns
            srows = df.collect()
        except Exception as e:
            print(f"FAIL {k}: SPARK ERROR {type(e).__name__}: {str(e)[:400]}")
            failed += 1
            continue
        if k not in oracles:
            print(f"ok?  {k}: rows-only, {len(srows)} rows  ({time.time()-t0:.1f}s)")
            rows_only += 1
            continue
        try:
            res = con.execute(oracles[k])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {k}: DUCKDB ERROR {type(e).__name__}: {str(e)[:400]}")
            failed += 1
            continue
        if len(srows) != len(drows):
            print(f"FAIL {k}: row count spark={len(srows)} duckdb={len(drows)}")
            failed += 1
            continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {k}: schema spark={sorted(scols)} duckdb={sorted(dcols)}")
            failed += 1
            continue
        s, cols = canon(srows, scols)
        d, _ = canon(drows, dcols)
        if s == d:
            print(f"PASS {k}: {len(srows)} rows  ({time.time()-t0:.1f}s)")
            passed += 1
        else:
            bad = next(i for i in range(len(s)) if s[i] != d[i])
            print(f"FAIL {k}: value mismatch at sorted-row {bad}")
            print(f"  cols   {cols}")
            print(f"  spark  {s[bad]}")
            print(f"  duckdb {d[bad]}")
            failed += 1
    print(f"\n{passed} pass / {failed} fail / {rows_only} rows-only "
          f"of {len(keys)} keys")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
