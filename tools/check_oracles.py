"""Local simulator of the driver's correctness harness.

Runs every ``queries()`` entry on Spark and, where an ``oracle_sql()``
entry exists, the oracle on DuckDB (tables registered as views), then
compares row count, column names, and the order-insensitive row
multiset.  Usage::

    python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import decimal
import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _norm(v):
    if isinstance(v, decimal.Decimal):
        return f"{v:f}".rstrip("0").rstrip(".") if "." in f"{v:f}" else f"{v:f}"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # FULL precision: the driver hashes values exactly; %.9g masked
        # the round-1 tpch_q1/sessionization drift.  repr is shortest
        # round-trip — bit-identical doubles ⇔ equal strings.
        return repr(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from sema_spark.session import get_spark

    spark = get_spark(cores=8, extra_conf={"spark.sql.shuffle.partitions": "16"})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = E.queries(), E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"✗ {name}: spark error: {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"· {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            if not srows:
                failures.append((name, "rows-only query returned 0 rows"))
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"✗ {name}: oracle error: {str(e)[:200]}")
            continue
        ok_schema = sorted(scols) == sorted(ocols)
        s_set, o_set = rowset(scols, srows), rowset(ocols, orows)
        ok_rows = s_set == o_set
        status = "✓" if (ok_schema and ok_rows) else "✗"
        print(f"{status} {name}: spark={len(srows)} oracle={len(orows)} schema={'ok' if ok_schema else (scols, ocols)} ({time.time()-t0:.1f}s)")
        if not ok_schema:
            failures.append((name, f"schema: {scols} vs {ocols}"))
        elif not ok_rows:
            diff_a = [r for r in s_set if r not in o_set][:3]
            diff_b = [r for r in o_set if r not in s_set][:3]
            failures.append((name, f"rows differ: spark-only {diff_a} oracle-only {diff_b}"))
            print(f"   spark-only: {diff_a}\n   oracle-only: {diff_b}")
    print(f"\n{'ALL OK' if not failures else f'{len(failures)} FAILURES'}")
    for n, msg in failures:
        print(f"  {n}: {msg[:300]}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
