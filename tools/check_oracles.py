"""Local simulator of the driver's correctness harness.

Runs every ``queries()`` entry on Spark and, where an ``oracle_sql()``
entry exists, the oracle on DuckDB (tables registered as views), then
compares row count, column names, and the order-insensitive row
multiset.

DTYPE-FAITHFUL (round 3): both sides go through the SAME pandas
conversion the driver uses — Spark ``.toPandas()`` (Arrow) vs DuckDB
``.df()`` — and cells are compared by type-tagged repr.  This is what
the round-2 simulator got wrong: it fetched DuckDB rows with
``fetchall()`` (which yields ``decimal.Decimal`` objects, matching
Spark) and stripped trailing zeros, so the four driver hash-fails
(DuckDB pandas renders DECIMAL / HUGEINT sums as float64 while Spark
emits Decimal / int64) were invisible locally.  A Decimal('1.50') cell
now normalizes to ``"Decimal:1.50"`` while float 1.5 is ``"1.5"`` —
any engine dtype divergence is a red row, exactly like the driver's
hasher.

Also enforces the hard guard the round-2 judge asked for: a query
whose FINAL Spark schema contains DecimalType fails outright, before
any value compare (DuckDB's pandas path can never hash-match it).

Usage::

    python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import decimal
import math
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _cell(v):
    """Type-tagged normalization of one pandas cell.

    int 5 → "5"; float 5.0 → "5.0"; Decimal('1.50') → "Decimal:1.50".
    Distinct dtypes must never collide — that is the entire point.
    """
    if isinstance(v, np.generic):
        v = v.item()
    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return "None"
    if isinstance(v, decimal.Decimal):
        return f"Decimal:{v}"
    if isinstance(v, float):
        return repr(v)  # shortest round-trip: bit-identical ⇔ equal
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return "0x" + v.hex()
    return f"{type(v).__name__}:{v}" if not isinstance(v, (str, int, bool)) else str(v)


def rowset(df: pd.DataFrame):
    cols = sorted(df.columns)
    data = df[cols]
    return sorted(tuple(_cell(v) for v in row) for row in data.itertuples(index=False, name=None))


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
            # HARD GUARD: decimal output can never hash-match the
            # driver's DuckDB pandas path — fail before comparing.
            # Recurses: a decimal nested in a struct/array/map column
            # hits the same serialization divergence as a top-level one.
            def _has_decimal(dt) -> bool:
                if "Decimal" in type(dt).__name__:
                    return True
                return any(
                    _has_decimal(child.dataType if hasattr(child, "dataType") else child)
                    for child in getattr(dt, "fields", [])
                ) or any(
                    _has_decimal(getattr(dt, a))
                    for a in ("elementType", "keyType", "valueType")
                    if hasattr(dt, a)
                )

            bad = [f.name for f in sdf.schema.fields if _has_decimal(f.dataType)]
            if bad:
                failures.append((name, f"DecimalType in final schema: {bad}"))
                print(f"✗ {name}: DecimalType output column(s) {bad} — cast to double/bigint")
                continue
            spdf = sdf.toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"✗ {name}: spark error: {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"· {name}: rows-only ({len(spdf)} rows, {time.time()-t0:.1f}s)")
            if not len(spdf):
                failures.append((name, "rows-only query returned 0 rows"))
            continue
        try:
            opdf = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"✗ {name}: oracle error: {str(e)[:200]}")
            continue
        ok_schema = sorted(spdf.columns) == sorted(opdf.columns)
        s_set, o_set = rowset(spdf), rowset(opdf)
        ok_rows = s_set == o_set
        status = "✓" if (ok_schema and ok_rows) else "✗"
        print(f"{status} {name}: spark={len(spdf)} oracle={len(opdf)} schema={'ok' if ok_schema else (list(spdf.columns), list(opdf.columns))} ({time.time()-t0:.1f}s)")
        if not ok_schema:
            failures.append((name, f"schema: {list(spdf.columns)} vs {list(opdf.columns)}"))
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
