"""Relational operators Spark lacks as built-ins, expressed as
compositions of DataFrame ops (SURVEY §2.3 'absent in reference;
Catalyst-composable'):

* :func:`asof_join` — for each left row, the latest right row with
  ``right.ts <= left.ts`` per key.  Implemented with the union+window
  trick: one shuffle on (key), no range-explosion, no per-row Python.
  The DuckDB oracle uses its native ASOF JOIN, making this one of the
  strongest cross-engine checks in the suite.
* :func:`bucketed_range_join` — interval join (left.ts - window ≤
  right.ts ≤ left.ts, same key) as an EQUI-join on time buckets: the
  right side explodes to (bucket, bucket+1) so every candidate pair
  shares a bucket, then the exact range predicate filters.  A naive
  theta-join degenerates to per-key nested loops; bucketing keeps it a
  hash join whose cost is bounded by events-per-window, the standard
  scale pattern for time-range joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    window_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """All (left, right) pairs with same key and
    ``left_ts - window <= right_ts <= left_ts``.

    Returns left columns + right columns suffixed ``_r``.
    """
    # fractional epoch (timestamp→double keeps microseconds); integer
    # unix_timestamp would mis-bucket sub-second boundaries
    l_epoch = F.col(left_ts).cast("timestamp").cast("double")
    r_epoch = F.col(right_ts).cast("timestamp").cast("double")
    l = left.withColumn("_bucket", F.floor(l_epoch / window_seconds)).withColumn("_le", l_epoch)
    rcols = [F.col(c).alias(f"{c}_r") for c in right.columns]
    r = (
        right.select(*rcols, F.floor(r_epoch / window_seconds).alias("_rb"), r_epoch.alias("_re"))
        # a right row can match left rows in its own bucket or the next
        .withColumn("_bucket", F.explode(F.array(F.col("_rb"), F.col("_rb") + 1)))
        .drop("_rb")
    )
    joined = l.join(
        r,
        on=[
            l["_bucket"] == r["_bucket"],
            F.col(f"{key}_r") == l[key],
            F.col("_re") <= F.col("_le"),
            F.col("_re") >= F.col("_le") - window_seconds,
        ],
        how=how,
    )
    return joined.drop("_bucket", "_le", "_re")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every left row + the most recent right values at
    or before its timestamp (nulls when no prior right row exists).

    Plan shape: union the two sides tagged, window ``last(struct,
    ignorenulls)`` per key ordered by (ts, side) with right rows sorting
    before left rows at equal timestamps (ASOF '<=' semantics), then
    keep the left rows.  One shuffle on key; scales as a plain window.

    The fill carries ONE struct per right ROW (never per value column):
    filling each value column independently would skip right rows whose
    value is legitimately NULL and could even stitch values from
    *different* right rows — true ASOF semantics return all values from
    the single most recent right row, NULLs included.
    """
    lcols = [c for c in left.columns]
    vrow_type = "struct<" + ",".join(
        f"{c}:{right.schema[c].dataType.simpleString()}" for c in value_cols
    ) + ">"
    l_tagged = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*lcols).alias("_lrow"),
        F.lit(None).cast(vrow_type).alias("_vrow"),
    )
    r_tagged = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_tagged.schema["_lrow"].dataType).alias("_lrow"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_vrow"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tagged.unionByName(r_tagged).select(
        "_side",
        "_lrow",
        F.last("_vrow", ignorenulls=True).over(w).alias("_frow"),
    )
    out = filled.filter(F.col("_side") == 1).select(
        *[F.col(f"_lrow.{c}").alias(c) for c in lcols],
        *[F.col(f"_frow.{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
    return out
