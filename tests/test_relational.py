"""asof_join / bucketed_range_join semantics — including the NULL-value
case: ASOF returns ALL values from the single most recent right row,
NULLs included (never stitches older non-null values)."""

from datetime import datetime

from pyspark.sql import functions as F

from sema_spark.operators.relational import asof_join, bucketed_range_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_basic_and_no_prior(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00")), (2, _ts("2024-01-01 09:00:00"))],
        "k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:30:00"), 5.0), (1, _ts("2024-01-01 09:45:00"), 7.0)],
        "k long, rts timestamp, v double",
    )
    out = {r.k: r.v_asof for r in asof_join(left, right, "k", "ts", "rts", ["v"]).collect()}
    assert out[1] == 7.0  # most recent prior, not first
    assert out[2] is None  # no prior right row


def test_asof_null_value_from_latest_row_wins(spark):
    """The round-1 flaw: per-column last(ignorenulls) skipped right rows
    whose value was legitimately NULL and returned an OLDER row's value."""
    left = spark.createDataFrame([(1, _ts("2024-01-01 12:00:00"))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 5.0), (1, _ts("2024-01-01 11:00:00"), None)],
        "k long, rts timestamp, v double",
    )
    out = asof_join(left, right, "k", "ts", "rts", ["v"]).collect()
    assert out[0].v_asof is None  # the 11:00 row's NULL, not 10:00's 5.0


def test_asof_multiple_values_same_row(spark):
    """All value columns must come from ONE right row — never a stitch of
    different rows."""
    left = spark.createDataFrame([(1, _ts("2024-01-01 12:00:00"))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 1.0, "a"),
            (1, _ts("2024-01-01 11:00:00"), None, "b"),
        ],
        "k long, rts timestamp, x double, y string",
    )
    out = asof_join(left, right, "k", "ts", "rts", ["x", "y"]).collect()[0]
    assert out.x_asof is None and out.y_asof == "b"  # both from the 11:00 row


def test_asof_equal_timestamp_is_inclusive(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-01 10:00:00"))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 9.0)], "k long, rts timestamp, v double"
    )
    assert asof_join(left, right, "k", "ts", "rts", ["v"]).collect()[0].v_asof == 9.0


def test_bucketed_range_join_boundaries(spark):
    """Inclusive [ts - window, ts] interval, same key only, including
    matches that cross a bucket boundary."""
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 10:00:00"))], "id long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 09:00:00")),  # exactly window ago → in
            (10, _ts("2024-01-01 08:59:59")),  # 1s too old → out
            (10, _ts("2024-01-01 10:00:00")),  # equal → in
            (10, _ts("2024-01-01 10:00:01")),  # future → out
            (99, _ts("2024-01-01 09:30:00")),  # other key → out
        ],
        "k long, ts timestamp",
    )
    out = bucketed_range_join(left, right, key="k", left_ts="ts", right_ts="ts", window_seconds=3600)
    got = sorted(r.ts_r for r in out.collect())
    assert got == [_ts("2024-01-01 09:00:00"), _ts("2024-01-01 10:00:00")]
