"""As-of join: inclusive-tie semantics, null for no-prior-match, and
the single-shuffle window plan (no range-join candidate explosion)."""

import datetime as dt

from pyspark.sql import functions as F

from kblock_spark.ops.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-05T00:00:00")),   # between r1 and r2
            (2, 10, _ts("2024-01-10T00:00:00")),   # exactly r2 (inclusive)
            (3, 10, _ts("2024-01-01T00:00:00")),   # before everything
            (4, 20, _ts("2024-06-01T00:00:00")),   # key with no right rows
        ],
        "event_id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-02T00:00:00"), 100, "a"),
            (10, _ts("2024-01-10T00:00:00"), 200, "b"),
            (10, _ts("2024-02-01T00:00:00"), 300, "c"),
        ],
        "rk long, rts timestamp, val long, lab string",
    )
    got = {
        r["event_id"]: (r["val"], r["lab"])
        for r in asof_join(
            left, right, "k", "rk", "ts", "rts", ["val", "lab"]
        ).collect()
    }
    assert got == {
        1: (100, "a"),
        2: (200, "b"),   # right_ts == left_ts matches (inclusive)
        3: (None, None),
        4: (None, None),
    }


def test_asof_null_payload_field_not_backfilled(spark):
    """A null field in the matched right row must stay null — NOT be
    filled from an older right row (row-atomic payload carry, matching
    DuckDB ASOF JOIN)."""
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-03-01T00:00:00"))],
        "event_id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01T00:00:00"), 100, "old"),
            # matched row: val is NULL — output must carry (None, "new"),
            # never the stitched (100, "new")
            (10, _ts("2024-02-01T00:00:00"), None, "new"),
        ],
        "rk long, rts timestamp, val long, lab string",
    )
    [row] = asof_join(
        left, right, "k", "rk", "ts", "rts", ["val", "lab"]
    ).collect()
    assert (row["val"], row["lab"]) == (None, "new")


def test_asof_plan_is_window_not_range_join(spark):
    from kblock_spark.queries import q27_asof_join

    df = q27_asof_join(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan
