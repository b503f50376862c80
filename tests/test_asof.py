"""Unit tests for the as-of join operator."""

import datetime

from etlalchemy_spark.operators.asof import asof_join


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_asof_basic(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00"), "l1"), (1, _ts("2024-01-01 12:00"), "l2"),
         (2, _ts("2024-01-01 10:00"), "l3")],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:00"), 100.0), (1, _ts("2024-01-01 11:00"), 200.0)],
        "k long, rts timestamp, v double",
    )
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts", payload_cols=["v"])
    got = {r.tag: (r.asof_v, r.asof_ts) for r in out.collect()}
    assert got["l1"] == (100.0, _ts("2024-01-01 09:00"))
    assert got["l2"] == (200.0, _ts("2024-01-01 11:00"))
    assert got["l3"] == (None, None)  # key 2 has no right rows


def test_asof_tie_is_inclusive(spark):
    # right row at EXACTLY the left ts must match (right.ts <= left.ts)
    left = spark.createDataFrame([(1, _ts("2024-01-01 10:00"), "l")], "k long, ts timestamp, tag string")
    right = spark.createDataFrame([(1, _ts("2024-01-01 10:00"), 5.0)], "k long, rts timestamp, v double")
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts", payload_cols=["v"]).collect()
    assert out[0].asof_v == 5.0


def test_asof_no_future_match(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-01 10:00"), "l")], "k long, ts timestamp, tag string")
    right = spark.createDataFrame([(1, _ts("2024-01-01 10:01"), 5.0)], "k long, rts timestamp, v double")
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts", payload_cols=["v"]).collect()
    assert out[0].asof_v is None


def test_asof_null_payload_not_backfilled(spark):
    """The as-of row's NULL payload must surface as NULL, not be
    backfilled from an older right row (struct-carry regression)."""
    left = spark.createDataFrame([(1, 3.0)], "k int, ts double").selectExpr(
        "k", "timestamp_seconds(ts) AS ts"
    )
    right = spark.createDataFrame(
        [(1, 1.0, 5.0), (1, 2.0, None)], "k int, ts double, value double"
    ).selectExpr("k", "timestamp_seconds(ts) AS ts", "value")
    from etlalchemy_spark.operators.asof import asof_join

    out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts", payload_cols=["value"]).collect()
    assert len(out) == 1
    assert str(out[0].asof_ts) == "1970-01-01 00:00:02"
    assert out[0].asof_value is None


def test_asof_join_rejects_column_collisions(spark):
    """Internal markers and output names must not silently overwrite
    left columns (r5 review)."""
    import pytest
    from etlalchemy_spark.operators.asof import asof_join
    from pyspark.sql import functions as F

    left = spark.createDataFrame([(1, 10, "x")], "k int, t int, _side string")
    right = spark.createDataFrame([(1, 5, 1.0)], "k int, rt int, v double")
    with pytest.raises(ValueError, match="_side"):
        asof_join(left, right, "k", "t", "rt", ["v"])
    left2 = spark.createDataFrame([(1, 10, 0.0)], "k int, t int, asof_v double")
    with pytest.raises(ValueError, match="asof_v"):
        asof_join(left2, right, "k", "t", "rt", ["v"])


def test_asof_nearest_tie_goes_backward(spark):
    """pandas merge_asof(direction='nearest') tie rule: equidistant
    past/future matches resolve to the PRIOR row; one-sided cases fall
    back to whichever side exists."""
    from datetime import datetime

    from etlalchemy_spark.operators.asof import asof_join_nearest

    ts = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    left = spark.createDataFrame(
        [(1, "u", ts(10)), (2, "u", ts(1)), (3, "v", ts(30))],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", ts(5), 50.0), ("u", ts(15), 150.0), ("v", ts(40), 400.0)],
        "k string, ts timestamp, value double",
    )
    got = {
        r["id"]: (r["asof_ts"], r["asof_value"])
        for r in asof_join_nearest(
            left, right, on="k", left_ts="ts", right_ts="ts", payload_cols=["value"]
        ).collect()
    }
    assert got[1] == (ts(5), 50.0)  # tie (5 min both ways) -> backward
    assert got[2] == (ts(5), 50.0)  # only future exists -> forward
    assert got[3] == (ts(40), 400.0)  # only future exists -> forward


def test_asof_forward_direction_and_tolerance(spark):
    from datetime import datetime

    from etlalchemy_spark.operators.asof import asof_join

    ts = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    left = spark.createDataFrame([(1, "u", ts(10))], "id long, k string, ts timestamp")
    right = spark.createDataFrame(
        [("u", ts(5), 5.0), ("u", ts(20), 20.0), ("u", ts(50), 50.0)],
        "k string, ts timestamp, value double",
    )
    fwd = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts",
        payload_cols=["value"], direction="forward",
    ).head()
    assert fwd["asof_ts"] == ts(20) and fwd["asof_value"] == 20.0
    # tolerance bounds the future distance
    tight = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts",
        payload_cols=["value"], direction="forward", tolerance="5 MINUTES",
    ).head()
    assert tight["asof_ts"] is None and tight["asof_value"] is None
