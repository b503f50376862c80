"""Unit tests for the T1–T9 type standardizer (SURVEY.md Table A)."""

import pytest
from pyspark.sql import types as T

from etlalchemy_spark.operators.standardize import (
    apply_decisions,
    decide,
    next_pow2,
    observe,
    standardize,
    varchar_metadata,
)


@pytest.mark.parametrize(
    "n,expected",
    [(0, 1), (1, 1), (2, 2), (3, 4), (4, 4), (5, 8), (16, 16), (17, 32), (1000, 1024)],
)
def test_next_pow2(n, expected):
    assert next_pow2(n) == expected


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_int_downsizing_ladder(spark):
    df = _df(
        spark,
        [(1, 100, 40000, 3_000_000_000), (7, -100, -40000, -3_000_000_000)],
        "a long, b long, c long, d long",
    )
    out, decisions = standardize(df)
    by_name = {d.name: d for d in decisions}
    assert by_name["a"].target_type == "tinyint"
    assert by_name["b"].target_type == "tinyint"
    assert by_name["c"].target_type == "int"
    assert by_name["d"].action == "keep"  # already bigint, fits nothing narrower
    types = dict(out.dtypes)
    assert types["a"] == "tinyint" and types["c"] == "int" and types["d"] == "bigint"
    # round-trip: downsized cast loses no value
    assert sorted(r.a for r in out.collect()) == [1, 7]


def test_boolean_inference(spark):
    df = _df(spark, [(0, 0), (1, 2)], "flag long, notflag long")
    _, decisions = standardize(df)
    by_name = {d.name: d for d in decisions}
    assert by_name["flag"].target_type == "boolean"
    assert by_name["notflag"].target_type == "tinyint"


def test_boolean_not_inferred_for_negative(spark):
    df = _df(spark, [(0,), (-1,)], "x long")
    _, decisions = standardize(df)
    assert decisions[0].target_type == "tinyint"


def test_empty_column_eliminated(spark):
    df = _df(spark, [(1, None), (2, None)], "a long, b string")
    out, decisions = standardize(df)
    by_name = {d.name: d for d in decisions}
    assert by_name["b"].action == "drop_empty"
    assert out.columns == ["a"]


def test_suffix_ignore(spark):
    df = _df(spark, [(1, "x")], "id long, scratch_tmp string")
    out, decisions = standardize(df, ignored_suffixes=["_tmp"])
    assert out.columns == ["id"]
    assert {d.name: d.action for d in decisions}["scratch_tmp"] == "drop_suffix"


def test_varchar_sizing_metadata(spark):
    df = _df(spark, [("abc",), ("abcdefg",)], "s string")
    _, decisions = standardize(df)
    assert varchar_metadata(decisions) == {"s": 8}


def test_doubles_and_timestamps_pass_through(spark):
    import datetime

    df = spark.createDataFrame(
        [(1.5, datetime.datetime(2020, 1, 1))], "x double, ts timestamp"
    )
    out, decisions = standardize(df)
    assert dict(out.dtypes) == {"x": "double", "ts": "timestamp"}
    assert all(d.action == "keep" for d in decisions)


def test_observe_is_single_pass(spark):
    # All stats come back from one agg row
    df = _df(spark, [(1, "ab"), (2, None)], "i long, s string")
    stats = observe(df)
    assert stats["i__n"] == 2 and stats["i__min"] == 1 and stats["i__max"] == 2
    assert stats["s__n"] == 1 and stats["s__maxlen"] == 2


def test_boolean_inferred_with_nulls(spark):
    """Nullable flag columns ({0,1,NULL}) must still infer boolean."""
    df = _df(spark, [(0,), (1,), (None,)], "b long")
    out, decisions = standardize(df)
    by_name = {d.name: d for d in decisions}
    assert by_name["b"].target_type == "boolean"
    got = sorted((r.b for r in out.collect()), key=lambda x: (x is None, x))
    assert got == [False, True, None]


def test_standardize_empty_table_is_noop(spark):
    """A 0-row partition must keep its schema — the old behavior
    classified every column drop_empty and returned a zero-column
    frame (r5 review)."""
    from etlalchemy_spark.operators.standardize import standardize

    df = spark.createDataFrame([], "a int, b string, c double")
    out, decisions = standardize(df)
    assert out.columns == ["a", "b", "c"]
    assert all(d.action == "keep" for d in decisions)
