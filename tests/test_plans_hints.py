"""Join-strategy hints: the physical strategy must follow the hint and
the result must be strategy-invariant (the 100 TB escape hatch when
statistics mislead the optimizer)."""

from pyspark.sql import functions as F

from conftest import SF_DIR
from etlalchemy_spark.queries._util import t


def _join(spark, hint):
    li = t(spark, SF_DIR, "lineitem").select("l_orderkey", "l_extendedprice")
    o = t(spark, SF_DIR, "orders").select("o_orderkey", "o_orderpriority")
    joined = li.join(o.hint(hint), li.l_orderkey == o.o_orderkey)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
        .cast("decimal(38,4)")
        .cast("double")
        .alias("s"),
    )


def _final_plan(df):
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_merge_hint_forces_sort_merge_join(spark):
    plan = _final_plan(_join(spark, "merge"))
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan


def test_broadcast_hint_forces_broadcast_join(spark):
    plan = _final_plan(_join(spark, "broadcast"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_hinted_strategies_agree_on_results(spark):
    a = sorted(map(tuple, _join(spark, "merge").collect()))
    b = sorted(map(tuple, _join(spark, "broadcast").collect()))
    c = sorted(map(tuple, _join(spark, "shuffle_hash").collect()))
    assert a == b == c
