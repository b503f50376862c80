"""Hierarchical rollup, incremental MV maintenance, weighted sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from etlalchemy_spark.operators.sampling import weighted_systematic_sample
from etlalchemy_spark.queries._util import t
from etlalchemy_spark.registry import all_queries

from conftest import SF_DIR


def test_rollup_cascade_matches_direct(spark):
    got = all_queries()["ts_rollup_cascade"].fn(spark, SF_DIR)
    ev = t(spark, SF_DIR, "events")
    direct = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("decimal(38,4)")
        .cast("double")
        .alias("sum_value"),
    )
    assert got.exceptAll(direct).count() == 0
    assert direct.exceptAll(got).count() == 0


def test_incremental_mv_includes_delta_only_keys(spark):
    # keys only in the delta batch must appear in the maintained MV
    rows = [(1, 10.0, "1996-05-01"), (1, 5.0, "1997-06-01"), (2, 7.0, "1997-08-01")]
    df = spark.createDataFrame(rows, "o_custkey long, o_totalprice double, d string")
    base = df.where(F.col("d") < "1997-01-01")
    delta = df.where(F.col("d") >= "1997-01-01")

    def partial(x):
        return x.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("s"),
        )

    merged = (
        partial(base)
        .unionByName(partial(delta))
        .groupBy("o_custkey")
        .agg(F.sum("n").alias("n_orders"), F.sum("s").cast("double").alias("total"))
    )
    got = {r["o_custkey"]: (r["n_orders"], r["total"]) for r in merged.collect()}
    assert got == {1: (2, 15.0), 2: (1, 7.0)}


def test_weighted_sample_total_picks(spark):
    df = spark.createDataFrame(
        [(i, 1 + (i % 5)) for i in range(500)], "id long, w long"
    )
    out = weighted_systematic_sample(df, ["id"], F.col("w"), 50)
    picks = out.agg(F.sum("n_picks")).collect()[0][0]
    assert picks == 50  # systematic: exactly n draws, always


def test_weighted_sample_heavy_row_multi_pick(spark):
    # one row holds ~half the weight -> gets ~half the draws
    rows = [(0, 1000)] + [(i, 2) for i in range(1, 501)]
    df = spark.createDataFrame(rows, "id long, w long")
    out = {r["id"]: r["n_picks"] for r in
           weighted_systematic_sample(df, ["id"], F.col("w"), 20).collect()}
    assert out[0] >= 9  # 1000/2000 of 20 draws
    assert sum(out.values()) == 20


def test_gini_bounds_and_purity(spark):
    got = all_queries()["agg_gini_impurity"].fn(spark, SF_DIR).collect()
    assert got
    for r in got:
        assert 0.0 <= r["gini"] < 1.0
    # a pure group (single class) has gini exactly 0
    df = spark.createDataFrame([("a", "x")] * 10, "g string, cls string")
    c = df.groupBy("g", "cls").agg(F.count(F.lit(1)).alias("cnt"))
    n, s2 = F.sum("cnt"), F.sum(F.col("cnt") * F.col("cnt"))
    pure = c.groupBy("g").agg(
        ((n * n - s2).cast("double") / (n * n).cast("double")).alias("gini")
    ).collect()
    assert pure[0]["gini"] == 0.0


def test_split_partitions_whole_corpus(spark):
    rows = all_queries()["sample_train_test_split"].fn(spark, SF_DIR).collect()
    got = {r["split"]: r["n_docs"] for r in rows}
    total = t(spark, SF_DIR, "documents").count()
    assert sum(got.values()) == total  # partition, no loss/overlap
    assert got["train"] > got["val"] and got["train"] > got["test"]


def test_ewma_tracks_constant_series(spark):
    out = all_queries()["ts_ewma"].fn(spark, SF_DIR)
    # EWMA of any series stays within its min/max per user
    joined = out.groupBy("user_id").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi"),
        F.min("ewma").alias("elo"), F.max("ewma").alias("ehi"),
    )
    # small slack for the 1e-6 weight quantization
    bad = joined.where(
        (F.col("elo") < F.col("lo") - 1e-3) | (F.col("ehi") > F.col("hi") + 1e-3)
    )
    assert bad.count() == 0
