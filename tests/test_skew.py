"""Skew operators: salt determinism and salt-invariance of results."""

from __future__ import annotations

from pyspark.sql import functions as F

from etlalchemy_spark.operators.skew import salted_aggregate, salted_join, with_salt


def _skewed(spark):
    # 900 rows of key 'hot', 100 spread over 10 cold keys
    rows = [("hot", i % 7) for i in range(900)] + [
        (f"cold{i % 10}", i) for i in range(100)
    ]
    return spark.createDataFrame(rows, "k string, v int")


def test_salt_is_deterministic_in_data(spark):
    df = _skewed(spark)
    a = with_salt(df, 16).groupBy("_salt").count().collect()
    b = with_salt(df.repartition(7), 16).groupBy("_salt").count().collect()
    assert sorted((r["_salt"], r["count"]) for r in a) == sorted(
        (r["_salt"], r["count"]) for r in b
    )


def test_salted_aggregate_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        (r.k): (r.n, r.s) for r in df.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
        ).collect()
    }
    for n in (2, 16):
        salted = salted_aggregate(
            df,
            keys=["k"],
            partial={"c": F.count(F.lit(1)), "sv": F.sum("v")},
            final={"n": F.sum("c"), "s": F.sum("sv")},
            n=n,
        )
        got = {r.k: (r.n, r.s) for r in salted.collect()}
        assert got == plain, f"salted agg diverges at n={n}"


def test_salted_join_matches_plain(spark):
    probe = _skewed(spark)
    build = spark.createDataFrame(
        [("hot", "H"), ("cold1", "C1"), ("cold2", "C2")], "k string, label string"
    )
    plain = sorted(
        (r.k, r.v, r.label) for r in probe.join(build, "k").collect()
    )
    got = sorted((r.k, r.v, r.label) for r in salted_join(probe, build, ["k"], n=8).collect())
    assert got == plain


def test_salted_join_spreads_hot_key(spark):
    probe = _skewed(spark)
    build = spark.createDataFrame([("hot", "H")], "k string, label string")
    salted = with_salt(probe.where(F.col("k") == "hot"), 8, from_cols=probe.columns)
    n_salts = salted.select("_salt").distinct().count()
    assert n_salts >= 6  # hot key really fans out over most salts


def test_salted_join_rejects_outer_modes(spark):
    import pytest

    probe = _skewed(spark)
    build = spark.createDataFrame([("hot", "H")], "k string, label string")
    for how in ("right", "full", "full_outer"):
        with pytest.raises(ValueError):
            salted_join(probe, build, ["k"], n=4, how=how)


def test_aqe_skew_join_split_fires(spark):
    """The first line of defense at 100 TB is AQE's OptimizeSkewedJoin,
    not manual salting: a 90%-hot-key join must show the runtime skew
    split in the final adaptive plan (SortMergeJoin(skew=true) +
    AQEShuffleRead skewed) and still produce exact results. Thresholds
    are lowered to make fixture-scale partitions register as skewed —
    at real scale the defaults (256MB/5x median) fire the same rule.
    See SCALING.md "Skew: AQE vs salting" for when salting still wins
    (skewed AGGREGATE keys, which AQE cannot split)."""
    from pyspark.sql import functions as F

    lowered = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the shuffle join
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    }
    saved = {k: spark.conf.get(k, None) for k in lowered}
    try:
        for k, v in lowered.items():
            spark.conf.set(k, v)
        fact = spark.range(400000).select(
            F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 997).alias("k"),
            (F.col("id") % 1000).alias("v"),
        )
        dim = spark.range(997).select(F.col("id").alias("k"), (F.col("id") + 5).alias("w"))
        j = fact.join(dim, "k").groupBy().agg(
            F.count(F.lit(1)).alias("n"), F.sum(F.col("v") + F.col("w")).alias("s")
        )
        [row] = j.collect()
        # exact expected values, computed independently
        n_hot = sum(1 for i in range(400000) if i % 10 < 9)
        exp_n = 400000  # every fact key exists in dim (0..996)
        exp_s = sum((i % 1000) + ((0 if i % 10 < 9 else i % 997) + 5) for i in range(400000))
        assert (row.n, row.s) == (exp_n, exp_s) and n_hot == 360000
        plan = j._jdf.queryExecution().executedPlan().toString()
        # the definitive OptimizeSkewedJoin marker (the companion
        # "AQEShuffleRead skewed" line's exact rendering varies with
        # shuffle-partition count, so it is not pinned)
        assert "skew=true" in plan, "AQE skew-join split did not fire"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
