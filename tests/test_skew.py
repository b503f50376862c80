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
