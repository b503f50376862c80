"""Two-phase global-order operators vs the single-partition window
they replace — results must be identical, ties included."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from etlalchemy_spark.operators.prefix import (
    bucket_id,
    global_ranks,
    range_bounds,
    running_global_max,
    running_global_sum,
)


@pytest.fixture(scope="module")
def df(spark):
    # keys with heavy ties (each value appears ~4×) so tie groups would
    # straddle naive bucket boundaries
    rows = [(i, float((i * 7) % 25), float(i % 13)) for i in range(100)]
    return spark.createDataFrame(rows, "id int, key double, val double")


def test_bucket_id_colocates_ties(spark, df):
    bounds = range_bounds(df, F.col("key"), 8)
    b = df.select("key", bucket_id(F.col("key"), bounds).alias("pid"))
    per_key = b.groupBy("key").agg(F.count_distinct("pid").alias("n")).collect()
    assert all(r["n"] == 1 for r in per_key)


def test_global_ranks_match_window(spark, df):
    got = {
        r["id"]: (r["rn"], r["rnk"], r["drnk"])
        for r in global_ranks(df, F.col("key"), ["id"], n_buckets=8).collect()
    }
    w_rn = Window.orderBy("key", "id")
    w_k = Window.orderBy("key")
    want = {
        r["id"]: (r["rn"], r["rnk"], r["drnk"])
        for r in df.select(
            "id",
            F.row_number().over(w_rn).alias("rn"),
            F.rank().over(w_k).alias("rnk"),
            F.dense_rank().over(w_k).alias("drnk"),
        ).collect()
    }
    assert got == want


def test_global_ranks_desc_via_negation(spark, df):
    got = {
        r["id"]: r["rn"]
        for r in global_ranks(df, -F.col("key"), ["id"], n_buckets=8).collect()
    }
    want = {
        r["id"]: r["rn"]
        for r in df.select(
            "id", F.row_number().over(Window.orderBy(F.desc("key"), "id")).alias("rn")
        ).collect()
    }
    assert got == want


def test_running_global_sum_matches_window(spark, df):
    d = df.withColumn("dval", F.col("val").cast("decimal(18,4)"))
    got = {
        r["id"]: r["rt"]
        for r in running_global_sum(
            d, F.col("key"), ["id"], F.col("dval"), alias="rt", n_buckets=8
        ).collect()
    }
    w = Window.orderBy("key", "id").rowsBetween(Window.unboundedPreceding, 0)
    want = {r["id"]: r["rt"] for r in d.select("id", F.sum("dval").over(w).alias("rt")).collect()}
    assert got == want


def test_running_global_max_matches_window(spark, df):
    got = {
        r["id"]: r["rm"]
        for r in running_global_max(
            df, F.col("key"), ["id"], F.col("val"), alias="rm", n_buckets=8
        ).collect()
    }
    w = Window.orderBy("key", "id").rowsBetween(Window.unboundedPreceding, 0)
    want = {r["id"]: r["rm"] for r in df.select("id", F.max("val").over(w).alias("rm")).collect()}
    assert got == want


def test_single_bucket_degenerate(spark):
    # all-equal keys → no bounds → one bucket; must still rank correctly
    d = spark.createDataFrame([(i, 1.0) for i in range(5)], "id int, key double")
    out = global_ranks(d, F.col("key"), ["id"], n_buckets=4).orderBy("id").collect()
    assert [r["rn"] for r in out] == [1, 2, 3, 4, 5]
    assert all(r["rnk"] == 1 and r["drnk"] == 1 for r in out)


def test_native_key_order_survives_double_collision(spark):
    # r7 verdict #2: distinct int64 keys above 2^53 collapse to EQUAL
    # doubles (2^53 and 2^53+1 are the same float64). The double cast
    # may only pick the bucket; ordering, rank distinctness, and
    # running sums must follow the NATIVE long key — exactly the shape
    # of 64-bit content-hash ordering keys at full scale.
    base = 1 << 53
    keys = [base + i for i in range(12)]  # consecutive: doubles collide in pairs
    rows = [(i, k, 10 + i) for i, k in enumerate(keys)]
    d = spark.createDataFrame(rows, "id int, key long, val long")
    # sanity: the hazard is real — at least two distinct keys share a double
    doubles = {float(k) for k in keys}
    assert len(doubles) < len(keys)

    got = {
        r["id"]: (r["rn"], r["rnk"], r["drnk"])
        for r in global_ranks(d, F.col("key"), ["id"], n_buckets=4).collect()
    }
    # keys are strictly increasing and unique → all three ranks = position+1
    for i in range(len(keys)):
        assert got[i] == (i + 1, i + 1, i + 1), f"id {i}: {got[i]}"

    sums = {
        r["id"]: int(r["rt"])
        for r in running_global_sum(
            d, F.col("key"), ["id"], F.col("val").cast("decimal(18,0)"),
            alias="rt", n_buckets=4,
        ).collect()
    }
    expect, acc = {}, 0
    for i in range(len(keys)):
        acc += 10 + i
        expect[i] = acc
    assert sums == expect

    maxes = {
        r["id"]: r["rm"]
        for r in running_global_max(
            # descending vals so running max is the FIRST row's val unless
            # ordering breaks and a later (larger-keyed) row sneaks ahead
            d.withColumn("v2", F.lit(100) - F.col("val")),
            F.col("key"), ["id"], F.col("v2"), alias="rm", n_buckets=4,
        ).collect()
    }
    assert all(maxes[i] == 90 for i in range(len(keys)))


def test_global_ranks_null_keys_dense_offsets(spark):
    # NULL keys form their own dense-rank group (NULLS FIRST in Spark's
    # ascending order); later buckets' dense offsets must count it.
    rows = [(0, None), (1, None), (2, 10.0), (3, 20.0), (4, 20.0), (5, 30.0)]
    d = spark.createDataFrame(rows, "id int, key double")
    got = {
        r["id"]: (r["rn"], r["rnk"], r["drnk"])
        for r in global_ranks(d, F.col("key"), ["id"], n_buckets=4).collect()
    }
    w_rn = Window.orderBy("key", "id")
    w_k = Window.orderBy("key")
    want = {
        r["id"]: (r["rn"], r["rnk"], r["drnk"])
        for r in d.select(
            "id",
            F.row_number().over(w_rn).alias("rn"),
            F.rank().over(w_k).alias("rnk"),
            F.dense_rank().over(w_k).alias("drnk"),
        ).collect()
    }
    assert got == want
    # distinct non-null values 10/20/30 must get dense ranks 2/3/4, not 2/3/3
    assert got[5][2] == 4


def test_fused_ranks_and_running_sum_matches_composition(spark, df):
    from etlalchemy_spark.operators.prefix import ranks_and_running_sum

    d = df.withColumn("dval", F.col("val").cast("decimal(18,4)"))
    fused = {
        r["id"]: (r["rn"], r["rnk"], r["drnk"], r["rt"])
        for r in ranks_and_running_sum(
            d, F.col("key"), ["id"], F.col("dval"), alias="rt", n_buckets=8
        ).collect()
    }
    ranks = {
        r["id"]: (r["rn"], r["rnk"], r["drnk"])
        for r in global_ranks(d, F.col("key"), ["id"], n_buckets=8).collect()
    }
    sums = {
        r["id"]: r["rt"]
        for r in running_global_sum(
            d, F.col("key"), ["id"], F.col("dval"), alias="rt", n_buckets=8
        ).collect()
    }
    assert fused == {i: (*ranks[i], sums[i]) for i in ranks}
