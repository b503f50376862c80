"""Sketch queries have no SQL oracle (engine-specific estimators) — pin
their error against exact counts here instead."""

from __future__ import annotations

from pyspark.sql import functions as F

from etlalchemy_spark.queries._util import t
from etlalchemy_spark.registry import all_queries

from conftest import SF_DIR


def test_hll_rollup_close_to_exact(spark):
    got = {
        r.o_orderpriority: r.approx_customers
        for r in all_queries()["sketch_hll_distinct_customers"].fn(spark, SF_DIR).collect()
    }
    exact = {
        r.o_orderpriority: r.n
        for r in t(spark, SF_DIR, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count_distinct("o_custkey").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for k in exact:
        rel = abs(got[k] - exact[k]) / exact[k]
        assert rel < 0.05, f"{k}: hll {got[k]} vs exact {exact[k]} ({rel:.1%} off)"


def test_hll_union_close_to_exact(spark):
    (got,) = all_queries()["sketch_hll_cross_table_union"].fn(spark, SF_DIR).collect()
    exact = (
        t(spark, SF_DIR, "customer")
        .select(F.col("c_custkey").alias("k"))
        .union(t(spark, SF_DIR, "orders").select(F.col("o_custkey").alias("k")))
        .agg(F.count_distinct("k"))
        .collect()[0][0]
    )
    rel = abs(got.approx_union_customers - exact) / exact
    assert rel < 0.05


# --- portable HLL ----------------------------------------------------------

from pyspark.sql import functions as F

from etlalchemy_spark.operators.sketch import (
    M_BUCKETS,
    hll_estimate,
    hll_merge,
    hll_registers,
)


def test_portable_hll_error_bound(spark):
    n = 5000
    df = spark.createDataFrame([(i,) for i in range(n)], "k long")
    est = hll_estimate(hll_registers(df, F.col("k"))).first()["estimate"]
    # 256 buckets → ~6.5% stderr; allow 4 sigma
    assert abs(est - n) / n < 0.26


def test_portable_hll_merge_equals_union(spark):
    a = spark.createDataFrame([(i,) for i in range(0, 3000)], "k long")
    b = spark.createDataFrame([(i,) for i in range(1500, 4500)], "k long")
    merged = hll_merge(hll_registers(a, F.col("k")), hll_registers(b, F.col("k")))
    both = a.unionByName(b)
    est_merged = hll_estimate(merged).first()["estimate"]
    est_direct = hll_estimate(hll_registers(both, F.col("k"))).first()["estimate"]
    assert est_merged == est_direct  # merge is lossless, not just close


def test_portable_hll_register_shape(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], "k long")
    regs = hll_registers(df, F.col("k")).collect()
    assert len(regs) <= M_BUCKETS
    assert all(0 <= r["bucket"] < M_BUCKETS and 1 <= r["register"] <= 53 for r in regs)
