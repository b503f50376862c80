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
