"""Mergeable-sketch aggregation and Python UDTF surface.

Sketches are THE distinct-count pattern at 100 TB: each partition
builds a fixed-size HLL sketch (map-side), sketches merge
associatively (``hll_union_agg``), and only the estimate leaves the
cluster. Estimates are engine-specific (Apache DataSketches HLL here)
→ rows-only in the oracle harness; the pytest suite pins their error
against exact counts instead.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etlalchemy_spark.registry import register
from etlalchemy_spark.queries._util import t

_HLL_ROLLUP_SQL = None  # engine-specific estimates — rows-only


@register("sketch_hll_distinct_customers", tags=("agg", "approx", "sketch"))
def sketch_hll_distinct_customers(spark, sf_dir):
    """Distinct customers per order priority via HLL sketches. The
    two-level shape (sketch per (priority, status) partial → union up
    to priority) is the re-aggregatable rollup a 100 TB pipeline
    stores: persist the binary sketch column, answer distinct-counts
    at any coarser grain later without rescanning."""
    orders = t(spark, sf_dir, "orders")
    partials = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.hll_sketch_agg("o_custkey").alias("sk")
    )
    return (
        partials.groupBy("o_orderpriority")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_customers"))
        .orderBy("o_orderpriority")
    )


@register("sketch_hll_cross_table_union", tags=("agg", "approx", "sketch"))
def sketch_hll_cross_table_union(spark, sf_dir):
    """Distinct custkeys across TWO tables (customer ∪ orders) by
    merging independently built sketches — the cross-dataset dedup
    estimate a lake pipeline runs without ever co-shuffling the
    tables. Each side aggregates locally; only two fixed-size binary
    sketches meet."""
    cust_sk = t(spark, sf_dir, "customer").agg(F.hll_sketch_agg("c_custkey").alias("sk"))
    ord_sk = t(spark, sf_dir, "orders").agg(F.hll_sketch_agg("o_custkey").alias("sk"))
    return (
        cust_sk.unionAll(ord_sk)
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_union_customers"))
    )
