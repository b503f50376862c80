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


# --- portable HLL (oracle-exact; operators/sketch.py) ----------------------

_BE60_FROM_U = """CAST((
    (CAST((u >> 0)  & 255 AS UBIGINT) * 72057594037927936) +
    (CAST((u >> 8)  & 255 AS UBIGINT) * 281474976710656) +
    (CAST((u >> 16) & 255 AS UBIGINT) * 1099511627776) +
    (CAST((u >> 24) & 255 AS UBIGINT) * 4294967296) +
    (CAST((u >> 32) & 255 AS UBIGINT) * 16777216) +
    (CAST((u >> 40) & 255 AS UBIGINT) * 65536) +
    (CAST((u >> 48) & 255 AS UBIGINT) * 256) +
     CAST((u >> 56) & 255 AS UBIGINT)
  ) // 16 AS BIGINT)"""

_HLL_REG_CTES = f"""
WITH uu AS (
  SELECT md5_number_upper(CAST(o_custkey AS VARCHAR)) AS u FROM orders
), hh AS (
  SELECT {_BE60_FROM_U} AS h FROM uu
), r AS (
  SELECT h % 256 AS bucket,
         CASE WHEN (h >> 8) = 0 THEN 53
              ELSE 53 - CAST(length(bin(h >> 8)) AS INTEGER) END AS rho
  FROM hh
), reg AS (
  SELECT bucket, CAST(MAX(rho) AS INTEGER) AS register FROM r GROUP BY bucket
)"""

_HLL_REG_SQL = _HLL_REG_CTES + "\nSELECT bucket, register FROM reg\n"

_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / 256)

_HLL_EST_SQL = f"""{_HLL_REG_CTES}
, agg AS (
  SELECT SUM(CAST(1 AS BIGINT) << (53 - register)) AS s_ne, COUNT(*) AS ne FROM reg
)
SELECT (((CAST({_HLL_ALPHA!r} AS DOUBLE) * 256.0) * 256.0) * 9007199254740992.0)
       / CAST(s_ne + (256 - ne) * (CAST(1 AS BIGINT) << 53) AS DOUBLE) AS estimate
FROM agg
"""


@register("sketch_hll_portable_registers", oracle=_HLL_REG_SQL, tags=("sketch",))
def sketch_hll_portable_registers(spark, sf_dir):
    """Portable-HLL register table over orders.o_custkey — the
    mergeable sketch state as plain (bucket, max-rho) integers, exact
    in any engine (unlike the DataSketches binary above)."""
    from etlalchemy_spark.operators.sketch import hll_registers

    o = t(spark, sf_dir, "orders")
    reg = hll_registers(o, F.col("o_custkey"))
    return reg.select(
        F.col("bucket"), F.col("register").cast("int").alias("register")
    )


@register("sketch_hll_portable_estimate", oracle=_HLL_EST_SQL, tags=("sketch",))
def sketch_hll_portable_estimate(spark, sf_dir):
    """Raw HLL estimate of distinct o_custkey from the portable
    registers. The harmonic denominator is an exact integer sum, so
    even the ESTIMATE hash-matches the oracle bit-for-bit."""
    from etlalchemy_spark.operators.sketch import hll_estimate, hll_registers

    o = t(spark, sf_dir, "orders")
    return hll_estimate(hll_registers(o, F.col("o_custkey")))
