"""Flagship relational queries (TPC-H-style) over the fixture star schema.

These exercise the core of SURVEY.md §2 Table B: partitioned parquet
scan with pushed-down filters, hash aggregation (partial + final),
broadcast joins on the bounded dims, sort / top-k. Catalyst plans all of
it; the formulations only steer determinism (decimal reductions) and
join strategy (explicit ``broadcast`` on dims that stay small at any
scale factor — SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etlalchemy_spark.registry import register
from etlalchemy_spark.queries._util import dec, one, t, ts, MONEY, RATE

# --- Q1: pricing summary (flagship: scan → filter → agg → sort) ------------

_Q1_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_qty,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_base_price,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(8,4)))), 4) AS DOUBLE) AS sum_disc_price,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(8,4))) * (1 + CAST(l_tax AS DECIMAL(8,4)))), 4) AS DOUBLE) AS sum_charge,
  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 4) AS DOUBLE) / CAST(COUNT(l_quantity) AS DOUBLE) AS avg_qty,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 4) AS DOUBLE) / CAST(COUNT(l_extendedprice) AS DOUBLE) AS avg_price,
  CAST(ROUND(SUM(CAST(l_discount AS DECIMAL(8,4))), 4) AS DOUBLE) / CAST(COUNT(l_discount) AS DOUBLE) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=_Q1_SQL, tags=("agg", "flagship", "bench"))
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 analogue: 2-key hash agg with 8 aggregates over lineitem.

    Plan shape: parquet scan (shipdate filter pushed down) → partial
    hash agg → single shuffle on (returnflag, linestatus) → final agg
    → sort over ~6 groups. Scales linearly: the shuffle carries only
    #groups × #partitions rows.
    """
    li = t(spark, sf_dir, "lineitem", fanout=True)
    qty = dec("l_quantity")
    price = dec("l_extendedprice")
    disc = dec("l_discount", RATE)
    tax = dec("l_tax", RATE)
    disc_price = price * (one() - disc)
    charge = disc_price * (one() + tax)
    return (
        li.where(F.col("l_shipdate") <= ts("2000-09-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("decimal(38,4)").cast("double").alias("sum_qty"),
            F.sum(price).cast("decimal(38,4)").cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("decimal(38,4)").cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("decimal(38,4)").cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / F.count("l_quantity").cast("double")).alias("avg_qty"),
            (F.sum(price).cast("double") / F.count("l_extendedprice").cast("double")).alias(
                "avg_price"
            ),
            (F.sum(disc).cast("double") / F.count("l_discount").cast("double")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- Q3: shipping priority (join fact-fact + dim, agg, total-order top-k) --

_Q3_SQL = """
SELECT
  l_orderkey,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(8,4)))), 4) AS DOUBLE) AS revenue,
  o_orderdate,
  o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", oracle=_Q3_SQL, tags=("join", "agg", "topk", "bench"))
def q3_shipping_priority(spark, sf_dir):
    """Customer ⋈ orders ⋈ lineitem with selective dim filter + top-10.

    customer is broadcast (SF-proportional but orders-of-magnitude under
    the facts; at 100 TB it would be bucketed instead — the broadcast
    hint degrades gracefully via AQE if it exceeds the threshold).
    orders⋈lineitem shuffles on orderkey. ORDER BY has a total
    tie-break (l_orderkey) so LIMIT 10 is deterministic cross-engine.
    """
    cust = t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < ts("1998-03-15 00:00:00")
    )
    li = t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > ts("1998-03-15 00:00:00"))
    disc_price = dec("l_extendedprice") * (one() - dec("l_discount", RATE))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(disc_price).cast("decimal(38,4)").cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


# --- Q5: local supplier volume (6-way join) --------------------------------

_Q5_SQL = """
SELECT
  n_name,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(8,4)))), 4) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@register("q5_local_supplier_volume", oracle=_Q5_SQL, tags=("join", "agg", "bench"))
def q5_local_supplier_volume(spark, sf_dir):
    """Six-way star join: lineitem⋈orders shuffle, everything else broadcast.

    region/nation are bounded at any SF and broadcast unconditionally;
    supplier/customer broadcast at test scale (AQE re-plans if not).
    The c_nationkey = s_nationkey equality ("local supplier") is applied
    post-join as a filter column comparison.
    """
    region = t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = t(spark, sf_dir, "nation")
    supplier = t(spark, sf_dir, "supplier")
    customer = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < ts("1998-01-01 00:00:00"))
    )
    li = t(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice") * (one() - dec("l_discount", RATE))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .where(customer.c_nationkey == supplier.s_nationkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(disc_price).cast("decimal(38,4)").cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


# --- Q6: forecasting revenue change (selective scan, scalar agg) -----------

_Q6_SQL = """
SELECT
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(8,4))), 4) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.04 AND 0.08
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", oracle=_Q6_SQL, tags=("filter", "agg", "bench"))
def q6_forecast_revenue(spark, sf_dir):
    """Highly selective scan → scalar aggregate; every predicate is
    parquet-pushdown-eligible (shipdate min/max row-group skipping)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < ts("1997-01-01 00:00:00"))
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.08)
            & (F.col("l_quantity") < 24)
        )
        .agg((F.sum(dec("l_extendedprice") * dec("l_discount", RATE))).cast("decimal(38,4)").cast("double").alias("revenue"))
    )
