"""Additional TPC-H-style analogues adapted to the fixture schema:
correlated EXISTS, group-HAVING, disjunctive pushdown predicates,
join + top-N, conditional aggregation ratios.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etlalchemy_spark.registry import register
from etlalchemy_spark.queries._util import dec, one, t, ts, RATE

_Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 30 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("q4_order_priority", oracle=_Q4_SQL, tags=("join", "agg"))
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 analogue: correlated EXISTS → left-semi join with a
    range residual (orders with any line shipped >30 days after order)."""
    orders = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < ts("1997-01-01 00:00:00"))
    )
    li = t(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == orders.o_orderkey) & (
        li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


_Q10_SQL = """
SELECT c_custkey, c_name,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(8,4)))), 4) AS DOUBLE) AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q10_returned_items", oracle=_Q10_SQL, tags=("join", "agg", "topk", "bench"))
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10: customers ranked by returned-item revenue. Fact-fact
    shuffle join on orderkey; customer and nation broadcast."""
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    orders = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < ts("1996-07-01 00:00:00"))
    )
    li = t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    revenue = dec("l_extendedprice") * (one() - dec("l_discount", RATE))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(revenue).cast("decimal(38,4)").cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


_Q14_SQL = """
SELECT
  100.0 * CAST(ROUND(SUM(CASE WHEN p_type = 'PROMO'
        THEN CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(8,4)))
        ELSE CAST(0 AS DECIMAL(18,4)) END), 4) AS DOUBLE)
  / CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(8,4)))), 4) AS DOUBLE)
  AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
"""


@register("q14_promo_effect", oracle=_Q14_SQL, tags=("join", "agg"))
def q14_promo_effect(spark, sf_dir):
    """TPC-H Q14: conditional-aggregation ratio (promo revenue share).
    part is broadcast; the CASE runs map-side inside the partial agg."""
    part = t(spark, sf_dir, "part")
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= ts("1996-09-01 00:00:00"))
        & (F.col("l_shipdate") < ts("1996-10-01 00:00:00"))
    )
    revenue = dec("l_extendedprice") * (one() - dec("l_discount", RATE))
    promo = F.when(F.col("p_type") == "PROMO", revenue).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("decimal(38,4)").cast("double")
                / F.sum(revenue).cast("decimal(38,4)").cast("double")
            ).alias("promo_revenue_pct")
        )
    )


_Q18_SQL = """
SELECT c_custkey, c_name, o_orderkey, o_totalprice,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 4) AS DOUBLE) AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 150
ORDER BY total_qty DESC, o_orderkey
LIMIT 20
"""


@register("q18_large_orders", oracle=_Q18_SQL, tags=("join", "agg", "having"))
def q18_large_orders(spark, sf_dir):
    """TPC-H Q18: group-HAVING on an aggregate (orders whose total
    quantity exceeds 150) then top-20."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    qty = F.sum(dec("l_quantity"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg(qty.cast("decimal(38,4)").cast("double").alias("total_qty"), qty.alias("_q"))
        .where(F.col("_q") > 150)
        .drop("_q")
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(20)
    )


_Q19_SQL = """
SELECT
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(8,4)))), 4) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 10)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 20)
   OR (p_type = 'PROMO' AND l_quantity < 5)
"""


@register("q19_discounted_revenue", oracle=_Q19_SQL, tags=("join", "agg"))
def q19_discounted_revenue(spark, sf_dir):
    """TPC-H Q19: disjunctive multi-table predicates (classic pushdown
    splitter: per-side conjuncts push to the scans, the residual OR
    evaluates post-join)."""
    part = t(spark, sf_dir, "part")
    li = t(spark, sf_dir, "lineitem")
    revenue = dec("l_extendedprice") * (one() - dec("l_discount", RATE))
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & (F.col("l_quantity") >= 10))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & (F.col("l_quantity") >= 20))
        | ((F.col("p_type") == "PROMO") & (F.col("l_quantity") < 5))
    )
    return joined.where(cond).agg(
        F.sum(revenue).cast("decimal(38,4)").cast("double").alias("revenue")
    )


_Q12_SQL = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN l_shipdate - o_orderdate <= INTERVAL 30 DAY THEN 1 ELSE 0 END) AS BIGINT) AS on_time,
       CAST(SUM(CASE WHEN l_shipdate - o_orderdate >  INTERVAL 30 DAY THEN 1 ELSE 0 END) AS BIGINT) AS late
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("q12_shipping_latency", oracle=_Q12_SQL, tags=("join", "agg"))
def q12_shipping_latency(spark, sf_dir):
    """TPC-H Q12 analogue: on-time vs late line counts per priority
    (conditional counting over a fact-fact join)."""
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < ts("1997-01-01 00:00:00"))
    )
    # fixture dates are TIMESTAMP_NTZ; cast to TIMESTAMP (identity under
    # the UTC session) for unix_micros
    lateness = F.unix_micros(F.col("l_shipdate").cast("timestamp")) - F.unix_micros(
        F.col("o_orderdate").cast("timestamp")
    )
    thirty_days = 30 * 24 * 3600 * 1_000_000
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(lateness <= thirty_days, 1).otherwise(0)).alias("on_time"),
            F.sum(F.when(lateness > thirty_days, 1).otherwise(0)).alias("late"),
        )
        .orderBy("o_orderpriority")
    )


_MEDIAN_SQL = """
SELECT o_orderstatus,
       quantile_cont(o_totalprice, 0.5) AS median_price,
       quantile_cont(o_totalprice, [0.25, 0.75])[1] AS q1_price,
       quantile_cont(o_totalprice, [0.25, 0.75])[2] AS q3_price
FROM orders
GROUP BY o_orderstatus
"""


@register("agg_percentile_exact", oracle=_MEDIAN_SQL, tags=("agg",))
def agg_percentile_exact(spark, sf_dir):
    """Exact interpolated percentiles (both engines implement the same
    linear interpolation over sorted values, and the interpolation
    arithmetic runs on identical doubles)."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.percentile("o_totalprice", F.lit(0.5)).alias("median_price"),
            F.percentile("o_totalprice", F.lit(0.25)).alias("q1_price"),
            F.percentile("o_totalprice", F.lit(0.75)).alias("q3_price"),
        )
    )
