"""TPC-H analogues 7/8/9/13/15/16/17/20/21/22 adapted to the fixture
schema (no partsupp table, no l_commitdate/l_receiptdate — see
FIXTURES.md), completing 22/22 TPC-H-shaped coverage together with
``tpch.py`` / ``tpch_more.py``.

Adaptations: Q9 uses ``0.5 * p_retailprice * l_quantity`` as the supply
cost proxy (no ps_supplycost); Q16/Q20 derive part→supplier pairs from
lineitem (no partsupp); Q21 defines "late" as shipped >60 days after the
order date (no receipt/commit dates); Q22 keys the country code as
``c_nationkey % 5`` (no phone column) and "idle" = no orders since 1998.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etlalchemy_spark.registry import register
from etlalchemy_spark.queries._util import OUT, RATE, dec, dsum, fsum, one, t, ts

_REV = "CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(8,4)))"


def _rev():
    return dec("l_extendedprice") * (one() - dec("l_discount", RATE))


_Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(ROUND(SUM(volume), 4) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(year FROM l_shipdate) AS l_year,
         {_REV} AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@register("q7_volume_shipping", oracle=_Q7_SQL, tags=("join", "agg"))
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7: bilateral trade volume between two nations by year.
    Five-way join; both nation dims broadcast, the OR-pair predicate
    evaluates after the broadcast joins (cheap, row-local)."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    sup = t(spark, sf_dir, "supplier")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("l_year"))
        .agg(fsum(_rev(), "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_Q8_SQL = f"""
SELECT o_year,
       CAST(ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                           ELSE CAST(0 AS DECIMAL(18,4)) END), 4) AS DOUBLE)
       / CAST(ROUND(SUM(volume), 4) AS DOUBLE) AS mkt_share
FROM (
  SELECT EXTRACT(year FROM o_orderdate) AS o_year,
         {_REV} AS volume,
         n2.n_name AS supp_nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""


@register("q8_market_share", oracle=_Q8_SQL, tags=("join", "agg"))
def q8_market_share(spark, sf_dir):
    """TPC-H Q8: one nation's market share of STANDARD-part revenue in
    ASIA, by order year. Eight-way star join — every dim broadcast, one
    shuffle total (lineitem⋈orders) then a tiny agg."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    sup = t(spark, sf_dir, "supplier")
    part = t(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD")
    region = t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    volume = _rev()
    nation_volume = F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            (
                F.sum(nation_volume).cast(OUT).cast("double")
                / F.sum(volume).cast(OUT).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


_Q9_SQL = f"""
SELECT nation, o_year,
       CAST(ROUND(SUM({_REV}), 4) AS DOUBLE)
       - CAST(ROUND(SUM(CAST(0.5 AS DECIMAL(2,1))
             * CAST(p_retailprice AS DECIMAL(12,2))
             * CAST(l_quantity AS DECIMAL(12,2))), 4) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
         l_extendedprice, l_discount, l_quantity, p_retailprice
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


@register("q9_product_profit", oracle=_Q9_SQL, tags=("join", "agg", "bench"))
def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 analogue: profit on red parts by supplier nation and
    year. Supply cost proxied as 0.5·retailprice·quantity (fixture has
    no partsupp — FIXTURES.md). Revenue and cost reduced as separate
    exact-decimal sums, subtracted in double."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    sup = t(spark, sf_dir, "supplier")
    part = t(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    nation = t(spark, sf_dir, "nation")
    cost = (
        F.lit(0.5).cast("decimal(2,1)")
        * F.col("p_retailprice").cast("decimal(12,2)")
        * F.col("l_quantity").cast("decimal(12,2)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(
            (
                F.sum(_rev()).cast(OUT).cast("double")
                - F.sum(cost).cast(OUT).cast("double")
            ).alias("sum_profit")
        )
        .orderBy("nation", F.desc("o_year"))
    )


_Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register("q13_customer_distribution", oracle=_Q13_SQL, tags=("join", "agg"))
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13: distribution of order counts per customer, with a
    join-side filter inside the outer-join condition (NOT a post-join
    WHERE — retains zero-order customers). Two-level aggregation."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "5-LOW")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


_Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(ROUND(SUM({_REV}), 4) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


@register("q15_top_supplier", oracle=_Q15_SQL, tags=("join", "agg", "topk"))
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15: supplier(s) with max quarterly revenue. The revenue
    CTE materializes once (supplier-count rows — tiny); the MAX scalar
    joins back as a broadcast single row, so equality on the identically
    computed double is exact."""
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < ts("1996-04-01 00:00:00"))
    )
    sup = t(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        fsum(_rev(), "total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        sup.join(revenue, sup.s_suppkey == revenue.supplier_no)
        .join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


_Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM part
JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@register("q16_supplier_cnt", oracle=_Q16_SQL, tags=("join", "agg"))
def q16_supplier_cnt(spark, sf_dir):
    """TPC-H Q16 analogue: distinct suppliers per part attribute class,
    excluding negative-balance suppliers (stand-in for the complaints
    NOT IN). Part→supplier pairs derive from lineitem (no partsupp).
    NOT IN on a non-nullable key → broadcast anti-join."""
    part = t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    bad_sup = t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    li = t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(bad_sup), li.l_suppkey == bad_sup.s_suppkey, "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


_Q17_SQL = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 4) AS DOUBLE) / 7.0
       AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN (
  SELECT l_partkey AS avg_pk,
         CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 4) AS DOUBLE)
         / CAST(COUNT(l_quantity) AS DOUBLE) AS avg_qty
  FROM lineitem
  GROUP BY l_partkey
) part_avg ON avg_pk = l_partkey
WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
  AND l_quantity < 0.2 * avg_qty
"""


@register("q17_small_qty_revenue", oracle=_Q17_SQL, tags=("join", "agg"))
def q17_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17: revenue from orders far below a part's average
    quantity. The correlated AVG subquery is decorrelated into a
    per-part aggregate joined back (what Catalyst would do anyway,
    written explicitly so the exact-decimal average is shared with the
    oracle). lineitem scans twice — at 100 TB that beats caching."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
    )
    part_avg = li.groupBy(F.col("l_partkey").alias("avg_pk")).agg(
        (
            F.sum(dec("l_quantity")).cast(OUT).cast("double")
            / F.count("l_quantity").cast("double")
        ).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(part_avg, F.col("l_partkey") == F.col("avg_pk"))
        .where(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            (F.sum(dec("l_extendedprice")).cast(OUT).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


_Q20_SQL = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'PROMO'
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_suppkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 100
)
ORDER BY s_suppkey
"""


@register("q20_promo_suppliers", oracle=_Q20_SQL, tags=("join", "agg", "having"))
def q20_promo_suppliers(spark, sf_dir):
    """TPC-H Q20 analogue: suppliers who moved >100 units of PROMO
    parts in 1996 (excess-stock stand-in; no partsupp availqty). IN
    (grouped subquery) → aggregate then left-semi join."""
    part = t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < ts("1997-01-01 00:00:00"))
    )
    heavy = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(dec("l_quantity")).alias("q"))
        .where(F.col("q") > 100)
        .select("l_suppkey")
    )
    sup = t(spark, sf_dir, "supplier")
    return (
        sup.join(heavy, sup.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


_Q21_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM (
  SELECT l_orderkey AS ok, l_suppkey AS sk,
         MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END) AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY l_orderkey, l_suppkey
) per_os
JOIN (
  SELECT ok AS ok2, COUNT(*) AS n_supp, SUM(is_late) AS n_late
  FROM (
    SELECT l_orderkey AS ok, l_suppkey,
           MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END) AS is_late
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY l_orderkey, l_suppkey
  ) GROUP BY ok
) per_o ON ok = ok2
JOIN supplier ON s_suppkey = sk
WHERE is_late = 1 AND n_supp > 1 AND n_late = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
"""


@register("q21_waiting_supplier", oracle=_Q21_SQL, tags=("join", "agg", "bench"))
def q21_waiting_supplier(spark, sf_dir):
    """TPC-H Q21 analogue: suppliers who were the SOLE late supplier
    (shipped >60 days after order date — fixture has no receipt/commit
    dates) on a multi-supplier order. The EXISTS/NOT-EXISTS pair is
    decorrelated into one per-(order,supplier) lateness aggregate; the
    per-order totals come from a window over that aggregate (NOT a
    self-join, which would scan and shuffle the fact join twice)."""
    from pyspark.sql import Window

    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    sup = t(spark, sf_dir, "supplier")
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"), 1
    ).otherwise(0)
    per_os = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk"))
        .agg(F.max(late).alias("is_late"))
    )
    w = Window.partitionBy("ok")
    return (
        per_os.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("n_late", F.sum("is_late").over(w))
        .where((F.col("is_late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(sup), F.col("sk") == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


_Q22_SQL = """
SELECT cntrycode, COUNT(*) AS numcust,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 4) AS DOUBLE) AS totacctbal
FROM (
  SELECT CAST(c_nationkey % 5 AS BIGINT) AS cntrycode, c_acctbal, c_custkey
  FROM customer
  WHERE c_acctbal > (
    SELECT CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 4) AS DOUBLE)
           / CAST(COUNT(c_acctbal) AS DOUBLE)
    FROM customer WHERE c_acctbal > 0
  )
) rich
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey
    AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
)
GROUP BY cntrycode
ORDER BY cntrycode
"""


@register("q22_global_sales_opportunity", oracle=_Q22_SQL, tags=("join", "agg"))
def q22_global_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 analogue: above-average-balance customers with no
    recent (1998+) orders, bucketed by country code (c_nationkey % 5 —
    fixture has no phone). Scalar AVG broadcast as a 1-row cross join;
    NOT EXISTS → left-anti join against the filtered orders."""
    cust = t(spark, sf_dir, "customer")
    avg_bal = (
        cust.where(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(dec("c_acctbal")).cast(OUT).cast("double")
                / F.count("c_acctbal").cast("double")
            ).alias("avg_bal")
        )
    )
    recent = t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= ts("1998-01-01 00:00:00")
    ).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(F.broadcast(recent), F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy((F.col("c_nationkey") % 5).cast("bigint").alias("cntrycode"))
        .agg(F.count(F.lit(1)).alias("numcust"), dsum("c_acctbal", "totacctbal"))
        .orderBy("cntrycode")
    )


_Q2_SQL = """
SELECT s_suppkey, s_name, p_partkey, p_brand, unit_price
FROM (
  SELECT l_suppkey AS s2, l_partkey AS p2,
         MIN(l_extendedprice / l_quantity) AS unit_price
  FROM lineitem
  GROUP BY l_suppkey, l_partkey
) offer
JOIN (
  SELECT l_partkey AS p3,
         MIN(l_extendedprice / l_quantity) AS best_price
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY l_partkey
) best ON p2 = p3 AND unit_price = best_price
JOIN part     ON p_partkey = p2
JOIN supplier ON s_suppkey = s2
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE' AND p_size <= 10
ORDER BY s_suppkey, p_partkey
"""


@register("q2_min_cost_supplier", oracle=_Q2_SQL, tags=("join", "agg"))
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 analogue: the EUROPE supplier(s) offering each small
    part at its region-wide minimum unit price (observed
    extendedprice/quantity stands in for ps_supplycost — no partsupp).
    The correlated MIN subquery decorrelates into a per-part aggregate
    joined back on (partkey, price); MIN of an exact decimal ratio is
    order-insensitive, so the double equality join is cross-engine
    exact."""
    li = t(spark, sf_dir, "lineitem")
    sup = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    part = t(spark, sf_dir, "part").where(F.col("p_size") <= 10)
    # pure-double division: correctly rounded IEEE 754 in both engines
    # on identical operands, and MIN is order-insensitive — exact without
    # decimals (decimal DIVISION is NOT cross-engine-exact: the engines
    # pick different quotient scales and round differently)
    unit = F.col("l_extendedprice") / F.col("l_quantity")
    eu_sup = (
        sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name")
    )
    eu_li = li.join(
        F.broadcast(eu_sup.select(F.col("s_suppkey").alias("eu_sk"))),
        li.l_suppkey == F.col("eu_sk"),
        "left_semi",
    )
    offer = eu_li.groupBy(
        F.col("l_suppkey").alias("s2"), F.col("l_partkey").alias("p2")
    ).agg(F.min(unit).alias("unit_price"))
    best = eu_li.groupBy(F.col("l_partkey").alias("p3")).agg(
        F.min(unit).alias("best_price")
    )
    return (
        offer.join(best, (F.col("p2") == F.col("p3")) & (F.col("unit_price") == F.col("best_price")))
        .join(F.broadcast(part), F.col("p2") == part.p_partkey)
        .join(F.broadcast(eu_sup), F.col("s2") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "p_partkey", "p_brand", "unit_price")
        .orderBy("s_suppkey", "p_partkey")
    )


_Q11_SQL = """
SELECT l_partkey AS partkey,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 4) AS DOUBLE) AS value
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
WHERE s_nationkey = 0
GROUP BY l_partkey
HAVING SUM(CAST(l_extendedprice AS DECIMAL(18,4))) > (
  SELECT SUM(CAST(l_extendedprice AS DECIMAL(18,4))) * 0.001
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE s_nationkey = 0
)
ORDER BY value DESC, partkey
"""


@register("q11_important_stock", oracle=_Q11_SQL, tags=("join", "agg", "having"))
def q11_important_stock(spark, sf_dir):
    """TPC-H Q11 analogue: parts whose shipped value from NATION_0
    suppliers exceeds 0.1% of that nation's total (lineitem value
    stands in for ps_supplycost*ps_availqty — no partsupp). The scalar
    threshold is a 1-row broadcast; the HAVING comparison runs in exact
    decimal on both engines (no double drift at the cut line)."""
    li = t(spark, sf_dir, "lineitem")
    nat_sup = (
        t(spark, sf_dir, "supplier")
        .where(F.col("s_nationkey") == 0)
        .select(F.col("s_suppkey").alias("nat_sk"))
    )
    nat_li = li.join(F.broadcast(nat_sup), li.l_suppkey == F.col("nat_sk"), "left_semi")
    per_part = nat_li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum(dec("l_extendedprice")).alias("_v")
    )
    threshold = nat_li.agg(
        (F.sum(dec("l_extendedprice")) * F.lit(0.001).cast("decimal(4,3)")).alias("thresh")
    )
    return (
        per_part.crossJoin(F.broadcast(threshold))
        .where(F.col("_v") > F.col("thresh"))
        .select("partkey", F.col("_v").cast(OUT).cast("double").alias("value"))
        .orderBy(F.desc("value"), "partkey")
    )
