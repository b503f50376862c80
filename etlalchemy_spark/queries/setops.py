"""Set-operation coverage: UNION ALL / UNION / INTERSECT / EXCEPT (+ ALL).

SURVEY.md §2 Table B row "Set ops". UNION ALL is shuffle-free
concatenation; the distinct variants add one hash-dedup shuffle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etlalchemy_spark.registry import register
from etlalchemy_spark.queries._util import t

_UNION_ALL_SQL = """
SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer WHERE c_acctbal > 5000
UNION ALL
SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
"""


@register("setop_union_all", oracle=_UNION_ALL_SQL, tags=("setop",))
def setop_union_all(spark, sf_dir):
    """Bag union: duplicates preserved, no shuffle."""
    c = (
        t(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 5000)
        .select(F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side"))
    )
    s = t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side")
    )
    return c.unionByName(s)


_UNION_SQL = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
"""


@register("setop_union_distinct", oracle=_UNION_SQL, tags=("setop",))
def setop_union_distinct(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


_INTERSECT_SQL = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
"""


@register("setop_intersect", oracle=_INTERSECT_SQL, tags=("setop",))
def setop_intersect(spark, sf_dir):
    """Nations having both customers and suppliers (set semantics)."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


_EXCEPT_SQL = """
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
"""


@register("setop_except", oracle=_EXCEPT_SQL, tags=("setop",))
def setop_except(spark, sf_dir):
    """Nations with customers but no suppliers. ``subtract`` is Spark's
    set-semantics EXCEPT (``exceptAll`` would subtract multiplicities)."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


_EXCEPT_ALL_SQL = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT ALL
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
"""


@register("setop_except_all", oracle=_EXCEPT_ALL_SQL, tags=("setop",))
def setop_except_all(spark, sf_dir):
    """Multiset difference: multiplicities subtract (EXCEPT ALL)."""
    o = t(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    b = o.where(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return a.exceptAll(b)


_UNION_NAME_SQL = """
SELECT CAST(s_suppkey AS BIGINT) AS entity_id, 'supplier' AS kind,
       s_acctbal AS acctbal, CAST(NULL AS VARCHAR) AS segment
FROM supplier
UNION ALL
SELECT c_custkey, 'customer', c_acctbal, c_mktsegment
FROM customer
"""


@register("setop_union_by_name", oracle=_UNION_NAME_SQL, tags=("setops",))
def setop_union_by_name(spark, sf_dir):
    """Schema-aligned union of heterogeneous entity tables:
    unionByName(allowMissingColumns=True) matches columns by NAME and
    null-fills the gaps — the safe way to stack evolving extracts,
    where positional unionAll would silently pair mismatched columns.
    Narrow map-side op, no shuffle."""
    sup = t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_id"),
        F.lit("supplier").alias("kind"),
        F.col("s_acctbal").alias("acctbal"),
    )
    cust = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_id"),
        F.lit("customer").alias("kind"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("segment"),
    )
    return sup.unionByName(cust, allowMissingColumns=True)
