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
from etlalchemy_spark.queries._util import t, ts

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
),
raw AS (
  SELECT ne,
         (((CAST({_HLL_ALPHA!r} AS DOUBLE) * 256.0) * 256.0) * 9007199254740992.0)
         / CAST(s_ne + (256 - ne) * (CAST(1 AS BIGINT) << 53) AS DOUBLE) AS r
  FROM agg
)
SELECT CASE WHEN r <= 640.0 AND (256 - ne) > 0
            THEN 256.0 * ln(256.0 / CAST(256 - ne AS DOUBLE))
            ELSE r END AS estimate
FROM raw
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


# --- portable Count-Min sketch (oracle-exact; operators/sketch.py) ----------

from etlalchemy_spark.operators.dedup import MINHASH_P, minhash_params
from etlalchemy_spark.operators.sketch import CMS_DEPTH, CMS_SEED, CMS_WIDTH

_CMS_PARAMS_SQL = ", ".join(
    f"({j}, {a}, {b})" for j, (a, b) in enumerate(minhash_params(CMS_DEPTH, CMS_SEED))
)

_CMS_REG_CTES = f"""
WITH uu AS (
  SELECT md5_number_upper(CAST(o_custkey AS VARCHAR)) AS u FROM orders
), hh AS (
  SELECT ({_BE60_FROM_U}) % {MINHASH_P} AS hm FROM uu
), p(r, a, b) AS (VALUES {_CMS_PARAMS_SQL}),
cells AS (
  SELECT p.r AS r, ((p.a * hh.hm + p.b) % {MINHASH_P}) % {CMS_WIDTH} AS c
  FROM hh CROSS JOIN p
), reg AS (
  SELECT r, c, COUNT(*) AS cnt FROM cells GROUP BY r, c
)"""

_CMS_REG_SQL = _CMS_REG_CTES + "\nSELECT r, c, cnt FROM reg\n"

_CMS_HH_SQL = f"""{_CMS_REG_CTES}
, exact AS (
  SELECT o_custkey, COUNT(*) AS exact_cnt FROM orders GROUP BY o_custkey
), top AS (
  SELECT o_custkey, exact_cnt FROM exact ORDER BY exact_cnt DESC, o_custkey LIMIT 20
), kh AS (
  SELECT o_custkey,
         ({_BE60_FROM_U.replace('u >>', 'ku >>')}) % {MINHASH_P} AS hm
  FROM (SELECT o_custkey, md5_number_upper(CAST(o_custkey AS VARCHAR)) AS ku FROM top)
), kcells AS (
  SELECT kh.o_custkey, p.r AS r,
         ((p.a * kh.hm + p.b) % {MINHASH_P}) % {CMS_WIDTH} AS c
  FROM kh CROSS JOIN p
), est AS (
  SELECT kcells.o_custkey, MIN(COALESCE(reg.cnt, 0)) AS cms_est
  FROM kcells LEFT JOIN reg ON kcells.r = reg.r AND kcells.c = reg.c
  GROUP BY kcells.o_custkey
)
SELECT top.o_custkey, top.exact_cnt, est.cms_est
FROM top JOIN est USING (o_custkey)
"""


@register("sketch_cms_registers", oracle=_CMS_REG_SQL, tags=("sketch", "bench"))
def sketch_cms_registers(spark, sf_dir):
    """Count-Min counter table over orders.o_custkey — fixed
    depth*width integer state, mergeable by cell-wise SUM, hash-exact
    across engines (portable mod-p universal hashing)."""
    from etlalchemy_spark.operators.sketch import cms_registers

    # fanout: the build is map-compute-bound (4 md5 hashes/row) and the
    # fixture parquet is one row group -> one task without it
    o = t(spark, sf_dir, "orders", fanout=True)
    return cms_registers(o, F.col("o_custkey"))


@register("sketch_cms_heavy_hitters", oracle=_CMS_HH_SQL, tags=("sketch",))
def sketch_cms_heavy_hitters(spark, sf_dir):
    """Heavy hitters read back from the Count-Min sketch: the top-20
    customers by true order count (deterministic tie-break on key),
    with exact count and the sketch's >= estimate side by side. The
    probe broadcasts the <= depth*width counter table — estimating any
    candidate set never reshuffles the data."""
    from etlalchemy_spark.operators.sketch import cms_estimate, cms_registers

    o = t(spark, sf_dir, "orders")
    reg = cms_registers(o, F.col("o_custkey"))
    exact = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("exact_cnt"))
    top = exact.orderBy(F.desc("exact_cnt"), "o_custkey").limit(20)
    est = cms_estimate(reg, top, "o_custkey")
    return top.join(est, "o_custkey").select("o_custkey", "exact_cnt", "cms_est")


# --- exact bitmap distinct (oracle = plain COUNT(DISTINCT)) -----------------

_BITMAP_BUCKETS_SQL = """
SELECT CAST(o_custkey // 64 AS BIGINT) AS bucket,
       COUNT(DISTINCT o_custkey) AS n_in_bucket
FROM orders GROUP BY 1
"""

_BITMAP_TOTAL_SQL = "SELECT COUNT(DISTINCT o_custkey) AS n_distinct FROM orders"


@register("sketch_bitmap_distinct_buckets", oracle=_BITMAP_BUCKETS_SQL, tags=("sketch",))
def sketch_bitmap_distinct_buckets(spark, sf_dir):
    """Exact distinct custkeys per 64-key bucket from ONE bit_or
    aggregate — the mergeable bitmap state (words OR across
    partitions/days), oracle-checked against plain COUNT(DISTINCT)
    semantics."""
    from etlalchemy_spark.operators.sketch import bitmap_buckets

    o = t(spark, sf_dir, "orders")
    return bitmap_buckets(o, F.col("o_custkey"))


@register("sketch_bitmap_distinct_total", oracle=_BITMAP_TOTAL_SQL, tags=("sketch", "bench"))
def sketch_bitmap_distinct_total(spark, sf_dir):
    """Exact global COUNT(DISTINCT o_custkey) computed as the sum of
    bitmap popcounts — distinct-count without expanding or sorting the
    keys, in keyspace/8 bits of state."""
    from etlalchemy_spark.operators.sketch import bitmap_distinct_count

    o = t(spark, sf_dir, "orders")
    return bitmap_distinct_count(o, F.col("o_custkey"))


# --- portable histogram quantiles (oracle-exact) ----------------------------

_HQ_LO, _HQ_WIDTH, _HQ_NBINS = 0.0, 100.0, 1200
_HQ_QS = [("p50", 50, 100), ("p90", 90, 100), ("p99", 99, 100)]
_HQ_QS_SQL = ", ".join(f"('{l}', {n}, {d})" for l, n, d in _HQ_QS)

_HIST_QUANTILE_SQL = f"""
WITH b AS (
  SELECT GREATEST(0, LEAST({_HQ_NBINS - 1}, CAST(FLOOR(
    (l_extendedprice - CAST({_HQ_LO} AS DOUBLE)) / CAST({_HQ_WIDTH} AS DOUBLE)
  ) AS BIGINT))) AS bin
  FROM lineitem
), bins AS (
  SELECT bin, COUNT(*) AS cnt FROM b GROUP BY bin
), cum AS (
  SELECT bin, cnt,
         SUM(cnt) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM bins
), tot AS (SELECT SUM(cnt) AS n FROM bins),
qv(q, num, den) AS (VALUES {_HQ_QS_SQL}),
k AS (
  SELECT qv.q, (qv.num * tot.n + qv.den - 1) // qv.den AS k
  FROM qv CROSS JOIN tot
)
SELECT k.q,
       CAST({_HQ_LO} AS DOUBLE) + (
         (CAST(cum.bin AS DOUBLE)
          + (CAST(k.k - (cum.cum - cum.cnt) AS DOUBLE) / CAST(cum.cnt AS DOUBLE)))
         * CAST({_HQ_WIDTH} AS DOUBLE)
       ) AS estimate
FROM k JOIN cum ON cum.cum >= k.k AND (cum.cum - cum.cnt) < k.k
ORDER BY k.q
"""


@register("sketch_quantile_histogram", oracle=_HIST_QUANTILE_SQL, tags=("sketch", "bench"))
def sketch_quantile_histogram(spark, sf_dir):
    """p50/p90/p99 of l_extendedprice from a 1200-bin fixed-width
    histogram — the mergeable quantile state (per-bin SUMs). Rank
    selection is pure integer arithmetic and the interpolation is one
    fixed float chain, so even the ESTIMATES hash-match the oracle —
    unlike approx_percentile's engine-internal sketch."""
    from etlalchemy_spark.operators.sketch import hist_bins, hist_quantiles

    li = t(spark, sf_dir, "lineitem")
    bins = hist_bins(li, F.col("l_extendedprice"), _HQ_LO, _HQ_WIDTH, _HQ_NBINS)
    return hist_quantiles(bins, _HQ_LO, _HQ_WIDTH, _HQ_QS)


_HLL_ERR_SQL = f"""{_HLL_REG_CTES}
, agg AS (
  SELECT SUM(CAST(1 AS BIGINT) << (53 - register)) AS s_ne, COUNT(*) AS ne FROM reg
),
raw AS (
  SELECT ne,
         (((CAST({_HLL_ALPHA!r} AS DOUBLE) * 256.0) * 256.0) * 9007199254740992.0)
         / CAST(s_ne + (256 - ne) * (CAST(1 AS BIGINT) << 53) AS DOUBLE) AS r
  FROM agg
),
est AS (
  SELECT CASE WHEN r <= 640.0 AND (256 - ne) > 0
              THEN 256.0 * ln(256.0 / CAST(256 - ne AS DOUBLE))
              ELSE r END AS estimate
  FROM raw
),
ex AS (SELECT COUNT(DISTINCT o_custkey) AS exact_n FROM orders)
SELECT estimate, exact_n,
       (estimate - CAST(exact_n AS DOUBLE)) / CAST(exact_n AS DOUBLE) AS rel_error
FROM est, ex
"""


_HLL_GROUPED_SQL = f"""
WITH uu AS (
  SELECT o_orderpriority,
         md5_number_upper(CAST(o_custkey AS VARCHAR)) AS u
  FROM orders
), hh AS (
  SELECT o_orderpriority, {_BE60_FROM_U} AS h FROM uu
), r AS (
  SELECT o_orderpriority, h % 256 AS bucket,
         CASE WHEN (h >> 8) = 0 THEN 53
              ELSE 53 - CAST(length(bin(h >> 8)) AS INTEGER) END AS rho
  FROM hh
), reg AS (
  SELECT o_orderpriority, bucket, MAX(rho) AS register
  FROM r GROUP BY o_orderpriority, bucket
), agg AS (
  SELECT o_orderpriority,
         SUM(CAST(1 AS BIGINT) << (53 - register)) AS s_ne, COUNT(*) AS ne
  FROM reg GROUP BY o_orderpriority
), raw AS (
  SELECT o_orderpriority, ne,
         (((CAST({_HLL_ALPHA!r} AS DOUBLE) * 256.0) * 256.0) * 9007199254740992.0)
         / CAST(s_ne + (256 - ne) * (CAST(1 AS BIGINT) << 53) AS DOUBLE) AS r
  FROM agg
), est AS (
  SELECT o_orderpriority,
         CASE WHEN r <= 640.0 AND (256 - ne) > 0
              THEN 256.0 * ln(256.0 / CAST(256 - ne AS DOUBLE))
              ELSE r END AS estimate
  FROM raw
), exact AS (
  SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS exact_customers
  FROM orders GROUP BY o_orderpriority
)
SELECT est.o_orderpriority, est.estimate, exact.exact_customers
FROM est JOIN exact USING (o_orderpriority)
"""


@register("sketch_hll_grouped_estimate", oracle=_HLL_GROUPED_SQL, tags=("sketch", "agg"))
def sketch_hll_grouped_estimate(spark, sf_dir):
    """Distinct customers PER PRIORITY from per-group portable HLL
    sketches — the oracle-exact twin of the rows-only DataSketches
    query `sketch_hll_distinct_customers`: same rollup shape, but the
    sketch state is plain (group, bucket, max-rho) integers, so even
    the per-group ESTIMATES hash-match DuckDB. This is the
    re-aggregatable distinct-count table a 100 TB pipeline persists:
    one 256-int register set per group per day, mergeable by
    per-(group, bucket) MAX to answer any coarser grain or window
    without rescanning; estimate cost is one aggregate over the
    register table. Exact counts ride along as the error audit."""
    from etlalchemy_spark.operators.sketch import (
        hll_estimate_grouped,
        hll_registers_grouped,
    )

    o = t(spark, sf_dir, "orders")
    reg = hll_registers_grouped(o, ["o_orderpriority"], F.col("o_custkey"))
    est = hll_estimate_grouped(reg, ["o_orderpriority"])
    exact = o.groupBy("o_orderpriority").agg(
        F.count_distinct("o_custkey").alias("exact_customers")
    )
    return est.join(exact, "o_orderpriority")


_CMS_JOIN_SIZE_SQL = f"""
WITH p(r, a, b) AS (VALUES {_CMS_PARAMS_SQL}),
ua AS (
  SELECT md5_number_upper(CAST(o_custkey AS VARCHAR)) AS u FROM orders
), ha AS (
  SELECT ({_BE60_FROM_U}) % {MINHASH_P} AS hm FROM ua
), rega AS (
  SELECT p.r AS r, ((p.a * ha.hm + p.b) % {MINHASH_P}) % {CMS_WIDTH} AS c, COUNT(*) AS cnt
  FROM ha CROSS JOIN p GROUP BY 1, 2
), ub AS (
  SELECT md5_number_upper(CAST(c_custkey AS VARCHAR)) AS u FROM customer
  WHERE c_acctbal > 0
), hb AS (
  SELECT ({_BE60_FROM_U}) % {MINHASH_P} AS hm FROM ub
), regb AS (
  SELECT p.r AS r, ((p.a * hb.hm + p.b) % {MINHASH_P}) % {CMS_WIDTH} AS c, COUNT(*) AS cnt
  FROM hb CROSS JOIN p GROUP BY 1, 2
), ip AS (
  SELECT rega.r,
         SUM(CAST(rega.cnt AS HUGEINT) * CAST(COALESCE(regb.cnt, 0) AS HUGEINT)) AS ipr
  FROM rega LEFT JOIN regb ON rega.r = regb.r AND rega.c = regb.c
  GROUP BY rega.r
), est AS (
  SELECT CAST(MIN(ipr) AS DOUBLE) AS join_size_est FROM ip
), exact AS (
  SELECT CAST(SUM(oa.n * cb.n) AS BIGINT) AS join_size_exact
  FROM (SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY 1) oa
  JOIN (SELECT c_custkey, COUNT(*) AS n FROM customer WHERE c_acctbal > 0 GROUP BY 1) cb
    ON oa.o_custkey = cb.c_custkey
)
SELECT join_size_est, join_size_exact,
       join_size_est / CAST(join_size_exact AS DOUBLE) AS overestimate_ratio
FROM est, exact
"""


@register("sketch_cms_join_size", oracle=_CMS_JOIN_SIZE_SQL, tags=("sketch",))
def sketch_cms_join_size(spark, sf_dir):
    """Join-cardinality estimate from two Count-Min sketches (AMS
    inner product, min over depth rows) next to the true join size —
    the planner question "how big is orders JOIN customer going to
    be?" answered WITHOUT joining the tables. Each side builds its
    fixed <= depth*width counter table in one scan (map-side partial
    combine); the estimate is a broadcast-sized join of aggregates.
    The true size is itself computed scalably: per-key count
    aggregates joined and product-summed — never materializing the
    join. Every term is integer (HUGEINT/DECIMAL(38,0) products), so
    the estimate, the exact size, and even their float ratio
    hash-match the oracle."""
    from etlalchemy_spark.operators.sketch import cms_join_size, cms_registers

    o = t(spark, sf_dir, "orders", fanout=True)
    c = t(spark, sf_dir, "customer").where(F.col("c_acctbal") > 0)
    reg_a = cms_registers(o, F.col("o_custkey"))
    reg_b = cms_registers(c, F.col("c_custkey"))
    est = cms_join_size(reg_a, reg_b)

    oa = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("_na"))
    cb = c.groupBy("c_custkey").agg(F.count(F.lit(1)).alias("_nb"))
    exact = (
        oa.join(cb, oa.o_custkey == cb.c_custkey)
        .agg(F.sum(F.col("_na") * F.col("_nb")).cast("bigint").alias("join_size_exact"))
    )
    return est.crossJoin(exact).select(
        "join_size_est",
        "join_size_exact",
        (F.col("join_size_est") / F.col("join_size_exact").cast("double")).alias(
            "overestimate_ratio"
        ),
    )


def _hll_est_ctes(tag: str, key_sql: str, rel_sql: str) -> str:
    """DuckDB CTE chain computing the portable-HLL register table
    ``reg_{tag}`` for ``key_sql`` over ``rel_sql`` — the SQL twin of
    operators/sketch.hll_registers, shared by the intersection oracle
    below (same shape as _HLL_REG_CTES, parameterized)."""
    return f"""u_{tag} AS (
  SELECT md5_number_upper(CAST({key_sql} AS VARCHAR)) AS u FROM {rel_sql}
), h_{tag} AS (
  SELECT {_BE60_FROM_U} AS h FROM u_{tag}
), r_{tag} AS (
  SELECT h % 256 AS bucket,
         CASE WHEN (h >> 8) = 0 THEN 53
              ELSE 53 - CAST(length(bin(h >> 8)) AS INTEGER) END AS rho
  FROM h_{tag}
), reg_{tag} AS (
  SELECT bucket, MAX(rho) AS register FROM r_{tag} GROUP BY bucket
)"""


def _hll_est_select(reg: str) -> str:
    """Scalar-subquery estimate over register CTE ``reg`` — the SQL
    twin of operators/sketch.hll_estimate (raw harmonic + linear
    counting small-range switch)."""
    return f"""(
  SELECT CASE WHEN r <= 640.0 AND (256 - ne) > 0
              THEN 256.0 * ln(256.0 / CAST(256 - ne AS DOUBLE))
              ELSE r END
  FROM (
    SELECT ne,
           (((CAST({_HLL_ALPHA!r} AS DOUBLE) * 256.0) * 256.0) * 9007199254740992.0)
           / CAST(s_ne + (256 - ne) * (CAST(1 AS BIGINT) << 53) AS DOUBLE) AS r
    FROM (
      SELECT SUM(CAST(1 AS BIGINT) << (53 - register)) AS s_ne, COUNT(*) AS ne
      FROM {reg}
    )
  )
)"""


_HLL_A_REL = "orders WHERE o_orderdate < TIMESTAMP '1995-07-01 00:00:00'"
_HLL_B_REL = "orders WHERE o_orderdate >= TIMESTAMP '1995-07-01 00:00:00'"

_HLL_INTERSECT_SQL = f"""
WITH {_hll_est_ctes("a", "o_custkey", _HLL_A_REL)},
{_hll_est_ctes("b", "o_custkey", _HLL_B_REL)},
reg_u AS (
  SELECT bucket, MAX(register) AS register
  FROM (SELECT * FROM reg_a UNION ALL SELECT * FROM reg_b) GROUP BY bucket
),
est AS (
  SELECT {_hll_est_select("reg_a")} AS est_a,
         {_hll_est_select("reg_b")} AS est_b,
         {_hll_est_select("reg_u")} AS est_union
),
exact AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS exact_intersection FROM (
    SELECT o_custkey FROM {_HLL_A_REL}
    INTERSECT
    SELECT o_custkey FROM {_HLL_B_REL}
  )
)
SELECT est_a, est_b, est_union,
       (est_a + est_b) - est_union AS est_intersection,
       exact_intersection
FROM est, exact
"""


@register("sketch_hll_intersection", oracle=_HLL_INTERSECT_SQL, tags=("sketch",))
def sketch_hll_intersection(spark, sf_dir):
    """Set-overlap estimate by inclusion-exclusion over portable HLL
    sketches: customers active in BOTH halves of the order history,
    estimated as est(A) + est(B) - est(A UNION B) — where the union
    sketch is a per-bucket MAX merge of the two register tables, never
    a rescan. This is the audience-overlap / cross-shard-dedup
    question a 100 TB pipeline answers from per-day sketch state: N
    daily register tables (256 ints each) give any window's overlap in
    milliseconds. The exact intersection rides along for the error
    audit. Every estimate is the integer-harmonic formula, so all five
    columns hash-match the oracle bit-for-bit."""
    from etlalchemy_spark.operators.sketch import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    o = t(spark, sf_dir, "orders")
    cut = ts("1995-07-01 00:00:00")
    a = o.where(F.col("o_orderdate") < cut)
    b = o.where(F.col("o_orderdate") >= cut)
    reg_a = hll_registers(a, F.col("o_custkey"))
    reg_b = hll_registers(b, F.col("o_custkey"))
    est_a = hll_estimate(reg_a).select(F.col("estimate").alias("est_a"))
    est_b = hll_estimate(reg_b).select(F.col("estimate").alias("est_b"))
    est_u = hll_estimate(hll_merge(reg_a, reg_b)).select(
        F.col("estimate").alias("est_union")
    )
    exact = (
        a.select("o_custkey")
        .intersect(b.select("o_custkey"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_intersection"))
    )
    return (
        est_a.crossJoin(est_b)
        .crossJoin(est_u)
        .crossJoin(exact)
        .select(
            "est_a",
            "est_b",
            "est_union",
            ((F.col("est_a") + F.col("est_b")) - F.col("est_union")).alias(
                "est_intersection"
            ),
            "exact_intersection",
        )
    )


@register("sketch_hll_error_report", oracle=_HLL_ERR_SQL, tags=("sketch",))
def sketch_hll_error_report(spark, sf_dir):
    """Sketch accuracy audit: the portable-HLL estimate next to the
    exact distinct count with signed relative error — the number a
    pipeline owner checks before trusting the sketch at 100 TB (where
    the exact count becomes the expensive side and this report runs on
    a sample). Every term, including the error, hash-matches the
    oracle: the estimate is an exact integer-harmonic formula and the
    division is one IEEE op."""
    from etlalchemy_spark.operators.sketch import hll_estimate, hll_registers

    o = t(spark, sf_dir, "orders")
    est = hll_estimate(hll_registers(o, F.col("o_custkey")))
    exact = o.agg(F.count_distinct("o_custkey").alias("exact_n"))
    return est.crossJoin(exact).select(
        "estimate",
        "exact_n",
        (
            (F.col("estimate") - F.col("exact_n").cast("double"))
            / F.col("exact_n").cast("double")
        ).alias("rel_error"),
    )


# --- portable Bloom filter (r9) ------------------------------------------------

_BF_M = 122880
_BF_PREFIX60 = """CAST((
    (CAST(({u} >> 0)  & 255 AS UBIGINT) * 72057594037927936) +
    (CAST(({u} >> 8)  & 255 AS UBIGINT) * 281474976710656) +
    (CAST(({u} >> 16) & 255 AS UBIGINT) * 1099511627776) +
    (CAST(({u} >> 24) & 255 AS UBIGINT) * 4294967296) +
    (CAST(({u} >> 32) & 255 AS UBIGINT) * 16777216) +
    (CAST(({u} >> 40) & 255 AS UBIGINT) * 65536) +
    (CAST(({u} >> 48) & 255 AS UBIGINT) * 256) +
     CAST(({u} >> 56) & 255 AS UBIGINT)
  ) // 16 AS BIGINT)"""


def _bf_pos(key_expr: str, i: int) -> str:
    u = f"md5_number_upper('bf{i}:' || CAST({key_expr} AS VARCHAR))"
    return _BF_PREFIX60.replace("{u}", u) + f" % {_BF_M}"


_BF_POS_UNION = "\n  UNION ALL\n".join(
    f"  SELECT {_bf_pos('o_custkey', i)} AS pos FROM orders" for i in range(4)
)

_BF_REG_SQL = f"""
WITH pos AS (
{_BF_POS_UNION}
)
SELECT pos // 60 AS word_idx,
       BIT_OR(CAST(1 AS BIGINT) << CAST(pos % 60 AS INT)) AS bits
FROM pos GROUP BY 1
"""


@register("sketch_bloom_registers", oracle=_BF_REG_SQL, tags=("sketch",))
def sketch_bloom_registers(spark, sf_dir):
    """Portable Bloom filter over order custkeys: k=4 salted 60-bit
    md5 positions per key, registers = 60-bit words from ONE bit_or
    aggregate — mergeable across shards/days exactly like the HLL/CMS
    register families, and (unlike Spark's engine-native bloom in
    join_bloom_prefilter) bit-identical in ANY engine that can md5:
    the oracle REBUILDS the words in DuckDB and hash-compares them.
    60-bit words because DuckDB's BIGINT << errors at 63 and a sign
    bit would change the rendering — the layout bends to portability.
    At 100 TB: the filter is m/8 bytes (~15 KB here) regardless of
    input size; the build is one narrow explode + hash agg."""
    from etlalchemy_spark.operators.sketch import bloom_registers

    # fanout: the register build is map-compute-bound (k salted md5
    # hashes per row ahead of a reducing aggregate) and the fixture
    # scan is one row group — the cms/spearman r13 finding
    o = t(spark, sf_dir, "orders", fanout=True)
    return bloom_registers(o, F.col("o_custkey"))


_BF_MEM_SQL = f"""
WITH pos AS (
{_BF_POS_UNION}
),
reg AS (
  SELECT pos // 60 AS word_idx,
         BIT_OR(CAST(1 AS BIGINT) << CAST(pos % 60 AS INT)) AS bits
  FROM pos GROUP BY 1
),
probe AS (
  SELECT p_partkey,
         p_partkey IN (SELECT o_custkey FROM orders) AS truth,
         p.i AS i,
         CASE p.i
           WHEN 0 THEN {_bf_pos('p_partkey', 0)}
           WHEN 1 THEN {_bf_pos('p_partkey', 1)}
           WHEN 2 THEN {_bf_pos('p_partkey', 2)}
           ELSE        {_bf_pos('p_partkey', 3)}
         END AS pos
  FROM part CROSS JOIN (SELECT UNNEST([0,1,2,3]) AS i) p
),
per AS (
  SELECT p_partkey,
         MIN(CASE WHEN (COALESCE(reg.bits, 0) & (CAST(1 AS BIGINT) << CAST(probe.pos % 60 AS INT))) <> 0
                  THEN 1 ELSE 0 END) AS all_set,
         MAX(CASE WHEN truth THEN 1 ELSE 0 END) AS truth
  FROM probe LEFT JOIN reg ON probe.pos // 60 = reg.word_idx
  GROUP BY p_partkey
)
SELECT COUNT(*) AS n_probes,
       SUM(CASE WHEN all_set = 1 THEN 1 ELSE 0 END) AS n_flagged,
       SUM(truth) AS n_members,
       SUM(CASE WHEN all_set = 1 AND truth = 0 THEN 1 ELSE 0 END) AS n_false_positives,
       SUM(CASE WHEN all_set = 0 AND truth = 1 THEN 1 ELSE 0 END) AS n_false_negatives,
       CAST(SUM(CASE WHEN all_set = 1 AND truth = 0 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(NULLIF(SUM(CASE WHEN truth = 0 THEN 1 ELSE 0 END), 0) AS DOUBLE) AS fpp_observed
FROM per
"""


@register("sketch_bloom_membership", oracle=_BF_MEM_SQL, tags=("sketch", "bench"))
def sketch_bloom_membership(spark, sf_dir):
    """Bloom membership audit: probe EVERY customer against the
    order-custkey filter and report flagged / true-member /
    false-positive / false-negative counts plus the measured FPP. The
    zero-false-negative guarantee is structural (a member's bits are
    all set by construction) and the oracle proves it on real data;
    partkeys half-overlap the custkey space, so both member and
    non-member populations are exercised;
    the FPP readout is what a query planner checks before trusting a
    runtime filter at this fill factor. Probe cost: k narrow rows per
    probe joined against a broadcast register table."""
    from etlalchemy_spark.operators.sketch import bloom_membership, bloom_registers

    o = t(spark, sf_dir, "orders")
    p = t(spark, sf_dir, "part")
    # the register build fans out (k md5/row map work, single-row-group
    # scan); the probe/distinct legs keep the plain scan — their keyed
    # exchanges already redistribute (alternating A/B 1.24 -> 1.10 s)
    reg = bloom_registers(t(spark, sf_dir, "orders", fanout=True), F.col("o_custkey"))
    ok = o.select(F.col("o_custkey").alias("p_partkey")).distinct()
    probes = p.join(ok.withColumn("_m", F.lit(True)), "p_partkey", "left").select(
        "p_partkey", F.coalesce(F.col("_m"), F.lit(False)).alias("truth")
    )
    return bloom_membership(reg, probes, F.col("p_partkey"), F.col("truth"))


# --- rolling 7-day MAU from daily HLL registers (r9) ----------------------------

_HLL_ROLLING_SQL = f"""
WITH uu AS (
  SELECT CAST(ts AS DATE) AS day,
         md5_number_upper(CAST(user_id AS VARCHAR)) AS u
  FROM events
), hh AS (
  SELECT day, {_BE60_FROM_U} AS h FROM uu
), r AS (
  SELECT day, h % 256 AS bucket,
         CASE WHEN (h >> 8) = 0 THEN 53
              ELSE 53 - CAST(length(bin(h >> 8)) AS INTEGER) END AS rho
  FROM hh
), reg AS (
  SELECT day, bucket, MAX(rho) AS register
  FROM r GROUP BY day, bucket
), days AS (SELECT DISTINCT day FROM reg),
rolled AS (
  SELECT d.day, reg.bucket, MAX(reg.register) AS register
  FROM days d JOIN reg ON reg.day BETWEEN d.day - 6 AND d.day
  GROUP BY d.day, reg.bucket
), agg AS (
  SELECT day,
         SUM(CAST(1 AS BIGINT) << (53 - register)) AS s_ne, COUNT(*) AS ne
  FROM rolled GROUP BY day
), raw AS (
  SELECT day, ne,
         (((CAST({_HLL_ALPHA!r} AS DOUBLE) * 256.0) * 256.0) * 9007199254740992.0)
         / CAST(s_ne + (256 - ne) * (CAST(1 AS BIGINT) << 53) AS DOUBLE) AS r
  FROM agg
), est AS (
  SELECT day,
         CASE WHEN r <= 640.0 AND (256 - ne) > 0
              THEN 256.0 * ln(256.0 / CAST(256 - ne AS DOUBLE))
              ELSE r END AS estimate
  FROM raw
), exact AS (
  SELECT d.day, COUNT(DISTINCT e.user_id) AS exact_users_7d
  FROM days d JOIN events e ON CAST(e.ts AS DATE) BETWEEN d.day - 6 AND d.day
  GROUP BY d.day
)
SELECT CAST(est.day AS VARCHAR) AS day, est.estimate, exact.exact_users_7d
FROM est JOIN exact USING (day)
"""


@register("sketch_hll_rolling_mau", oracle=_HLL_ROLLING_SQL, tags=("sketch", "events"))
def sketch_hll_rolling_mau(spark, sf_dir):
    """Rolling 7-day active users from DAILY portable-HLL registers —
    the production shape for MAU-style dashboards at 100 TB: the fact
    table is scanned ONCE to build one 256-int register set per day,
    and every rolling window (7-day here, 28-day, month — any grain)
    is answered by per-(day, bucket) MAX over the register table,
    never by re-scanning events with a distinct over a sliding
    window (which re-reads each event 7 times and holds a giant
    distinct state). The window merge is a tiny range join on the
    days × 256 register table; estimates use the same integer
    harmonic + linear-counting chain as sketch_hll_grouped_estimate,
    so even the per-day ESTIMATES hash-match DuckDB. Exact 7-day
    distinct counts ride along as the error audit (computed the
    expensive way only because the fixture is small — that cost is
    the one this operator exists to avoid)."""
    from etlalchemy_spark.operators.sketch import (
        hll_estimate_grouped,
        hll_registers_grouped,
    )

    ev = t(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    reg = hll_registers_grouped(ev, ["day"], F.col("user_id"))
    days = reg.select("day").distinct()
    rolled = (
        days.alias("d")
        .join(
            reg.alias("r"),
            (F.col("r.day") <= F.col("d.day"))
            & (F.col("r.day") >= F.date_sub(F.col("d.day"), 6)),
        )
        .groupBy(F.col("d.day").alias("day"), "bucket")
        .agg(F.max("register").alias("register"))
    )
    est = hll_estimate_grouped(rolled, ["day"])
    exact = (
        days.alias("d")
        .join(
            ev.alias("e"),
            (F.col("e.day") <= F.col("d.day"))
            & (F.col("e.day") >= F.date_sub(F.col("d.day"), 6)),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.count_distinct("e.user_id").alias("exact_users_7d"))
    )
    # day rendered as ISO string: pandas maps Spark DATE to date and
    # DuckDB DATE to Timestamp, which the value compare treats as
    # different — strings sidestep the container mismatch
    return est.join(exact, "day").withColumn("day", F.col("day").cast("string"))


# --- k-minhash corpus Jaccard (r9) -----------------------------------------------

_MHJ_K = 32

def _mhj_min(i: int) -> str:
    u = f"md5_number_upper('mj{i}:' || CAST(k AS VARCHAR))"
    return "MIN(" + _BF_PREFIX60.replace("{u}", u) + f") AS m{i}"


_MHJ_SIG = ",\n         ".join(_mhj_min(i) for i in range(_MHJ_K))

_MHJ_SQL = f"""
WITH a AS (SELECT DISTINCT o_custkey AS k FROM orders),
b AS (SELECT DISTINCT p_partkey AS k FROM part),
sa AS (SELECT {_MHJ_SIG} FROM a),
sb AS (SELECT {_MHJ_SIG} FROM b),
mt AS (
  SELECT {" + ".join(f"(CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END)" for i in range(_MHJ_K))} AS matches
  FROM sa, sb
),
ex AS (
  SELECT CAST((SELECT COUNT(*) FROM a JOIN b USING (k)) AS BIGINT) AS n_inter,
         CAST((SELECT COUNT(*) FROM (SELECT k FROM a UNION SELECT k FROM b)) AS BIGINT) AS n_union
)
SELECT CAST(matches AS BIGINT) AS n_matching_mins,
       CAST(matches AS DOUBLE) / {_MHJ_K}.0 AS jaccard_est,
       CAST(n_inter AS DOUBLE) / CAST(n_union AS DOUBLE) AS jaccard_exact
FROM mt, ex
"""


@register("sketch_minhash_jaccard_corpora", oracle=_MHJ_SQL, tags=("sketch", "dedup"))
def sketch_minhash_jaccard_corpora(spark, sf_dir):
    """Corpus-level k-MinHash Jaccard — the constant-size overlap
    sketch for WHOLE SETS (contrast dedup's per-document signatures):
    each side reduces to k=32 salted minimum hashes in ONE aggregate
    (mergeable across shards by MIN — ship 64 ints, never the keys),
    the estimate is matching-mins/k, and the exact Jaccard rides along
    as the error audit. The 'how much does this source overlap that
    one' readout data-sourcing teams check before paying for a corpus;
    at 100 TB each side's sketch costs one scan and k·8 bytes of
    state (k=32 here: ±1/sqrt(k) ≈ 18% standard error, plenty for a
    sourcing decision). Portable 60-bit md5 mins, so even the signatures
    hash-match."""
    from etlalchemy_spark.catalog import load_table_spread
    from etlalchemy_spark.operators.dedup import md5_prefix60

    # No distinct pass before the mins: MIN is idempotent under
    # duplicate keys, so the k salted minima over the RAW column are
    # bit-identical to minima over its distinct set — while the
    # distinct's full-key exchange disappears and the k-md5-per-row
    # map work partial-aggregates to k values per task (guide §2.3:
    # aggregate before you shuffle — here the shuffle drops to k·8
    # bytes/task at ANY scale). The footer-guarded spread breaks the
    # fixture's single-row-group scan fusion; AQE had been coalescing
    # the post-distinct aggregate onto ONE task carrying all 32
    # hashes/row (job profile: 4.6 s of a 6.1 s query on one core).
    # Alternating same-session A/B: 5.50 -> 2.08 s at sf0.1/32c.
    def sig(name, col):
        df = load_table_spread(spark, sf_dir, name).select(F.col(col).alias("k"))
        aggs = [
            F.min(
                md5_prefix60(F.concat(F.lit(f"mj{i}:"), F.col("k").cast("string")))
            ).alias(f"m{i}")
            for i in range(_MHJ_K)
        ]
        return df.agg(*aggs)

    o = t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    p = t(spark, sf_dir, "part").select(F.col("p_partkey").alias("k"))
    sa, sb = sig("orders", "o_custkey"), sig("part", "p_partkey")
    matches = sum(
        F.when(sa[f"m{i}"] == sb[f"m{i}"], 1).otherwise(0) for i in range(_MHJ_K)
    )
    # exact-audit leg IN-PLAN (r14): the two .count() calls here were
    # driver-BLOCKING jobs serialized ahead of the main query (the
    # market-basket n_orders lesson). As one-row aggregates riding a
    # broadcast crossJoin they plan WITH the sketch legs. Both counts
    # are exact integers well under 2^53, so cast-to-double + one IEEE
    # division is bit-identical to the old float(inter)/float(union).
    ex = (
        o.distinct()
        .join(p.distinct(), "k")
        .agg(F.count(F.lit(1)).alias("_n_inter"))
        .crossJoin(o.union(p).distinct().agg(F.count(F.lit(1)).alias("_n_union")))
    )
    return (
        sa.crossJoin(sb)
        .crossJoin(F.broadcast(ex))
        .select(matches.alias("_m"), "_n_inter", "_n_union")
        .select(
            F.col("_m").cast("bigint").alias("n_matching_mins"),
            (F.col("_m").cast("double") / float(_MHJ_K)).alias("jaccard_est"),
            (
                F.col("_n_inter").cast("double") / F.col("_n_union").cast("double")
            ).alias("jaccard_exact"),
        )
    )


# --- KMV (k-minimum-values) distinct sketch (r10) -----------------------------------

_KMV_K = 64


def _kmv_sketch_cte(rel: str, key: str, name: str) -> str:
    """k smallest DISTINCT salted 60-bit hashes of ``key`` in ``rel``,
    ranked — the whole KMV sketch as k integer rows."""
    return f"""{name}_u AS (
  SELECT DISTINCT md5_number_upper('kmv:' || CAST({key} AS VARCHAR)) AS u FROM {rel}
), {name}_h AS (
  SELECT {_BE60_FROM_U} AS h FROM {name}_u
), {name} AS (
  SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rank
  FROM (SELECT h FROM {name}_h ORDER BY h LIMIT {_KMV_K})
)"""


_KMV_REG_SQL = f"""
WITH {_kmv_sketch_cte("orders", "o_custkey", "kmv")}
SELECT CAST(rank AS BIGINT) AS rank, CAST(h AS BIGINT) AS h
FROM kmv
"""


def _kmv_spark(df, key, k: int = _KMV_K):
    from etlalchemy_spark.operators.dedup import md5_prefix60

    return (
        df.select(
            md5_prefix60(F.concat(F.lit("kmv:"), key.cast("string"))).alias("h")
        )
        .distinct()
        .orderBy("h")
        .limit(k)
    )


@register("sketch_kmv_registers", oracle=_KMV_REG_SQL, tags=("sketch",))
def sketch_kmv_registers(spark, sf_dir):
    """KMV (k-minimum-values / bottom-k) sketch state over
    orders.o_custkey (r10) — the third portable distinct sketch next
    to HLL and bitmap, and the only one whose state supports SET
    ALGEBRA with plain SQL (union = k smallest of the concatenation,
    Jaccard = overlap share — see sketch_kmv_union_jaccard). State is
    k = 64 integer rows: the smallest distinct salted md5-60 hashes.
    Scale shape: hash is a narrow map, DISTINCT is one hash-agg, and
    ORDER BY h LIMIT k is TakeOrderedAndProject — every partition
    keeps only its local bottom-k, so k values per partition move,
    never the key stream."""
    from pyspark.sql import Window as W

    o = t(spark, sf_dir, "orders")
    sk = _kmv_spark(o, F.col("o_custkey"))
    return sk.select(
        F.row_number().over(W.orderBy("h")).cast("bigint").alias("rank"),
        F.col("h").cast("bigint").alias("h"),
    )


_KMV_EST_SQL = f"""
WITH {_kmv_sketch_cte("orders", "o_custkey", "kmv")},
kth AS (SELECT MAX(h) AS hk, COUNT(*) AS k FROM kmv),
tru AS (SELECT COUNT(DISTINCT o_custkey) AS n_true FROM orders)
SELECT CAST(k AS BIGINT) AS k,
       CAST(hk AS BIGINT) AS kth_hash,
       (CAST(k - 1 AS DOUBLE) * 1152921504606846976e0) / CAST(hk AS DOUBLE)
         AS estimate,
       CAST(n_true AS BIGINT) AS n_true,
       ((CAST(k - 1 AS DOUBLE) * 1152921504606846976e0) / CAST(hk AS DOUBLE)
        - CAST(n_true AS DOUBLE)) / CAST(n_true AS DOUBLE) AS rel_error
FROM kth, tru
"""


@register("sketch_kmv_estimate", oracle=_KMV_EST_SQL, tags=("sketch",))
def sketch_kmv_estimate(spark, sf_dir):
    """KMV distinct-count estimate + self-audit (r10): with k minimum
    hash values uniform on [0, 2^60), the unbiased estimator is
    (k-1) * 2^60 / h_k — one division over two exact integers, so the
    'approximate' readout is still bit-identical cross-engine (the
    estimation ERROR is the algorithm's, not the engine's; the
    sketch_hll_error_report discipline). Emits the estimate beside the
    exact distinct count and the relative error."""
    o = t(spark, sf_dir, "orders")
    sk = _kmv_spark(o, F.col("o_custkey"))
    kth = sk.agg(F.max("h").alias("hk"), F.count(F.lit(1)).alias("k"))
    tru = o.agg(F.countDistinct("o_custkey").alias("n_true"))
    a = kth.crossJoin(F.broadcast(tru))
    est = (F.col("k") - 1).cast("double") * F.lit(
        1152921504606846976.0
    ) / F.col("hk").cast("double")
    return a.select(
        F.col("k").cast("bigint").alias("k"),
        F.col("hk").cast("bigint").alias("kth_hash"),
        est.alias("estimate"),
        F.col("n_true").cast("bigint").alias("n_true"),
        ((est - F.col("n_true").cast("double")) / F.col("n_true").cast("double")).alias(
            "rel_error"
        ),
    )


_KMV_SETS_SQL = f"""
WITH a_src AS (SELECT o_custkey FROM orders
               WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')),
b_src AS (SELECT o_custkey FROM orders
          WHERE o_orderpriority IN ('2-HIGH', '3-MEDIUM')),
{_kmv_sketch_cte("a_src", "o_custkey", "ka")},
{_kmv_sketch_cte("b_src", "o_custkey", "kb")},
un AS (
  SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rank FROM (
    SELECT DISTINCT h FROM (SELECT h FROM ka UNION ALL SELECT h FROM kb)
    ORDER BY h LIMIT {_KMV_K}
  )
),
j AS (
  SELECT COUNT(*) AS k_u, MAX(h) AS hk,
         SUM(CASE WHEN h IN (SELECT h FROM ka)
                   AND h IN (SELECT h FROM kb) THEN 1 ELSE 0 END) AS n_both
  FROM un
)
SELECT CAST(k_u AS BIGINT) AS k,
       CAST(n_both AS BIGINT) AS n_in_both,
       CAST(n_both AS DOUBLE) / CAST(k_u AS DOUBLE) AS jaccard_est,
       (CAST(k_u - 1 AS DOUBLE) * 1152921504606846976e0) / CAST(hk AS DOUBLE)
         AS union_est,
       (CAST(n_both AS DOUBLE) / CAST(k_u AS DOUBLE))
       * ((CAST(k_u - 1 AS DOUBLE) * 1152921504606846976e0) / CAST(hk AS DOUBLE))
         AS intersection_est
FROM j
"""


@register("sketch_kmv_union_jaccard", oracle=_KMV_SETS_SQL, tags=("sketch", "bench"))
def sketch_kmv_union_jaccard(spark, sf_dir):
    """KMV set algebra (r10) — the reason to store bottom-k sketches
    instead of HLL: two persisted sketches answer UNION, JACCARD and
    INTERSECTION cardinality with k-row arithmetic, no rescan of
    either side. Union sketch = k smallest of the two sketches'
    concatenation (closed under the same k); Jaccard estimate = share
    of the union sketch present in BOTH input sketches; intersection
    = J * union estimate (inclusion-exclusion on estimates). Because
    both sides salt the SAME hash, common keys collide exactly —
    membership is an integer equi-join over k-row sets. Sketch legs
    cost one TakeOrderedAndProject each; everything downstream is
    broadcast-sized."""
    o = t(spark, sf_dir, "orders")
    a_src = o.where(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
    b_src = o.where(F.col("o_orderpriority").isin("2-HIGH", "3-MEDIUM"))
    ka = _kmv_spark(a_src, F.col("o_custkey"))
    kb = _kmv_spark(b_src, F.col("o_custkey"))
    un = ka.unionAll(kb).distinct().orderBy("h").limit(_KMV_K)
    both = ka.join(kb, "h").select("h")
    j = un.join(F.broadcast(both.withColumn("_b", F.lit(1))), "h", "left").agg(
        F.count(F.lit(1)).alias("k_u"),
        F.max("h").alias("hk"),
        F.sum(F.coalesce(F.col("_b"), F.lit(0))).alias("n_both"),
    )
    jd = F.col("n_both").cast("double") / F.col("k_u").cast("double")
    uest = (F.col("k_u") - 1).cast("double") * F.lit(
        1152921504606846976.0
    ) / F.col("hk").cast("double")
    return j.select(
        F.col("k_u").cast("bigint").alias("k"),
        F.col("n_both").cast("bigint").alias("n_in_both"),
        jd.alias("jaccard_est"),
        uest.alias("union_est"),
        (jd * uest).alias("intersection_est"),
    )


# --- AMS F2 / join-size sketch (r10) -------------------------------------------------

_AMS_D = 16


def _ams_sql() -> str:
    def counters(rel: str, key: str, name: str) -> str:
        cols = ",\n         ".join(
            f"SUM(1 - 2 * (({_BE60_FROM_U.replace('u >>', f'u{j} >>').replace('(u ', f'(u{j} ')}) % 2)) AS x{j}"
            for j in range(_AMS_D)
        )
        us = ",\n         ".join(
            f"md5_number_upper('ams{j}:' || CAST({key} AS VARCHAR)) AS u{j}"
            for j in range(_AMS_D)
        )
        return f"""{name}_u AS (
  SELECT {us} FROM {rel}
), {name} AS (
  SELECT {cols} FROM {name}_u
)"""

    prods = " + ".join(f"CAST(a.x{j} AS HUGEINT) * b.x{j}" for j in range(_AMS_D))
    return f"""
WITH {counters("orders", "o_custkey", "a")},
{counters("events", "user_id", "b")},
tru AS (
  SELECT COUNT(*) AS n_true
  FROM orders JOIN events ON o_custkey = user_id
)
SELECT CAST({_AMS_D} AS BIGINT) AS d,
       CAST(CAST(({prods}) AS VARCHAR) AS DOUBLE) / {_AMS_D}e0 AS join_size_est,
       CAST(n_true AS BIGINT) AS n_true,
       (CAST(CAST(({prods}) AS VARCHAR) AS DOUBLE) / {_AMS_D}e0
        - CAST(n_true AS DOUBLE)) / CAST(n_true AS DOUBLE) AS rel_error
FROM a, b, tru
"""


@register("sketch_ams_join_size", oracle=_ams_sql(), tags=("sketch", "join"))
def sketch_ams_join_size(spark, sf_dir):
    """AMS (Alon-Matias-Szegedy) join-size estimate (r10) — the
    tug-of-war sketch: each side reduces to d = 16 signed counters
    X_j = sum over rows of (+/-1 from a salted hash bit of the key),
    and E[X_j * Y_j] IS the equi-join size sum f_a(v) * f_b(v); the
    d-fold mean cuts variance. The classic optimizer-statistics
    alternative to `sketch_cms_join_size`: unbiased (CMS only
    overestimates) at the cost of two-sided error. Each side costs ONE
    narrow map + ONE d-wide aggregate — d integers per side leave the
    executors, the join itself never runs (the exact count here is
    the audit leg). Signs are salted portable-md5 parity bits, so
    both engines' counters are identical integers; the estimate is
    one integer dot product and a division."""
    from etlalchemy_spark.catalog import load_table_spread
    from etlalchemy_spark.operators.dedup import md5_prefix60

    # counter builds ride the footer-guarded spread: each side is 16
    # salted md5 parity bits PER ROW ahead of a fully-reducing sum
    # aggregate, and the fixture's single-row-group scans fused both
    # batteries onto one core each (job profile: 2.3 s + 1.6 s
    # single-task jobs in a 3.2 s query). Map-side partial sums mean
    # the exchange carries 16 integers per task at any scale; exact
    # integer sums reassociate bit-identically. The audit join keeps
    # the plain scans (its keyed exchange already redistributes).
    def counters(name, key):
        df = load_table_spread(spark, sf_dir, name)
        signs = [
            (
                F.lit(1)
                - 2 * (md5_prefix60(F.concat(F.lit(f"ams{j}:"), key.cast("string"))) % 2)
            ).alias(f"s{j}")
            for j in range(_AMS_D)
        ]
        return df.select(*signs).agg(
            *[F.sum(f"s{j}").cast("decimal(38,0)").alias(f"x{j}") for j in range(_AMS_D)]
        )

    o = t(spark, sf_dir, "orders")
    e = t(spark, sf_dir, "events")
    a = counters("orders", F.col("o_custkey"))
    b = counters("events", F.col("user_id"))
    b = b.select(*[F.col(f"x{j}").alias(f"y{j}") for j in range(_AMS_D)])
    tru = o.join(e, o.o_custkey == e.user_id).agg(F.count(F.lit(1)).alias("n_true"))
    w = a.crossJoin(F.broadcast(b)).crossJoin(F.broadcast(tru))
    dot = sum(F.col(f"x{j}") * F.col(f"y{j}") for j in range(_AMS_D))
    est = dot.cast("decimal(38,0)").cast("double") / F.lit(float(_AMS_D))
    return w.select(
        F.lit(_AMS_D).cast("bigint").alias("d"),
        est.alias("join_size_est"),
        F.col("n_true").cast("bigint").alias("n_true"),
        ((est - F.col("n_true").cast("double")) / F.col("n_true").cast("double")).alias(
            "rel_error"
        ),
    )
