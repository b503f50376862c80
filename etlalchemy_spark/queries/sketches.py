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
