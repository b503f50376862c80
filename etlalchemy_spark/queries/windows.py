"""Window-function coverage: ranking, lag/lead, frames, per-group top-k,
sessionization (gaps-and-islands).

SURVEY.md §2 Table B rows "Window functions", "Sort / limit / top-k".
Each window = one shuffle on its partition key; frames run inside the
sorted partition with no extra exchange.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from etlalchemy_spark.registry import register
from etlalchemy_spark.queries._util import dec, t

_TOPK_SQL = """
SELECT c_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (
           PARTITION BY o_custkey
           ORDER BY o_totalprice DESC, o_orderkey
         ) AS rn
  FROM orders
)
WHERE rn <= 3
"""


@register("window_topk_per_group", oracle=_TOPK_SQL, tags=("window", "topk", "bench"))
def window_topk_per_group(spark, sf_dir):
    """Top-3 orders by price per customer: row_number + filter. The
    ORDER BY carries a unique tie-break (o_orderkey) so results are
    deterministic across engines. At scale this is the standard top-k
    pattern — no global sort, work stays partition-local."""
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        t(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 3)
    )


_RANK_SQL = """
SELECT s_suppkey, s_name, s_acctbal,
       CAST(RANK()       OVER (ORDER BY s_acctbal DESC) AS BIGINT) AS rnk,
       CAST(DENSE_RANK() OVER (ORDER BY s_acctbal DESC) AS BIGINT) AS drnk,
       CAST(NTILE(4)     OVER (ORDER BY s_acctbal DESC, s_suppkey) AS BIGINT) AS quartile
FROM supplier
"""


@register("window_rank", oracle=_RANK_SQL, tags=("window",))
def window_rank(spark, sf_dir):
    """rank / dense_rank / ntile over the global DESC account-balance
    order — via the two-phase range-bucketed prefix decomposition
    (operators/prefix.py), so no single-partition WindowExec even
    though supplier grows linearly with SF. The naive unpartitioned
    window lives only in the DuckDB oracle; ntile(4) is derived
    arithmetically from the global row_number and the total count
    (first n%4 buckets get ceil(n/4) rows — the SQL NTILE contract)."""
    from etlalchemy_spark.operators.prefix import global_ranks

    sup = t(spark, sf_dir, "supplier")
    ranked = global_ranks(sup, -F.col("s_acctbal"), ["s_suppkey"], n_buckets=16)
    n_df = sup.agg(F.count(F.lit(1)).alias("_n"))
    d = ranked.crossJoin(F.broadcast(n_df))
    base = F.expr("_n div 4")
    rem = F.expr("_n % 4")
    cutoff = rem * (base + 1)
    rn = F.col("rn").cast("bigint")
    # integer ceil-divisions expressed via floor to stay ANSI-safe
    quartile = F.when(rn <= cutoff, F.floor((rn + base) / (base + 1))).otherwise(
        rem + F.floor((rn - cutoff + base - 1) / F.greatest(base, F.lit(1)))
    )
    return d.select(
        "s_suppkey",
        "s_name",
        "s_acctbal",
        F.col("rnk").cast("bigint").alias("rnk"),
        F.col("drnk").cast("bigint").alias("drnk"),
        quartile.cast("bigint").alias("quartile"),
    )


_LAGLEAD_SQL = """
SELECT event_id, user_id, ts,
       LAG(event_type)  OVER w AS prev_type,
       LEAD(event_type) OVER w AS next_type,
       CAST(FLOOR((epoch_us(ts) - epoch_us(LAG(ts) OVER w)) / 1000) AS BIGINT) AS ms_since_prev
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@register("window_lag_lead", oracle=_LAGLEAD_SQL, tags=("window",))
def window_lag_lead(spark, sf_dir):
    """lag/lead navigation plus inter-event gap in milliseconds."""
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        # FLOOR on both sides: DuckDB ROUNDS double→int casts while
        # Spark truncates — floor first makes them agree
        F.floor(
            (F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts)) / F.lit(1000)
        ).cast("bigint").alias("ms_since_prev"),
    )


_RUNNING_SQL = """
SELECT event_id, user_id, ts,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ), 4) AS DOUBLE) AS running_value,
       COUNT(*) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS n_so_far
FROM events
"""


@register("window_running_sum", oracle=_RUNNING_SQL, tags=("window",))
def window_running_sum(spark, sf_dir):
    """Cumulative frame (unbounded preceding → current). The running
    sum accumulates in DECIMAL: window engines associate differently
    (DuckDB uses segment trees), so double accumulation would drift."""
    ev = t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(dec("value", "decimal(18,6)")).over(w)
        .cast("decimal(38,4)")
        .cast("double")
        .alias("running_value"),
        F.count(F.lit(1)).over(w).alias("n_so_far"),
    )


_SLIDE_SQL = """
SELECT event_id, user_id, ts,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
       ), 4) AS DOUBLE) AS moving_sum3
FROM events
"""


@register("window_moving_frame", oracle=_SLIDE_SQL, tags=("window",))
def window_moving_frame(spark, sf_dir):
    """Bounded sliding frame (3-row moving sum)."""
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, W.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(dec("value", "decimal(18,6)")).over(w)
        .cast("decimal(38,4)")
        .cast("double")
        .alias("moving_sum3"),
    )


_FIRSTLAST_SQL = """
SELECT DISTINCT user_id,
       FIRST_VALUE(event_type) OVER w AS first_type,
       LAST_VALUE(event_type)  OVER w AS last_type,
       FIRST_VALUE(ts) OVER w AS first_ts,
       LAST_VALUE(ts)  OVER w AS last_ts
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY ts, event_id
  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
)
"""


@register("window_first_last", oracle=_FIRSTLAST_SQL, tags=("window",))
def window_first_last(spark, sf_dir):
    """first/last over the full partition (explicit unbounded frame —
    LAST_VALUE with the default frame is a classic footgun)."""
    ev = t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
        F.first("ts").over(w).alias("first_ts"),
        F.last("ts").over(w).alias("last_ts"),
    ).distinct()


_SESSION_SQL = """
WITH flagged AS (
  SELECT user_id, ts, value, event_id,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
), numbered AS (
  SELECT user_id, ts, value,
         CAST(SUM(is_new) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       COUNT(*) AS n_events,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS session_value
FROM numbered
GROUP BY user_id, session_id
"""


@register("window_sessionize", oracle=_SESSION_SQL, tags=("window", "session", "bench"))
def window_sessionize(spark, sf_dir):
    """Gaps-and-islands sessionization (30-min inactivity gap): the
    batch twin of streaming session_window. One shuffle on user_id for
    the window, reused by the groupBy (same key)."""
    from etlalchemy_spark.queries._util import sessionize

    ev = t(spark, sf_dir, "events")
    return (
        sessionize(ev)
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.sum(dec("value", "decimal(18,6)"))
            .cast("decimal(38,4)")
            .cast("double")
            .alias("session_value"),
        )
    )


_SORT_SQL = """
SELECT p_partkey, p_name, p_retailprice
FROM part
ORDER BY p_retailprice DESC, p_partkey
LIMIT 15
"""


@register("sort_limit_topk", oracle=_SORT_SQL, tags=("sort", "topk"))
def sort_limit_topk(spark, sf_dir):
    """Global top-k: Catalyst plans TakeOrderedAndProject — per-partition
    heap + driver merge of k rows, never a full sort at scale."""
    return (
        t(spark, sf_dir, "part")
        .select("p_partkey", "p_name", "p_retailprice")
        .orderBy(F.desc("p_retailprice"), "p_partkey")
        .limit(15)
    )


_ANALYTIC_SQL = """
SELECT s_suppkey, s_acctbal,
       PERCENT_RANK() OVER (ORDER BY s_acctbal, s_suppkey) AS pct_rank,
       CUME_DIST()    OVER (ORDER BY s_acctbal, s_suppkey) AS cume,
       NTH_VALUE(s_name, 2) OVER (
         ORDER BY s_acctbal, s_suppkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ) AS second_poorest
FROM supplier
"""


@register("window_analytic_ranks", oracle=_ANALYTIC_SQL, tags=("window",))
def window_analytic_ranks(spark, sf_dir):
    """percent_rank / cume_dist / nth_value over the global order,
    decomposed through the range-bucketed prefix (operators/prefix.py)
    instead of a single-partition window. The ORDER BY carries a
    unique tie-break, so rank == row_number and the distribution
    functions are pure integer ratios of (rn, n) — identical IEEE
    doubles in both engines. nth_value(·, 2) over the full frame is
    the rn=2 row's name, fetched with a one-row aggregate and
    broadcast back. The naive window survives only in the oracle."""
    from etlalchemy_spark.operators.prefix import global_ranks

    sup = t(spark, sf_dir, "supplier")
    ranked = global_ranks(sup, F.col("s_acctbal"), ["s_suppkey"], n_buckets=16)
    scalars = ranked.agg(
        F.count(F.lit(1)).alias("_n"),
        F.min(F.when(F.col("rn") == 2, F.col("s_name"))).alias("_second"),
    )
    d = ranked.crossJoin(F.broadcast(scalars))
    rn = F.col("rn").cast("double")
    n = F.col("_n").cast("double")
    return d.select(
        "s_suppkey",
        "s_acctbal",
        F.when(F.col("_n") > 1, (rn - 1) / (n - 1)).otherwise(F.lit(0.0)).alias("pct_rank"),
        (rn / n).alias("cume"),
        F.col("_second").alias("second_poorest"),
    )


_RANGE_FRAME_SQL = """
SELECT event_id, user_id, ts,
       COUNT(*) OVER (
         PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
       ) AS n_last_hour
FROM events
"""


@register("window_range_interval_frame", oracle=_RANGE_FRAME_SQL, tags=("window",))
def window_range_interval_frame(spark, sf_dir):
    """RANGE frame over a time axis (trailing 1-hour event count per
    user) — value-based frames vs the ROWS frames elsewhere; frame
    membership is timestamp comparison, no float math."""
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1))
        .over(
            W.partitionBy("user_id")
            # microsecond axis: a seconds cast would truncate and admit
            # rows just over the hour at the frame boundary
            .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
            .rangeBetween(-3_600_000_000, 0)
        )
        .alias("n_last_hour"),
    )


_RUNDIST_SQL = """
SELECT event_id, user_id, ts,
       COUNT(DISTINCT event_type) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS types_so_far
FROM events
"""


@register("window_running_distinct", oracle=_RUNDIST_SQL, tags=("window",))
def window_running_distinct(spark, sf_dir):
    """Running distinct count per user (how many event types seen so
    far): Spark has no DISTINCT window aggregate, so the idiom is
    size(collect_set(...)) over the cumulative frame — set semantics
    make it order-insensitive within the frame."""
    ev = t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.size(F.collect_set("event_type").over(w)).cast("bigint").alias("types_so_far"),
    )


_RUNMED_SQL = """
SELECT event_id, user_id, ts,
       quantile_cont(value, 0.5) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS running_median
FROM events
"""


@register("window_running_median", oracle=_RUNMED_SQL, tags=("window", "stats"))
def window_running_median(spark, sf_dir):
    """Running median per user: selection + one exact interpolation
    step on identical doubles — order-insensitive within the frame, so
    cross-engine exact (unlike running SUM of doubles)."""
    ev = t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.percentile("value", F.lit(0.5)).over(w).alias("running_median"),
    )


_RANK_SCALABLE_SQL = """
SELECT s_suppkey, s_acctbal,
       CAST(ROW_NUMBER() OVER (ORDER BY s_acctbal DESC, s_suppkey) AS BIGINT) AS rn,
       CAST(RANK()       OVER (ORDER BY s_acctbal DESC) AS BIGINT) AS rnk,
       CAST(DENSE_RANK() OVER (ORDER BY s_acctbal DESC) AS BIGINT) AS drnk
FROM supplier
"""


@register("window_rank_global_scalable", oracle=_RANK_SCALABLE_SQL, tags=("window", "scale"))
def window_rank_global_scalable(spark, sf_dir):
    """Global row_number/rank/dense_rank WITHOUT the single-partition
    window: two-phase range-bucketed prefix (operators/prefix.py).
    Quantile bounds are plan literals; the per-bucket window runs
    parallel; only the n_buckets-row offset frame is serial. The oracle
    is the plain unpartitioned-window SQL — proving the decomposition
    is exact, ties included."""
    from etlalchemy_spark.operators.prefix import global_ranks

    sup = t(spark, sf_dir, "supplier")
    ranked = global_ranks(sup, -F.col("s_acctbal"), ["s_suppkey"], n_buckets=16)
    return ranked.select(
        "s_suppkey",
        "s_acctbal",
        F.col("rn").cast("bigint").alias("rn"),
        F.col("rnk").cast("bigint").alias("rnk"),
        F.col("drnk").cast("bigint").alias("drnk"),
    )


_RUNSUM_GLOBAL_SQL = """
SELECT o_orderkey,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
         ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ), 4) AS DOUBLE) AS running_total
FROM orders
"""


@register("window_running_sum_global_scalable", oracle=_RUNSUM_GLOBAL_SQL, tags=("window", "scale"))
def window_running_sum_global_scalable(spark, sf_dir):
    """Global running revenue total over date order — the scalable twin
    of SUM() OVER (ORDER BY ...) with no PARTITION BY. Decimal
    accumulation keeps the bucket-decomposed sum bit-identical to the
    serial oracle."""
    from etlalchemy_spark.operators.prefix import running_global_sum

    o = t(spark, sf_dir, "orders")
    out = running_global_sum(
        o,
        F.unix_micros(F.col("o_orderdate").cast("timestamp")),
        ["o_orderkey"],
        F.col("o_totalprice").cast("decimal(18,4)"),
        alias="_rt",
        n_buckets=16,
    )
    return out.select(
        "o_orderkey",
        F.round(F.col("_rt"), 4).cast("decimal(38,4)").cast("double").alias("running_total"),
    )


_RUNMAX_GLOBAL_SQL = """
SELECT event_id,
       MAX(value) OVER (
         ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS high_watermark
FROM events
"""


@register("window_running_max_global_scalable", oracle=_RUNMAX_GLOBAL_SQL, tags=("window", "scale"))
def window_running_max_global_scalable(spark, sf_dir):
    """Global high-watermark (running MAX) over event time via the
    range-bucketed prefix decomposition — max is idempotent, so the
    combine is exact by construction."""
    from etlalchemy_spark.operators.prefix import running_global_max

    ev = t(spark, sf_dir, "events")
    out = running_global_max(
        ev,
        F.unix_micros(F.col("ts")),
        ["event_id"],
        F.col("value"),
        alias="high_watermark",
        n_buckets=16,
    )
    return out.select("event_id", "high_watermark")


_DIST_FRAME_SQL = """
SELECT s_suppkey, s_nationkey, s_acctbal,
       percent_rank() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal) AS pct_rank,
       cume_dist()    OVER (PARTITION BY s_nationkey ORDER BY s_acctbal) AS cume,
       nth_value(s_acctbal, 2) OVER (
         PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ) AS second_lowest,
       first_value(s_acctbal) OVER (
         PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ) AS lowest,
       last_value(s_acctbal) OVER (
         PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ) AS highest
FROM supplier
"""


@register("window_distribution_frames", oracle=_DIST_FRAME_SQL, tags=("window",))
def window_distribution_frames(spark, sf_dir):
    """percent_rank / cume_dist / nth_value / first_value / last_value
    over full-partition frames — the distribution-function corner of
    the window surface. percent_rank's (rank-1)/(n-1) division is one
    double op on identical ints: cross-engine exact."""
    sup = t(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy("s_acctbal")
    wf = (
        W.partitionBy("s_nationkey")
        .orderBy("s_acctbal", "s_suppkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return sup.select(
        "s_suppkey",
        "s_nationkey",
        "s_acctbal",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.nth_value("s_acctbal", 2).over(wf).alias("second_lowest"),
        F.first("s_acctbal").over(wf).alias("lowest"),
        F.last("s_acctbal").over(wf).alias("highest"),
    )


_ISLANDS_SQL = """
WITH p AS (
  SELECT user_id, event_id,
         event_id - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS grp
  FROM events WHERE event_type = 'click'
)
SELECT user_id, MIN(event_id) AS island_start, MAX(event_id) AS island_end,
       COUNT(*) AS island_len
FROM p GROUP BY user_id, grp
HAVING COUNT(*) >= 2
"""


@register("window_gaps_islands", oracle=_ISLANDS_SQL, tags=("window",))
def window_gaps_islands(spark, sf_dir):
    """Gaps-and-islands on the event-id sequence: consecutive runs of
    click events per user via the id-minus-row_number trick (constant
    within a run, shifts at every gap), then one aggregate per island.
    The window and the aggregate share the user partitioning — one
    shuffle total; islands of length 1 are filtered to keep the output
    the interesting runs."""
    from pyspark.sql import Window as W

    ev = t(spark, sf_dir, "events").where(F.col("event_type") == "click")
    w = W.partitionBy("user_id").orderBy("event_id")
    p = ev.select(
        "user_id",
        "event_id",
        (F.col("event_id") - F.row_number().over(w)).alias("grp"),
    )
    return (
        p.groupBy("user_id", "grp")
        .agg(
            F.min("event_id").alias("island_start"),
            F.max("event_id").alias("island_end"),
            F.count(F.lit(1)).alias("island_len"),
        )
        .where(F.col("island_len") >= 2)
        .drop("grp")
    )
