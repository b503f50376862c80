"""Interval (true non-equi) join with bucketing — the scale pattern for
range predicates that have NO equi key (SURVEY.md §2 "Theta/range/
interval join").

Naive Spark plan for ``a.start <= b.ts AND b.ts < a.end`` is a
broadcast-nested-loop — O(n·m). The bucketed form maps each interval to
the hour buckets it overlaps and each point to its bucket, turning the
join into an equi-join on bucket + residual range filter: work becomes
O(matches + buckets touched).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etlalchemy_spark.registry import register
from etlalchemy_spark.queries._util import t

_BUCKET_SECONDS = 3600

_INTERVAL_SQL = """
WITH sessions AS (
  SELECT user_id,
         MIN(ts) AS session_start,
         MAX(ts) + INTERVAL 30 MINUTE AS session_end,
         MIN(event_id) AS session_id
  FROM (
    SELECT user_id, ts, event_id,
           SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
    FROM (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                  OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
  )
  GROUP BY user_id, session_no
  HAVING user_id < 5
)
SELECT s.session_id, s.user_id,
       COUNT(*) AS n_concurrent_events
FROM sessions s
JOIN events e
  ON e.ts >= s.session_start AND e.ts < s.session_end AND e.user_id <> s.user_id
GROUP BY s.session_id, s.user_id
"""


@register("join_interval_bucketed", oracle=_INTERVAL_SQL, tags=("join", "interval"))
def join_interval_bucketed(spark, sf_dir):
    """How many other-user events fall inside each of user 0–4's
    sessions. Spark side: explode each session onto its overlapped hour
    buckets, equi-join events on bucket, then the exact range residual
    — no nested loop anywhere (the oracle uses the naive theta join)."""
    ev = t(spark, sf_dir, "events")

    # sessions of users 0-4 (the oracle-checked sessionization shape,
    # shared with window_sessionize)
    from etlalchemy_spark.queries._util import sessionize

    sessions = (
        sessionize(ev)
        .withColumnRenamed("session_id", "session_no")
        .groupBy("user_id", "session_no")
        .agg(
            F.min("ts").alias("session_start"),
            (F.max("ts") + F.expr("INTERVAL 30 MINUTES")).alias("session_end"),
            F.min("event_id").alias("session_id"),
        )
        .where(F.col("user_id") < 5)
        .drop("session_no")
    )

    # bucket the intervals (explode over covered hours) and the points
    start_b = F.floor(F.unix_micros("session_start") / (_BUCKET_SECONDS * 1_000_000))
    end_b = F.floor(F.unix_micros("session_end") / (_BUCKET_SECONDS * 1_000_000))
    s_bucketed = sessions.withColumn("bucket", F.explode(F.sequence(start_b, end_b)))
    e_bucketed = ev.select(
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
        F.floor(F.unix_micros("ts") / (_BUCKET_SECONDS * 1_000_000)).alias("bucket"),
    )
    return (
        s_bucketed.join(e_bucketed, "bucket")
        .where(
            (F.col("e_ts") >= F.col("session_start"))
            & (F.col("e_ts") < F.col("session_end"))
            & (F.col("e_user") != F.col("user_id"))
        )
        .groupBy("session_id", "user_id")
        .agg(F.count(F.lit(1)).alias("n_concurrent_events"))
    )


_UNPIVOT_SQL = """
SELECT o_orderkey, metric, value FROM (
  SELECT o_orderkey,
         'totalprice' AS metric, o_totalprice AS value FROM orders
  UNION ALL
  SELECT o_orderkey, 'custkey', CAST(o_custkey AS DOUBLE) FROM orders
  UNION ALL
  SELECT o_orderkey, 'order_year', CAST(YEAR(o_orderdate) AS DOUBLE) FROM orders
)
"""


@register("unpivot_orders", oracle=_UNPIVOT_SQL, tags=("reshape",))
def unpivot_orders(spark, sf_dir):
    """Wide→long unpivot via ``stack`` (the melt operator; single pass,
    no shuffle — each input row emits k output rows)."""
    return t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr(
            "stack(3, 'totalprice', o_totalprice, "
            "'custkey', CAST(o_custkey AS DOUBLE), "
            "'order_year', CAST(YEAR(o_orderdate) AS DOUBLE)) AS (metric, value)"
        ),
    )


# --- Allen's interval algebra over session pairs (r10) --------------------------------

# Boundary comparisons in integer microseconds. Pairs are canonicalized
# so (a_start, a_end) <= (b_start, b_end) lexicographically BEFORE
# classification (r11 fix: pairs are enumerated user-id-ordered, which
# says nothing about time order — without the swap, a disjoint pair
# whose b-side precedes its a-side fell through to ELSE 'overlaps').
# With the canonical ordering the seven forward relations cover every
# configuration (inverses precede_by/met_by/overlapped_by/started_by/
# during/finishes map onto their forward twins), so the counts
# partition the pair set — a built-in completeness check.
_ALLEN_SWAP = "(b_start < a_start OR (b_start = a_start AND b_end < a_end))"
_ALLEN_CASE = """CASE
  WHEN a_end < b_start THEN 'precedes'
  WHEN a_end = b_start THEN 'meets'
  WHEN a_start = b_start AND a_end = b_end THEN 'equals'
  WHEN a_start = b_start AND a_end < b_end THEN 'starts'
  WHEN a_start = b_start THEN 'started_by'
  WHEN a_end = b_end AND a_start < b_start THEN 'finished_by'
  WHEN a_end = b_end THEN 'finishes'
  WHEN a_start < b_start AND a_end > b_end THEN 'contains'
  WHEN a_start > b_start AND a_end < b_end THEN 'during'
  ELSE 'overlaps' END"""

_ALLEN_SQL = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
), numbered AS (
  SELECT user_id, ts,
         CAST(SUM(is_new) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS session_id
  FROM flagged
), sess AS (
  SELECT user_id, session_id,
         epoch_us(MIN(ts)) AS s,
         epoch_us(MAX(ts)) + 1800000000 AS e
  FROM numbered GROUP BY 1, 2
), raw_pairs AS (
  SELECT a.s AS a_start, a.e AS a_end, b.s AS b_start, b.e AS b_end
  FROM sess a JOIN sess b
    ON a.s // 3600000000 = b.s // 3600000000
   AND a.user_id < b.user_id
), pairs AS (
  SELECT CASE WHEN {_ALLEN_SWAP} THEN b_start ELSE a_start END AS a_start,
         CASE WHEN {_ALLEN_SWAP} THEN b_end   ELSE a_end   END AS a_end,
         CASE WHEN {_ALLEN_SWAP} THEN a_start ELSE b_start END AS b_start,
         CASE WHEN {_ALLEN_SWAP} THEN a_end   ELSE b_end   END AS b_end
  FROM raw_pairs
)
SELECT {_ALLEN_CASE} AS relation,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM pairs GROUP BY 1
"""


@register("interval_allen_relations", oracle=_ALLEN_SQL, tags=("interval", "events"))
def interval_allen_relations(spark, sf_dir):
    """Allen's interval algebra (r10) — the 13-relation temporal
    vocabulary (precedes/meets/overlaps/starts/during/finishes/
    equals + inverses, inverses folded here by canonicalizing each
    pair so (a_start, a_end) <= (b_start, b_end) — user-id ordering
    only dedups the pair enumeration and says nothing about time
    order) classifying CROSS-USER session pairs that
    start in the same hour (the bucketed candidate enumeration of
    the interval join above — pair cost is bounded by per-bucket
    density, never sessions²):
    the formal footing under 'did these sessions overlap or merely
    touch?' questions that ad-hoc boundary predicates get subtly
    wrong (meets vs overlaps differ by ONE microsecond of shared
    boundary; same-user pairs would all be 'precedes' — the 30-minute
    gap DEFINES sessions). Comparisons are integer microseconds; the CASE ladder
    is shared verbatim by both engines; and because the relations
    PARTITION all possible configurations, the counts summing to the
    pair total is a built-in completeness proof. Pairs stay
    per-user (sessions-per-user bounded); one hash-agg closes."""
    from etlalchemy_spark.queries._util import sessionize

    ev = t(spark, sf_dir, "events")
    sess = (
        sessionize(ev)
        .groupBy("user_id", "session_id")
        .agg(
            F.unix_micros(F.min("ts")).alias("s"),
            (F.unix_micros(F.max("ts")) + 1800000000).alias("e"),
        )
    )
    a = sess.select(
        F.col("user_id").alias("ua"),
        (F.col("s") / 3600000000).cast("bigint").alias("hb"),
        F.col("s").alias("a_start"),
        F.col("e").alias("a_end"),
    )
    b = sess.select(
        F.col("user_id").alias("ub"),
        (F.col("s") / 3600000000).cast("bigint").alias("hb"),
        F.col("s").alias("b_start"),
        F.col("e").alias("b_end"),
    )
    raw = a.join(b, "hb").where(F.col("ua") < F.col("ub"))
    swap = F.expr(_ALLEN_SWAP)
    pairs = raw.select(
        F.when(swap, F.col("b_start")).otherwise(F.col("a_start")).alias("a_start"),
        F.when(swap, F.col("b_end")).otherwise(F.col("a_end")).alias("a_end"),
        F.when(swap, F.col("a_start")).otherwise(F.col("b_start")).alias("b_start"),
        F.when(swap, F.col("a_end")).otherwise(F.col("b_end")).alias("b_end"),
    )
    return pairs.groupBy(F.expr(_ALLEN_CASE).alias("relation")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    )


# --- pairwise overlap measure (r11) ---------------------------------------------------

_OVERLAP_MEASURE_SQL = """
WITH sessions AS (
  SELECT user_id,
         MIN(epoch_us(ts)) AS s,
         MAX(epoch_us(ts)) + 1800000000 AS e
  FROM (
    SELECT user_id, ts, event_id,
           SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
    FROM (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                  OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
  )
  GROUP BY user_id, session_no
),
pairs AS (
  SELECT a.hb,
         GREATEST(0, LEAST(a.e, b.e) - GREATEST(a.s, b.s)) AS ov
  FROM (SELECT user_id, s, e, s // 3600000000 AS hb FROM sessions) a
  JOIN (SELECT user_id, s, e, s // 3600000000 AS hb FROM sessions) b
    ON a.hb = b.hb AND a.user_id < b.user_id
)
SELECT CAST(hb AS BIGINT) AS hour_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(*) FILTER (WHERE ov > 0) AS BIGINT) AS n_overlapping,
       CAST(SUM(ov) AS BIGINT) AS sum_overlap_us,
       CAST(MAX(ov) AS BIGINT) AS max_overlap_us
FROM pairs
GROUP BY hb
ORDER BY hour_bucket
"""


@register("interval_overlap_measure", oracle=_OVERLAP_MEASURE_SQL,
          tags=("interval",))
def interval_overlap_measure(spark, sf_dir):
    """HOW MUCH sessions overlap, not just whether (the quantitative
    companion to `interval_allen_relations`'s 13-way classification):
    per start-hour bucket, the pair count, overlapping-pair count,
    total and max shared microseconds across cross-user session
    pairs — the concurrency-mass readout capacity planning reads.
    Same bucketed candidate enumeration as the interval join (pairs
    bounded by per-bucket density, never sessions²); the measure is
    GREATEST(0, LEAST(ends) - GREATEST(starts)) on exact integer
    microseconds, so every sum is int64-exact. One sessionize window
    + one bucket equi-join + one hash-agg."""
    from etlalchemy_spark.queries._util import sessionize

    ev = t(spark, sf_dir, "events")
    sess = (
        sessionize(ev)
        .groupBy("user_id", "session_id")
        .agg(
            F.unix_micros(F.min("ts")).alias("s"),
            (F.unix_micros(F.max("ts")) + 1800000000).alias("e"),
        )
        .select(
            "user_id", "s", "e",
            F.floor(F.col("s") / 3600000000).cast("bigint").alias("hb"),
        )
    )
    a = sess.select(
        F.col("user_id").alias("ua"), F.col("s").alias("sa"),
        F.col("e").alias("ea"), "hb",
    )
    b = sess.select(
        F.col("user_id").alias("ub"), F.col("s").alias("sb"),
        F.col("e").alias("eb"), "hb",
    )
    ov = F.greatest(
        F.lit(0).cast("bigint"),
        F.least(F.col("ea"), F.col("eb")) - F.greatest(F.col("sa"), F.col("sb")),
    )
    pairs = (
        a.join(b, "hb").where(F.col("ua") < F.col("ub")).select("hb", ov.alias("ov"))
    )
    return (
        pairs.groupBy("hb")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.count(F.when(F.col("ov") > 0, 1)).cast("bigint").alias("n_overlapping"),
            F.sum("ov").cast("bigint").alias("sum_overlap_us"),
            F.max("ov").cast("bigint").alias("max_overlap_us"),
        )
        .select(
            F.col("hb").alias("hour_bucket"), "n_pairs", "n_overlapping",
            "sum_overlap_us", "max_overlap_us",
        )
        .orderBy("hour_bucket")
    )
