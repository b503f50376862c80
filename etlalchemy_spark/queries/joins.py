"""Join operator coverage: inner/left/full/semi/anti/cross/range/as-of.

SURVEY.md §2 Table B rows "Equi-join", "Semi/anti join", "Theta/range
join", "As-of join". Broadcast strategy: bounded dims are hinted;
fact-fact joins shuffle on their keys and rely on AQE for skew.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etlalchemy_spark.operators.asof import asof_join
from etlalchemy_spark.registry import register
from etlalchemy_spark.queries._util import dec, one, t, ts, RATE

_INNER_SQL = """
SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_orderstatus = 'O'
"""


@register("join_inner", oracle=_INNER_SQL, tags=("join",))
def join_inner(spark, sf_dir):
    """Fact ⋈ broadcast dim; no shuffle of the fact side at all."""
    orders = t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "O")
    cust = t(spark, sf_dir, "customer")
    return orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


_LEFT_SQL = """
SELECT c_custkey, c_name, o_orderkey, o_totalprice
FROM customer LEFT JOIN orders
  ON o_custkey = c_custkey AND o_orderstatus = 'F'
"""


@register("join_left", oracle=_LEFT_SQL, tags=("join",))
def join_left(spark, sf_dir):
    """Left outer with a join-side predicate (kept in ON, not WHERE —
    semantics differ, and this exercises Catalyst's null-producing path)."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    cond = (orders.o_custkey == cust.c_custkey) & (orders.o_orderstatus == "F")
    return cust.join(orders, cond, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


_SEMI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
)
"""


@register("join_semi", oracle=_SEMI_SQL, tags=("join",))
def join_semi(spark, sf_dir):
    """LEFT SEMI = EXISTS; emits each left row at most once, never widens."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


_ANTI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderstatus = 'P'
)
"""


@register("join_anti", oracle=_ANTI_SQL, tags=("join",))
def join_anti(spark, sf_dir):
    """LEFT ANTI = NOT EXISTS (customers with no pending orders) — also
    the engine's FK-orphan primitive (SURVEY.md Table A, M2 validation)."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "P")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


_FULL_SQL = """
WITH cn AS (
  SELECT c_nationkey AS nk, COUNT(*) AS n_customers
  FROM customer GROUP BY c_nationkey
), sn AS (
  SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers
  FROM supplier GROUP BY s_nationkey
)
SELECT COALESCE(cn.nk, sn.nk) AS nationkey, n_customers, n_suppliers
FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
"""


@register("join_full_outer", oracle=_FULL_SQL, tags=("join", "agg"))
def join_full_outer(spark, sf_dir):
    """Full outer between two aggregates; both sides null-producing."""
    cn = (
        t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    sn = (
        t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return cn.join(sn, cn.nk == sn.nk, "full").select(
        F.coalesce(cn.nk, sn.nk).alias("nationkey"), "n_customers", "n_suppliers"
    )


_CROSS_SQL = """
SELECT r_name, n_name FROM region CROSS JOIN nation
"""


@register("join_cross", oracle=_CROSS_SQL, tags=("join",))
def join_cross(spark, sf_dir):
    """Explicit cartesian product (both sides bounded dims)."""
    return t(spark, sf_dir, "region").crossJoin(t(spark, sf_dir, "nation")).select(
        "r_name", "n_name"
    )


_RANGE_SQL = """
SELECT
  o_orderpriority,
  COUNT(*) AS n_late_ship,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(8,4)))), 4) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("join_range", oracle=_RANGE_SQL, tags=("join", "agg"))
def join_range(spark, sf_dir):
    """Equi-join with a range residual (shipped >60 days after order).

    The equi key keeps this a hash join; the range predicate is applied
    as a post-probe residual filter — never a nested-loop.
    """
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    disc_price = dec("l_extendedprice") * (one() - dec("l_discount", RATE))
    return (
        li.join(
            orders,
            (li.l_orderkey == orders.o_orderkey)
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_late_ship"),
            F.sum(disc_price).cast("decimal(38,4)").cast("double").alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


_ASOF_SQL = """
SELECT l.event_id, l.user_id, l.ts,
       r.ts AS asof_ts, r.value AS asof_value
FROM (SELECT * FROM events WHERE event_type = 'click') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""


@register("join_asof", oracle=_ASOF_SQL, tags=("join", "asof"))
def join_asof(spark, sf_dir):
    """For each click, the user's most recent purchase at-or-before it.

    Implemented with the union-merge window operator (operators/asof.py):
    one shuffle on user_id, no join. DuckDB's native ASOF JOIN is the
    oracle.
    """
    ev = t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.where(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    return asof_join(
        clicks,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        payload_cols=["value"],
    )


_SALTED_JOIN_SQL = """
SELECT s_name,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l_discount AS DECIMAL(8,4)))), 4) AS DOUBLE)
         AS revenue
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
ORDER BY s_name
"""


@register("join_salted_skew", oracle=_SALTED_JOIN_SQL, tags=("join", "skew", "agg"))
def join_salted_skew(spark, sf_dir):
    """Hot-key join via salt replication: every lineitem row routes to
    one of 8 salted copies of its supplier, so a hot supplier spreads
    over 8 reducers. Salt-invariant → plain-SQL oracle. (Here supplier
    would broadcast anyway; the query pins the salted path to prove the
    mechanism for mid-sized build sides that exceed the broadcast
    threshold.)"""
    from etlalchemy_spark.operators.skew import salted_join

    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("suppkey"), "l_extendedprice", "l_discount"
    )
    sup = t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("suppkey"), "s_name"
    )
    joined = salted_join(li, sup, on=["suppkey"], n=8)
    rev = dec("l_extendedprice") * (one() - dec("l_discount", RATE))
    return (
        joined.groupBy("s_name")
        .agg(F.sum(rev).cast("decimal(38,4)").cast("double").alias("revenue"))
        .orderBy("s_name")
    )


_ASOF_TOL_SQL = """
SELECT event_id, user_id, ts,
       CASE WHEN asof_ts >= ts - INTERVAL 2 HOUR THEN asof_ts END AS asof_ts,
       CASE WHEN asof_ts >= ts - INTERVAL 2 HOUR THEN asof_value END AS asof_value
FROM (
  SELECT l.event_id, l.user_id, l.ts,
         r.ts AS asof_ts, r.value AS asof_value
  FROM (SELECT * FROM events WHERE event_type = 'click') l
  ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
    ON l.user_id = r.user_id AND l.ts >= r.ts
)
"""


@register("join_asof_tolerance", oracle=_ASOF_TOL_SQL, tags=("join", "asof"))
def join_asof_tolerance(spark, sf_dir):
    """As-of join with a 2-hour staleness bound (pandas merge_asof
    ``tolerance`` semantics): matches older than the bound null out."""
    ev = t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.where(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    return asof_join(
        clicks,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        payload_cols=["value"],
        tolerance="2 HOURS",
    )


# --- portable bloom-filter pre-join ----------------------------------------

from etlalchemy_spark.operators.bloom import (  # noqa: E402
    BLOOM_BITS,
    BLOOM_WORDS,
    N_HASHES,
    bloom_build,
    bloom_probe,
)
from etlalchemy_spark.operators.dedup import MINHASH_P as _BP, minhash_params as _bparams


def _bloom_be60(key_expr: str) -> str:
    u = f"md5_number_upper(CAST({key_expr} AS VARCHAR))"
    return f"""(CAST((
    (CAST(({u} >> 0)  & 255 AS UBIGINT) * 72057594037927936) +
    (CAST(({u} >> 8)  & 255 AS UBIGINT) * 281474976710656) +
    (CAST(({u} >> 16) & 255 AS UBIGINT) * 1099511627776) +
    (CAST(({u} >> 24) & 255 AS UBIGINT) * 4294967296) +
    (CAST(({u} >> 32) & 255 AS UBIGINT) * 16777216) +
    (CAST(({u} >> 40) & 255 AS UBIGINT) * 65536) +
    (CAST(({u} >> 48) & 255 AS UBIGINT) * 256) +
     CAST(({u} >> 56) & 255 AS UBIGINT)
  ) // 16 AS BIGINT) % {_BP})"""


_BLOOM_PARAMS = _bparams(N_HASHES, 99)
_BLOOM_POS = ", ".join(f"(({a} * h + {b}) % {_BP}) % {BLOOM_BITS}" for a, b in _BLOOM_PARAMS)
_BLOOM_WORD_AGGS = ",\n         ".join(
    f"bit_or(CASE WHEN p // 64 = {w} THEN (CAST(1 AS UBIGINT) << CAST(p % 64 AS INT))"
    f" ELSE CAST(0 AS UBIGINT) END) AS w{w}"
    for w in range(BLOOM_WORDS)
)
_BLOOM_WLIST = ", ".join(f"COALESCE(w{w}, CAST(0 AS UBIGINT))" for w in range(BLOOM_WORDS))
_BLOOM_PCOLS = ",\n         ".join(
    f"(({a} * h + {b}) % {_BP}) % {BLOOM_BITS} AS p{i}"
    for i, (a, b) in enumerate(_BLOOM_PARAMS)
)
_BLOOM_CHECKS = "\n   AND ".join(
    f"((wl[CAST(p{i} // 64 AS INT) + 1] >> CAST(p{i} % 64 AS INT)) & 1) = 1"
    for i in range(N_HASHES)
)

_BLOOM_SQL = f"""
WITH seg AS (
  SELECT c_custkey FROM customer WHERE c_acctbal < 0
), hh AS (
  SELECT {_bloom_be60("c_custkey")} AS h FROM seg
), pos AS (
  SELECT UNNEST([{_BLOOM_POS}]) AS p FROM hh
), words AS (
  SELECT {_BLOOM_WORD_AGGS}
  FROM pos
), wl AS (
  SELECT [{_BLOOM_WLIST}] AS wl FROM words
), probe AS (
  SELECT o_orderkey, o_custkey, {_bloom_be60("o_custkey")} AS h FROM orders
), ppos AS (
  SELECT o_orderkey, o_custkey,
         {_BLOOM_PCOLS}
  FROM probe
), pass AS (
  SELECT o_orderkey, o_custkey FROM ppos, wl
  WHERE {_BLOOM_CHECKS}
)
SELECT p.o_orderkey, p.o_custkey,
       (s.c_custkey IS NOT NULL) AS is_member
FROM pass p LEFT JOIN seg s ON p.o_custkey = s.c_custkey
"""


@register("join_bloom_prefilter", oracle=_BLOOM_SQL, tags=("join", "bloom", "scale"))
def join_bloom_prefilter(spark, sf_dir):
    """Runtime-filter semi-join: a 1024-bit portable bloom over the
    negative-balance customer segment broadcasts as ONE row; orders are
    discarded by bit arithmetic inside the scan stage before any
    shuffle. Survivors carry the exact verdict from a real semi-join —
    the rows flagged is_member=false are the bloom's false positives,
    visible and bounded. The whole structure (filter bits, probe,
    verdicts) hash-matches the oracle exactly."""
    from etlalchemy_spark.catalog import load_table_spread

    cust = t(spark, sf_dir, "customer")
    # footer-guarded spread: the probe is k salted md5 positions + bit
    # arithmetic PER ROW fused into the scan stage (that is the whole
    # point — no shuffle of orders), so on the fixture's single-row-
    # group file the entire battery ran on ONE core. Alternating
    # same-session A/B: 4.21 -> 1.13 s at sf0.1/32c; on real lake
    # layouts the guard adds nothing and the probe stays shuffle-free.
    orders = load_table_spread(spark, sf_dir, "orders")
    seg = cust.where(F.col("c_acctbal") < 0).select("c_custkey")
    bloom = bloom_build(seg, F.col("c_custkey"))
    probed = bloom_probe(orders, F.col("o_custkey"), bloom)
    passed = probed.where(F.col("bloom_pass")).select("o_orderkey", "o_custkey")
    member = seg.withColumn("_m", F.lit(True))
    return (
        passed.join(F.broadcast(member), passed.o_custkey == member.c_custkey, "left")
        .select(
            "o_orderkey",
            "o_custkey",
            F.coalesce(F.col("_m"), F.lit(False)).alias("is_member"),
        )
    )


_FUZZY_SQL = """
WITH names AS (SELECT DISTINCT p_name AS name FROM part)
SELECT a.name AS name_a, b.name AS name_b,
       CAST(levenshtein(a.name, b.name) AS INTEGER) AS dist
FROM names a JOIN names b
  ON a.name < b.name
 AND abs(length(a.name) - length(b.name)) <= 3
 AND levenshtein(a.name, b.name) <= 3
"""


@register("join_fuzzy_levenshtein", oracle=_FUZZY_SQL, tags=("join", "text"))
def join_fuzzy_levenshtein(spark, sf_dir):
    """Fuzzy self-join of part names within edit distance 3. The scale
    move is dedupe-before-quadratic: collapse the fact table to its
    distinct names FIRST (one hash aggregate), so the pairwise stage
    is |distinct|^2, not |rows|^2; a length-band predicate prunes
    pairs before the levenshtein call (integer edit distance —
    identical in any engine)."""
    p = t(spark, sf_dir, "part")
    names = p.select(F.col("p_name").alias("name")).distinct()
    a, b = names.alias("a"), names.alias("b")
    an, bn = F.col("a.name"), F.col("b.name")
    pairs = a.join(
        b,
        (an < bn)
        & (F.abs(F.length(an) - F.length(bn)) <= 3)
        & (F.levenshtein(an, bn) <= 3),
    )
    return pairs.select(
        an.alias("name_a"), bn.alias("name_b"), F.levenshtein(an, bn).alias("dist")
    )


_NULLSAFE_SQL = """
WITH a AS (
  SELECT NULLIF(o_orderstatus, 'O') AS k, COUNT(*) AS n_orders
  FROM orders GROUP BY 1
),
b AS (
  SELECT NULLIF(l_linestatus, 'O') AS k, COUNT(*) AS n_lines
  FROM lineitem GROUP BY 1
)
SELECT a.k AS k, n_orders, n_lines
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
"""


@register("join_null_safe", oracle=_NULLSAFE_SQL, tags=("joins",))
def join_null_safe(spark, sf_dir):
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing — the semantics dimension
    tables with 'unknown' members need. Catalyst plans it as a normal
    hash join on a null-tolerant key, so it broadcasts and
    AQE-optimizes exactly like an ordinary equi-join (no fallback to
    nested-loop, which a raw `a.k = b.k OR (both null)` predicate
    would cause)."""
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    a = orders.groupBy(
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("k")
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    b = li.groupBy(
        F.nullif(F.col("l_linestatus"), F.lit("O")).alias("kb")
    ).agg(F.count(F.lit(1)).alias("n_lines"))
    return a.join(b, a.k.eqNullSafe(b.kb)).select("k", "n_orders", "n_lines")


_DPP_SQL = """
SELECT o.o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 4) AS DOUBLE) AS total_price
FROM orders o
JOIN (SELECT DISTINCT o_orderpriority AS pr FROM orders
      WHERE o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%') d
  ON o.o_orderpriority = d.pr
GROUP BY o.o_orderpriority
"""


@register("join_dynamic_partition_pruning", oracle=_DPP_SQL, tags=("joins", "sources"))
def join_dynamic_partition_pruning(spark, sf_dir):
    """Dynamic partition pruning: the fact side is a Hive-partitioned
    lake table (partitioned by priority); the dim side's filter is only
    known at runtime, so Catalyst injects a dynamicpruning subquery
    into the fact scan's PartitionFilters — unmatched partitions are
    never read. At 100 TB this is the difference between scanning 2/5
    of the table and all of it; no query change needed, just the
    partitioned layout (the lake twin of the reference's M1 indexes)."""
    import os

    from etlalchemy_spark.queries._util import scratch_dir

    orders = t(spark, sf_dir, "orders")
    path = os.path.join(scratch_dir("dpp", sf_dir), "orders_by_priority")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        orders.write.mode("overwrite").partitionBy("o_orderpriority").parquet(path)
    fact = spark.read.parquet(path)
    dim = (
        orders.where(
            F.col("o_orderpriority").like("1-%") | F.col("o_orderpriority").like("2-%")
        )
        .select(F.col("o_orderpriority").alias("pr"))
        .distinct()
    )
    return (
        fact.join(dim, fact.o_orderpriority == dim.pr)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("decimal(38,4)")
            .cast("double")
            .alias("total_price"),
        )
    )


_LATERAL_SQL = """
SELECT n_name, c_custkey, c_name, c_acctbal
FROM nation,
LATERAL (SELECT c_custkey, c_name, c_acctbal FROM customer
         WHERE c_nationkey = n_nationkey
         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) top_c
"""


@register("join_lateral_topk", oracle=_LATERAL_SQL, tags=("joins", "lateral"))
def join_lateral_topk(spark, sf_dir):
    """Correlated lateral join (Spark 4 ``DataFrame.lateralJoin``): for
    each nation row the right side references that row's n_nationkey via
    ``.outer()`` and returns its top-2 customers by balance. Catalyst
    DECORRELATES the per-row LIMIT — the physical plan is a
    partial+final WindowGroupLimit over the customer side (map-side
    top-k pruning before the single shuffle on the correlation key)
    joined back to the broadcast outer — so at 100 TB this costs the
    same as the hand-written top-k-per-group window
    (window_topk_per_group), never a per-outer-row re-scan, while
    keeping the per-row subquery semantics users write naturally."""
    nation = t(spark, sf_dir, "nation")
    cust = t(spark, sf_dir, "customer")
    sub = (
        cust.where(F.col("c_nationkey") == F.col("n_nationkey").outer())
        .orderBy(F.desc("c_acctbal"), "c_custkey")
        .limit(2)
        .select("c_custkey", "c_name", "c_acctbal")
    )
    return nation.lateralJoin(sub).select("n_name", "c_custkey", "c_name", "c_acctbal")


_HINTED_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


@register("join_strategy_hints", oracle=_HINTED_SQL, tags=("join",))
def join_strategy_hints(spark, sf_dir):
    """Explicit physical-strategy control: the same equi-join forced
    onto SortMergeJoin with a ``merge`` hint. Hints are the practical
    override at 100 TB when statistics mislead the optimizer — e.g. a
    'small' dim that explodes after a selective-looking filter, where
    an auto-broadcast would OOM the executors; results are strategy-
    invariant (the oracle is the plain join), and the plan pin lives
    in tests/test_plans_hints.py: merge hint → SortMergeJoin,
    broadcast hint → BroadcastHashJoin, identical output either way."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(dec("l_extendedprice")).cast("decimal(38,4)").cast("double").alias("total_price"),
    )


_ASOF_NEAREST_SQL = """
WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
r AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'),
b AS (
  SELECT l.event_id, l.user_id, l.ts, rb.ts AS b_ts, rb.value AS b_value
  FROM l ASOF LEFT JOIN r rb ON l.user_id = rb.user_id AND l.ts >= rb.ts
),
f AS (
  SELECT l.event_id, rf.ts AS f_ts, rf.value AS f_value
  FROM l ASOF LEFT JOIN r rf ON l.user_id = rf.user_id AND l.ts <= rf.ts
)
SELECT b.event_id, b.user_id, b.ts,
       CASE WHEN b_ts IS NULL OR (f_ts IS NOT NULL
                 AND epoch_us(f_ts) - epoch_us(b.ts) < epoch_us(b.ts) - epoch_us(b_ts))
            THEN f_ts ELSE b_ts END AS asof_ts,
       CASE WHEN b_ts IS NULL OR (f_ts IS NOT NULL
                 AND epoch_us(f_ts) - epoch_us(b.ts) < epoch_us(b.ts) - epoch_us(b_ts))
            THEN f_value ELSE b_value END AS asof_value
FROM b JOIN f USING (event_id)
"""


@register("join_asof_nearest", oracle=_ASOF_NEAREST_SQL, tags=("join", "asof"))
def join_asof_nearest(spark, sf_dir):
    """pandas merge_asof(direction='nearest') semantics: each click
    pairs with the user's temporally CLOSEST purchase, past or future;
    exact ties go backward (the prior purchase), matching pandas. One
    backward + one forward pass of the union-merge window operator —
    two shuffles on user_id, zero joins engine-side; distances compare
    as exact integer microseconds. The oracle composes DuckDB's native
    backward and forward ASOF joins with the same tie rule."""
    from etlalchemy_spark.operators.asof import asof_join_nearest

    ev = t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.where(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    return asof_join_nearest(
        clicks, purchases, on="user_id", left_ts="ts", right_ts="ts",
        payload_cols=["value"],
    )
