"""Scalable global-order operators (two-phase range-bucketed prefix).

A Window with ORDER BY and no PARTITION BY forces every row through a
single partition (Spark's WindowExec warns, and at 100 TB it simply
does not run). These helpers compute the same global-order results with
a plan that stays parallel end to end:

1. **Bucket** rows by range on the order key: quantile bounds are
   estimated in one pass (``approxQuantile``), baked into the plan as
   literals, and rows are assigned a bucket id with a pure expression
   (count of bounds below the key). Equal keys always share a bucket,
   so ties never straddle a boundary — rank/dense_rank stay exact.
2. **Local pass**: the expensive window runs partitioned by bucket id
   (parallel, whole-stage codegen).
3. **Prefix pass**: per-bucket aggregates (row counts, distinct-key
   counts, sums, maxes — one tiny row per bucket) feed an IN-PLAN
   exclusive-prefix combine: a triangular broadcast self-join over the
   ≤ n_buckets stats rows (no driver collect, no extra blocking job —
   the stats subtree plans with the main query). No WindowExec anywhere —
   Spark 4's optimizer strips foldable partition expressions, so even
   a ``partitionBy(lit(0))`` window would execute single-partition and
   warn; this formulation has no window to warn about.
4. **Combine**: broadcast-join the per-bucket offsets back and merge
   (add for counts/sums, greatest/least for max/min).

Bounds are plan literals, so the bucket assignment is deterministic
even if the stage is recomputed — no cached shuffle to trust; the
offsets are deterministic aggregates of the (bounds-literal) bucket
assignment.

Each operator materializes its input ONCE (lazy localCheckpoint) before
the bounds pass: the machinery reads the frame three times (quantile
bounds, per-bucket stats collect, final bucketed window), and without
the cut the whole upstream plan re-executes per read. At sf0.1 the A/B
is roughly neutral (the three reads were small scans overlapping on
idle cores: alternating-run totals 8.36 s uncut vs 7.70-8.50 s cut over
four prefix-heavy bench queries, r13 optimization round) — the change
is kept for the scale shape: upstream of a global-order operator is
typically a full shuffle/aggregate pipeline, and at 100 TB re-running
it twice more costs two extra corpus passes, while the materialized
pre-window frame is narrow (key + value columns). Same policy as the
iterative graph operators' per-superstep cuts.

The DOUBLE cast of the key is used ONLY for bucket assignment (the
quantile machinery needs one numeric axis); all ordering inside a
bucket is by the NATIVE key column. Casting to double is monotone
(non-strictly) for every numeric type, so bucket order is consistent
with native order, and native keys that collide as doubles (distinct
int64s above 2^53 — e.g. 64-bit content hashes used as ordering keys)
merely share a bucket, where the native-typed window still separates
them exactly. Ordering by the double itself would silently merge such
keys into one rank/prefix group (r7 verdict finding).

Reference parity note: the reference (seanharr11/etlalchemy) has no
window/rank surface at all (SURVEY.md §2 Table B); this module is part
of the mandated relational layer, engineered for the 100 TB target.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def range_bounds(df: DataFrame, key_num: Column, n_buckets: int = 32) -> list[float]:
    """Approximate quantile split points for ``key_num`` (any numeric or
    castable-to-double expression), deduplicated and sorted. One
    aggregate-only pass; the result (≤ n_buckets-1 doubles) lives on the
    driver and is baked into downstream plans as literals."""
    if n_buckets <= 1:
        return []  # degenerate single bucket: no split points, no pass
    tmp = df.select(key_num.cast("double").alias("_k")).where(F.col("_k").isNotNull())
    probs = [i / n_buckets for i in range(1, n_buckets)]
    raw = tmp.approxQuantile("_k", probs, 0.001)
    out: list[float] = []
    for b in raw:
        if not out or b > out[-1]:
            out.append(b)
    return out


def bucket_id(key_num: Column, bounds: list[float]) -> Column:
    """Range-bucket assignment as a pure expression: the number of split
    points strictly below the key. Equal keys ⇒ equal bucket."""
    pid = F.lit(0)
    for b in bounds:
        pid = pid + F.when(key_num.cast("double") > F.lit(b), 1).otherwise(0)
    return pid.cast("int")


def _exclusive_prefix_frame(stats: DataFrame, combines: list[tuple[str, str, str]]) -> DataFrame:
    """Exclusive-prefix offsets per ``_pid`` over the per-bucket stats
    (≤ n_buckets rows), computed IN-PLAN: a triangular self-join
    (s2._pid < s1._pid) + one aggregate per combine. ``combines``:
    (src_col, out_col, kind) with kind in {sum, max}; empty prefixes
    yield NULL (callers coalesce — SUM/MAX over the left join's
    no-match NULLs reproduce the old Python accumulator's None).

    This used to collect() the stats to the driver and re-emit them as
    a literal frame — one extra driver-BLOCKING job plus a Py4J/plan
    roundtrip per prefix operator, serialized between the bounds pass
    and the main query (r13 optimization round: the prefix-based bench
    queries spent 2-3 s in eager plan-build actions). In-plan, the
    stats subtree feeds the broadcast join directly: the per-bucket
    aggregate is planned WITH the main query (its exchange is shared
    across the two join sides via ReusedExchange) and no intermediate
    action blocks the driver. Integer/decimal SUM and MAX re-associate
    exactly, so results are bit-identical to the collected version."""
    s1 = stats.select("_pid")
    s2 = stats.select(
        F.col("_pid").alias("_pid2"),
        *[F.col(src).alias(f"_src_{o}") for src, o, _ in combines],
    )
    # explicit broadcast: the stats subtree descends from a checkpoint
    # (no size stats), and the triangular condition is non-equi — the
    # hint pins BroadcastNestedLoopJoin over ≤ n_buckets rows
    joined = s1.join(F.broadcast(s2), F.col("_pid2") < F.col("_pid"), "left")
    aggs = [
        (F.sum(f"_src_{o}") if kind == "sum" else F.max(f"_src_{o}")).alias(o)
        for _, o, kind in combines
    ]
    return joined.groupBy("_pid").agg(*aggs)


def global_ranks(
    df: DataFrame,
    key_num: Column,
    tie_cols: list[str],
    n_buckets: int = 32,
) -> DataFrame:
    """Append ``rn`` (row_number over (key, ties)), ``rnk`` (rank over
    key) and ``drnk`` (dense_rank over key) for the global ascending
    order of ``key_num`` — same results as an unpartitioned window,
    fully parallel. Pass a negated key for descending order.

    NULL keys follow Spark's ascending-window semantics (NULLS FIRST:
    they land in bucket 0 and rank lowest, forming one dense-rank
    group). Note the negated-key descending trick therefore orders
    NULLs FIRST, whereas SQL ``DESC`` defaults to NULLS LAST — filter
    NULLs out beforehand if descending SQL parity is required."""
    d = df.withColumn("_ko", key_num).withColumn("_k", F.col("_ko").cast("double"))
    # one materialization, three readers (bounds / stats / window) — see
    # module docstring
    d = d.localCheckpoint(eager=False)
    bounds = range_bounds(d, F.col("_k"), n_buckets)
    d = d.withColumn("_pid", bucket_id(F.col("_k"), bounds))

    # count_distinct excludes NULLs, but NULL keys form a real
    # dense-rank group in the window they offset — count it explicitly
    # or every later bucket's dense offset comes up one short.
    # Distinctness is over the NATIVE key: two int64 keys that collide
    # as doubles are still two dense-rank groups.
    stats = d.groupBy("_pid").agg(
        F.count(F.lit(1)).alias("_n"),
        (
            F.count_distinct(F.col("_ko"))
            + F.max(F.when(F.col("_ko").isNull(), 1).otherwise(0))
        ).alias("_nd"),
    )
    offs = _exclusive_prefix_frame(
        stats, [("_n", "_row_off", "sum"), ("_nd", "_dense_off", "sum")]
    ).fillna({"_row_off": 0, "_dense_off": 0})

    w_rn = Window.partitionBy("_pid").orderBy(F.col("_ko"), *[F.col(c) for c in tie_cols])
    w_key = Window.partitionBy("_pid").orderBy(F.col("_ko"))
    return (
        d.join(F.broadcast(offs), "_pid")
        .withColumn("rn", F.row_number().over(w_rn) + F.col("_row_off"))
        .withColumn("rnk", F.rank().over(w_key) + F.col("_row_off"))
        .withColumn("drnk", F.dense_rank().over(w_key) + F.col("_dense_off"))
        .drop("_pid", "_k", "_ko", "_row_off", "_dense_off")
    )


def running_global_sum(
    df: DataFrame,
    key_num: Column,
    tie_cols: list[str],
    value: Column,
    alias: str = "running",
    n_buckets: int = 32,
) -> DataFrame:
    """Append a running SUM(``value``) over the global order
    (key_num asc, ties) — the scalable twin of
    ``SUM(v) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)``.
    ``value`` should be decimal for cross-engine exactness (the
    per-bucket offsets re-add partial sums in a different grouping than
    a serial scan would)."""
    d = (
        df.withColumn("_ko", key_num)
        .withColumn("_k", F.col("_ko").cast("double"))
        .withColumn("_v", value)
    )
    d = d.localCheckpoint(eager=False)  # one materialization, three readers
    bounds = range_bounds(d, F.col("_k"), n_buckets)
    d = d.withColumn("_pid", bucket_id(F.col("_k"), bounds))

    totals = d.groupBy("_pid").agg(F.sum("_v").alias("_bucket_sum"))
    offs = _exclusive_prefix_frame(totals, [("_bucket_sum", "_off", "sum")])

    w = (
        Window.partitionBy("_pid")
        .orderBy(F.col("_ko"), *[F.col(c) for c in tie_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = F.sum("_v").over(w)
    return (
        d.join(F.broadcast(offs), "_pid")
        .withColumn(alias, local + F.coalesce(F.col("_off"), F.lit(0).cast("decimal(1,0)")))
        .drop("_pid", "_k", "_ko", "_v", "_off")
    )


def running_global_sums(
    df: DataFrame,
    key_num: Column,
    tie_cols: list[str],
    values: list[tuple[Column, str]],
    n_buckets: int = 32,
) -> DataFrame:
    """Running sums of SEVERAL value columns over ONE global order in
    ONE pass: same bucket machinery as running_global_sum, with the
    per-bucket totals aggregate, the prefix frame, and the bucket
    window all carrying every value column (``values`` is a list of
    (decimal expression, output alias)). Callers needing k running
    sums previously chained k single-value passes, re-executing the
    upstream plan k times — e.g. the two-sample ECDF pair the KS drift
    test needs."""
    d = df.withColumn("_ko", key_num).withColumn("_k", F.col("_ko").cast("double"))
    names = []
    for expr, alias in values:
        d = d.withColumn(f"_v_{alias}", expr)
        names.append(alias)
    d = d.localCheckpoint(eager=False)  # one materialization, three readers
    bounds = range_bounds(d, F.col("_k"), n_buckets)
    d = d.withColumn("_pid", bucket_id(F.col("_k"), bounds))

    totals = d.groupBy("_pid").agg(
        *[F.sum(f"_v_{a}").alias(f"_bs_{a}") for a in names]
    )
    offs = _exclusive_prefix_frame(
        totals, [(f"_bs_{a}", f"_off_{a}", "sum") for a in names]
    )

    w = (
        Window.partitionBy("_pid")
        .orderBy(F.col("_ko"), *[F.col(c) for c in tie_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = d.join(F.broadcast(offs), "_pid")
    for a in names:
        out = out.withColumn(
            a,
            F.sum(f"_v_{a}").over(w)
            + F.coalesce(F.col(f"_off_{a}"), F.lit(0).cast("decimal(1,0)")),
        )
    return out.drop(
        "_pid", "_k", "_ko", *[f"_v_{a}" for a in names], *[f"_off_{a}" for a in names]
    )


def running_global_max(
    df: DataFrame,
    key_num: Column,
    tie_cols: list[str],
    value: Column,
    alias: str = "running_max",
    n_buckets: int = 32,
) -> DataFrame:
    """Append a running MAX(``value``) over the global order — the
    scalable twin of ``MAX(v) OVER (ORDER BY ... ROWS UNBOUNDED
    PRECEDING)``. Max is idempotent, so no exactness caveats."""
    d = (
        df.withColumn("_ko", key_num)
        .withColumn("_k", F.col("_ko").cast("double"))
        .withColumn("_v", value)
    )
    d = d.localCheckpoint(eager=False)  # one materialization, three readers
    bounds = range_bounds(d, F.col("_k"), n_buckets)
    d = d.withColumn("_pid", bucket_id(F.col("_k"), bounds))

    totals = d.groupBy("_pid").agg(F.max("_v").alias("_bucket_max"))
    offs = _exclusive_prefix_frame(totals, [("_bucket_max", "_off", "max")])

    w = (
        Window.partitionBy("_pid")
        .orderBy(F.col("_ko"), *[F.col(c) for c in tie_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = F.max("_v").over(w)
    return (
        d.join(F.broadcast(offs), "_pid")
        .withColumn(alias, F.greatest(local, F.coalesce(F.col("_off"), local)))
        .drop("_pid", "_k", "_ko", "_v", "_off")
    )


def ranks_and_running_sum(
    df: DataFrame,
    key_num: Column,
    tie_cols: list[str],
    value: Column,
    alias: str = "running",
    n_buckets: int = 32,
) -> DataFrame:
    """``global_ranks`` AND ``running_global_sum`` over the SAME order
    in one fused pass: one bounds estimate, one per-bucket stats
    aggregate (row count, distinct keys, bucket sum), one bucket
    window. Callers that need both (e.g. a frequency table ranked with
    cumulative coverage) previously chained the two operators, which
    re-executed the upstream plan once per internal pass — ~5
    recomputations of the dominant upstream aggregate (r8 review).
    Same semantics as the two operators composed."""
    d = (
        df.withColumn("_ko", key_num)
        .withColumn("_k", F.col("_ko").cast("double"))
        .withColumn("_v", value)
    )
    d = d.localCheckpoint(eager=False)  # one materialization, three readers
    bounds = range_bounds(d, F.col("_k"), n_buckets)
    d = d.withColumn("_pid", bucket_id(F.col("_k"), bounds))

    stats = d.groupBy("_pid").agg(
        F.count(F.lit(1)).alias("_n"),
        (
            F.count_distinct(F.col("_ko"))
            + F.max(F.when(F.col("_ko").isNull(), 1).otherwise(0))
        ).alias("_nd"),
        F.sum("_v").alias("_bucket_sum"),
    )
    offs = _exclusive_prefix_frame(
        stats,
        [("_n", "_row_off", "sum"), ("_nd", "_dense_off", "sum"),
         ("_bucket_sum", "_off", "sum")],
    ).fillna({"_row_off": 0, "_dense_off": 0})

    w_rn = Window.partitionBy("_pid").orderBy(F.col("_ko"), *[F.col(c) for c in tie_cols])
    w_key = Window.partitionBy("_pid").orderBy(F.col("_ko"))
    w_sum = w_rn.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        d.join(F.broadcast(offs), "_pid")
        .withColumn("rn", F.row_number().over(w_rn) + F.col("_row_off"))
        .withColumn("rnk", F.rank().over(w_key) + F.col("_row_off"))
        .withColumn("drnk", F.dense_rank().over(w_key) + F.col("_dense_off"))
        .withColumn(
            alias,
            F.sum("_v").over(w_sum)
            + F.coalesce(F.col("_off"), F.lit(0).cast("decimal(1,0)")),
        )
        .drop("_pid", "_k", "_ko", "_v", "_row_off", "_dense_off", "_off")
    )
