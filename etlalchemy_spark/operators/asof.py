"""As-of join: for each left row, the most recent right row at-or-before it.

Spark has no native batch as-of join (SURVEY.md §2 Table B). This is the
union-merge formulation: tag both sides, sort-merge within each key
partition by (ts, side), and carry the latest right-side payload forward
with ``last(..., ignorenulls=True)`` over an unbounded-preceding window.

Cost model: ONE shuffle on the key (the window partition), no join at
all — strictly cheaper than the naive range-join (which Spark would plan
as a broadcast-nested-loop). Scales to arbitrary key cardinality; skewed
keys behave like any window skew (AQE cannot split a window partition,
so extremely hot keys would need pre-bucketing by time range).

Right rows sort BEFORE left rows at equal timestamps (side marker 0 < 1),
giving the conventional inclusive semantics: right.ts <= left.ts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    prefix: str = "asof_",
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join. Returns ``left`` columns plus, per payload col,
    ``{prefix}{col}`` = value from the latest right row with
    ``right[right_ts] <= left[left_ts]`` and matching ``on`` key
    (NULL when no such row), plus ``{prefix}ts`` = its timestamp.

    ``tolerance`` (SQL interval string, e.g. ``'2 hours'``): matches
    staler than it are nulled out — the pandas ``merge_asof`` /
    kdb ``wj`` staleness bound.

    ``direction='forward'`` (r9) flips the inequality: the EARLIEST
    right row with ``right[right_ts] >= left[left_ts]`` — the same
    union-merge window run over descending time (equal-ts right rows
    still qualify on both directions, mirroring pandas); tolerance
    then bounds how far into the future a match may sit.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lcols = left.columns
    # Name-collision guards (same policy as bloom_probe): the internal
    # markers would silently OVERWRITE same-named left columns, and an
    # output column clashing with an existing left column (e.g. a
    # chained asof_join with the default prefix) would emit duplicate/
    # ambiguous columns.
    reserved = {"_side", "_asof", "_stale"}
    clash = reserved & set(lcols)
    if clash:
        raise ValueError(
            f"asof_join: left columns {sorted(clash)} collide with the "
            "operator's internal marker columns — rename them first"
        )
    out_cols = {f"{prefix}ts", *[f"{prefix}{c}" for c in payload_cols]}
    clash = out_cols & set(lcols)
    if clash:
        raise ValueError(
            f"asof_join: output columns {sorted(clash)} already exist on "
            "the left side (chained as-of joins need distinct prefixes)"
        )
    l = left.withColumn("_side", F.lit(1))
    # The whole right row travels as ONE struct so last(ignorenulls)
    # carries it atomically: per-column carries would backfill a NULL
    # payload value from an OLDER right row, stitching together columns
    # from different rows (wrong vs ASOF semantics).
    r = right.select(
        F.col(on),
        F.col(right_ts).alias(left_ts),
        F.lit(0).alias("_side"),
        F.struct(
            F.col(right_ts).alias("ts"),
            *[F.col(c) for c in payload_cols],
        ).alias("_asof"),
    )
    l = l.withColumn("_asof", F.lit(None).cast(r.schema["_asof"].dataType))
    r_aligned = r
    for c in lcols:
        if c not in (on, left_ts):
            r_aligned = r_aligned.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = l.select(r_aligned.columns).unionByName(r_aligned)

    order = (
        [F.col(left_ts), F.col("_side")]
        if direction == "backward"
        else [F.col(left_ts).desc(), F.col("_side")]
    )
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = u.withColumn("_asof", F.last("_asof", ignorenulls=True).over(w))
    carried = [f"{prefix}ts"] + [f"{prefix}{c}" for c in payload_cols]
    out = u.where(F.col("_side") == 1).select(
        *lcols,
        F.col("_asof.ts").alias(f"{prefix}ts"),
        *[F.col(f"_asof.{c}").alias(f"{prefix}{c}") for c in payload_cols],
    )
    if tolerance is not None:
        # evaluate staleness ONCE before any payload column is nulled —
        # a per-column withColumn(when(stale,...)) would re-derive the
        # predicate from the already-nulled {prefix}ts
        stale = (
            F.col(f"{prefix}ts") < F.col(left_ts) - F.expr(f"INTERVAL {tolerance}")
            if direction == "backward"
            else F.col(f"{prefix}ts") > F.col(left_ts) + F.expr(f"INTERVAL {tolerance}")
        )
        out = out.withColumn("_stale", stale)
        for c in carried:
            out = out.withColumn(c, F.when(F.col("_stale"), F.lit(None)).otherwise(F.col(c)))
        out = out.drop("_stale")
    return out


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """pandas ``merge_asof(direction='nearest')``: per left row, the
    right row minimizing |right_ts − left_ts|; exact ties go BACKWARD
    (the prior row), matching pandas. Composed from one backward and
    one forward pass of the union-merge window operator — two shuffles
    on the key, still no join; distances compare as exact
    integer microseconds."""
    b = asof_join(left, right, on, left_ts, right_ts, payload_cols, prefix="_b_")
    f2 = asof_join(b, right, on, left_ts, right_ts, payload_cols, prefix="_f_",
                   direction="forward")
    bd = F.unix_micros(F.col(left_ts)) - F.unix_micros(F.col("_b_ts"))
    fd = F.unix_micros(F.col("_f_ts")) - F.unix_micros(F.col(left_ts))
    take_fwd = F.col("_b_ts").isNull() | (F.col("_f_ts").isNotNull() & (fd < bd))
    out = f2
    for c in ["ts"] + payload_cols:
        out = out.withColumn(
            f"{prefix}{c}",
            F.when(take_fwd, F.col(f"_f_{c}")).otherwise(F.col(f"_b_{c}")),
        )
    return out.drop(*[f"_b_{c}" for c in ["ts"] + payload_cols],
                    *[f"_f_{c}" for c in ["ts"] + payload_cols])
