"""Slowly-changing-dimension Type 2 merge.

The reference migrates snapshots wholesale; a warehouse-grade engine
needs the incremental counterpart: apply a new snapshot to a versioned
dimension, closing changed rows and appending new versions, keeping
full history.

One full-outer join on the business key + column comparisons — no
window, no per-key iteration. At 100 TB both sides hash-partition on
the key once; history tables bucketed on the key make the join
exchange-free (see fmt_bucketed_join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

VALID_FROM, VALID_TO, IS_CURRENT = "valid_from", "valid_to", "is_current"


def scd2_init(snapshot: DataFrame, effective: str) -> DataFrame:
    """Bootstrap a versioned dimension from a first snapshot."""
    return snapshot.select(
        "*",
        F.lit(effective).cast("timestamp").alias(VALID_FROM),
        F.lit(None).cast("timestamp").alias(VALID_TO),
        F.lit(True).alias(IS_CURRENT),
    )


def _any_differs(tracked: list[str], a: str, b: str) -> Column:
    """NULL-safe inequality over the tracked attribute set."""
    cond = F.lit(False)
    for c in tracked:
        cond = cond | ~F.col(f"{a}.{c}").eqNullSafe(F.col(f"{b}.{c}"))
    return cond


def scd2_merge(
    dim: DataFrame,
    snapshot: DataFrame,
    key: str,
    tracked: list[str],
    effective: str,
) -> DataFrame:
    """Apply ``snapshot`` (current truth) to the versioned ``dim``.

    Row fates: history rows pass through; current rows with a changed
    or vanished key close (``valid_to = effective``); changed and
    brand-new keys append a fresh current version. Unchanged current
    rows pass through.
    """
    eff = F.lit(effective).cast("timestamp")
    history = dim.where(~F.col(IS_CURRENT))
    # explicit presence flags, NOT key-null checks: a legitimately-NULL
    # business key must still route through the fates below (and the
    # join itself is null-safe so NULL matches NULL)
    current = dim.where(F.col(IS_CURRENT)).withColumn("_cur_present", F.lit(True)).alias("cur")
    snap = snapshot.withColumn("_new_present", F.lit(True)).alias("new")

    j = current.join(snap, F.col(f"cur.{key}").eqNullSafe(F.col(f"new.{key}")), "full_outer")
    changed = _any_differs(tracked, "cur", "new")
    in_cur = F.col("cur._cur_present").eqNullSafe(F.lit(True))
    in_new = F.col("new._new_present").eqNullSafe(F.lit(True))

    closes = (
        j.where(in_cur & (~in_new | changed))
        .select("cur.*")
        .drop("_cur_present")
        .withColumn(VALID_TO, eff)
        .withColumn(IS_CURRENT, F.lit(False))
    )
    keeps = j.where(in_cur & in_new & ~changed).select("cur.*").drop("_cur_present")
    inserts = (
        j.where(in_new & (~in_cur | changed))
        .select("new.*")
        .drop("_new_present")
        .select(
            "*",
            eff.alias(VALID_FROM),
            F.lit(None).cast("timestamp").alias(VALID_TO),
            F.lit(True).alias(IS_CURRENT),
        )
    )
    return history.unionByName(closes).unionByName(keeps).unionByName(inserts)
