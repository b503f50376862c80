"""Skew mitigation: salted aggregation and salted joins.

AQE's skew-join splitting (on in ``session.py``) handles most skew at
runtime, but two cases still need explicit salting at 100 TB:

- **Low-cardinality aggregation** (e.g. 3 distinct group keys): every
  mapper's partial output for a hot key lands on ONE reducer. Salting
  splits each key into ``n`` sub-groups, aggregates partially, then
  reduces the (tiny) per-salt partials in a second exact pass.
- **Hot-key shuffle joins** where the dim side is small enough to
  replicate ``n``× but too big to broadcast outright: replicate the
  build side across salts, route each probe row to one salt.

Both transforms are *result-invariant* in the salt: any decomposable
aggregate (sum/count/min/max) and any equi-join produce identical
results for every salt assignment, which is what makes them
oracle-checkable against plain SQL.

The probe-side salt is derived with ``pmod(xxhash64(cols...), n)`` —
deterministic in the DATA, not in partitioning (``rand()`` or
``monotonically_increasing_id()`` would make retried tasks
non-idempotent, corrupting shuffle retries at scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "_salt"


def with_salt(df: DataFrame, n: int, from_cols: list[str] | None = None) -> DataFrame:
    """Add a deterministic salt column in [0, n): hash of ``from_cols``
    (default: all columns)."""
    cols = from_cols or df.columns
    return df.withColumn(SALT, F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n)))


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    partial: dict[str, Column],
    final: dict[str, Column],
    n: int = 16,
) -> DataFrame:
    """Two-phase skew-proof aggregation.

    ``partial`` maps intermediate column name → aggregate over the raw
    rows (grouped by keys+salt); ``final`` maps output name → aggregate
    over those intermediates (grouped by keys). The caller supplies the
    decomposition (sum→sum of sums, count→sum of counts, avg→sum/sum).

    First shuffle spreads each hot key over ``n`` reducers; the second
    shuffle moves only ``n × |groups|`` pre-reduced rows.
    """
    salted = with_salt(df, n)
    phase1 = salted.groupBy(*keys, SALT).agg(
        *[expr.alias(name) for name, expr in partial.items()]
    )
    return phase1.groupBy(*keys).agg(*[expr.alias(name) for name, expr in final.items()])


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    n: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the build side replicated across ``n`` salts and
    each probe row routed to exactly one salt — a hot probe key spreads
    over ``n`` reducers instead of one. Build-side cost: ``n×``
    replication (use only when build is mid-sized: too big to
    broadcast, small enough to replicate).

    ``how`` is restricted to probe-side-preserving joins: right/full
    outer would emit every unmatched build row once per salt replica.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched build rows "
            f"would duplicate once per salt replica (allowed: inner/left/semi/anti)"
        )
    probe_s = with_salt(probe, n, from_cols=probe.columns)
    build_s = build.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(n - 1)).cast("array<bigint>"))
    )
    return probe_s.join(build_s, on + [SALT], how).drop(SALT)
