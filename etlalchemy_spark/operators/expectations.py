"""Data-quality expectations: declarative row rules with quarantine
routing and a one-pass violation report.

The dbt-test / Delta-Live-Tables "expectations" idea as an operator:
a pipeline declares named boolean rules; rows failing ANY rule are
routed to a quarantine output carrying the names of the rules they
failed (so a human can triage by rule, and a replay after a fix can
re-admit them), rows passing all rules continue downstream. The spirit
is the reference's "clean the data while it moves" stance (upstream
ETLAlchemySource cleaning hooks, ≈ETLAlchemySource.py L400-500) made
declarative.

NULL discipline: an expectation that evaluates to NULL (e.g. a
comparison against a NULL column) is a FAILURE, not a pass — unknown
data is exactly what quarantine exists for. Implemented as
``coalesce(pred, false)`` so the semantics are explicit and
engine-portable.

Scale shape: everything is pure Column expressions over one scan —
the failed-rules array is built row-local, the pass/quarantine split
is two narrow filters on one cached/exchanged relation, and the
report is a single partial+final aggregate of N conditional counts
(one number per rule, no per-rule scans)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_FAILED = "_failed_rules"


def _holds(pred: Column) -> Column:
    return F.coalesce(pred, F.lit(False))


def with_expectations(df: DataFrame, rules: list[tuple[str, Column]]) -> DataFrame:
    """Annotate every row with the (declaration-ordered) array of rule
    names it FAILS — empty array means the row is clean."""
    failed = F.filter(
        F.array(*[F.when(~_holds(pred), F.lit(name)) for name, pred in rules]),
        lambda x: x.isNotNull(),
    )
    return df.withColumn(_FAILED, failed)


def split_quarantine(
    df: DataFrame, rules: list[tuple[str, Column]]
) -> tuple[DataFrame, DataFrame]:
    """(passed, quarantined): quarantined rows keep the failed-rule
    names; passed rows drop the bookkeeping column."""
    annotated = with_expectations(df, rules)
    passed = annotated.where(F.size(_FAILED) == 0).drop(_FAILED)
    quarantined = annotated.where(F.size(_FAILED) > 0)
    return passed, quarantined


def expectation_report(df: DataFrame, rules: list[tuple[str, Column]]) -> DataFrame:
    """Per-rule violation counts in ONE aggregate pass: (rule,
    n_violations, n_rows, violation_rate). The monitoring face of the
    same rules — at 100 TB this is a map-side-combinable single scan
    regardless of how many rules are declared."""
    agg = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            F.sum(F.when(~_holds(pred), 1).otherwise(0)).alias(f"_v_{i}")
            for i, (name, pred) in enumerate(rules)
        ],
    )
    # ONE aggregated row exploded into one row per rule — a UNION of
    # per-rule selects would re-plan the scan N times
    return agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("rule"),
                        F.col(f"_v_{i}").alias("n_violations"),
                        F.col("n_rows").alias("n_rows"),
                        (F.col(f"_v_{i}").cast("double") / F.col("n_rows")).alias(
                            "violation_rate"
                        ),
                    )
                    for i, (name, _pred) in enumerate(rules)
                ]
            )
        ).alias("r")
    ).select("r.*")
