"""Data-driven type standardization — the reference's core novel compute.

Re-expresses ops T1–T8 of the reference's ``standardize_column_type`` /
``add_or_eliminate_column`` (upstream seanharr11/etlalchemy,
ETLAlchemySource.py ≈L150–550; see SURVEY.md §0 for the citation
caveat): observe the data, then

- T2  pick the narrowest integer type that fits (min/max scan)
- T3  infer boolean for integer columns whose values ⊆ {0, 1}
- T4  right-size VARCHAR to the next power of two ≥ max observed length
- T8  eliminate columns that are entirely NULL
- T9  drop columns by name suffix (rule-driven, no scan)

The reference fetches every row into driver memory and loops in Python.
Here ALL observation happens in ONE distributed aggregate pass per
table (a single ``df.agg`` with 2–4 expressions per column → one job,
no shuffle beyond the final partial-merge), and decisions compile to
``cast``/``drop`` — so the whole pass scales to 100 TB: cost is one
full scan, bandwidth-bound, with column pruning inapplicable (we need
every column) but predicate-free.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

INT_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)

# Narrowest-int ladder: (spark type name, min, max) — mirrors the
# reference's BIT/TINYINT/SMALLINT/INT/BIGINT ladder (T2).
_INT_LADDER = [
    ("tinyint", -(2**7), 2**7 - 1),
    ("smallint", -(2**15), 2**15 - 1),
    ("int", -(2**31), 2**31 - 1),
    ("bigint", -(2**63), 2**63 - 1),
]


def next_pow2(n: int) -> int:
    """Smallest power of two ≥ n (n ≤ 1 → 1) — the reference's
    ``get_nearest_power_of_two`` VARCHAR rounding (T4)."""
    if n <= 1:
        return 1
    return 1 << (n - 1).bit_length()


@dataclass
class ColumnDecision:
    name: str
    source_type: str
    action: str  # "keep" | "cast" | "drop_empty" | "drop_suffix"
    target_type: str | None = None
    varchar_n: int | None = None  # recorded for DDL sinks; Spark stays StringType
    stats: dict = field(default_factory=dict)


def stats_exprs(df: DataFrame) -> list:
    """The single-pass observation expressions for every column."""
    # total row count: distinguishes a 0-ROW table (standardize is a
    # no-op — dropping every column of an empty partition would destroy
    # the schema) from a populated table with all-NULL columns (T8's
    # actual target)
    exprs: list = [F.count(F.lit(1)).alias("__total")]
    for f in df.schema.fields:
        c, dt = f.name, f.dataType
        exprs.append(F.count(F.col(c)).alias(f"{c}__n"))
        if isinstance(dt, INT_TYPES):
            exprs.append(F.min(c).alias(f"{c}__min"))
            exprs.append(F.max(c).alias(f"{c}__max"))
            # all-01: max(0/1 indicator of "value outside {0,1}") == 0.
            # NULL must count as inside (isin alone yields NULL for NULL
            # input → otherwise(1) would block inference on any
            # nullable flag column)
            exprs.append(
                F.max(
                    F.when(F.col(c).isNull() | F.col(c).isin(0, 1), 0).otherwise(1)
                ).alias(f"{c}__not01")
            )
        elif isinstance(dt, T.StringType):
            exprs.append(F.max(F.length(c)).alias(f"{c}__maxlen"))
        # floats/decimals: no stats — decide() passes them through
        # unconditionally (T5), so min/max here was dead aggregate work
        # on the one-pass scan this module advertises as the cost center
    return exprs


def observe(df: DataFrame) -> dict:
    """Run the one-pass stats aggregate; returns {stat_name: value}.

    The collected row is O(#columns) — driver-side by design (these are
    aggregate RESULTS, not data; the reference's fetchall anti-pattern
    is what we're replacing)."""
    row = df.agg(*stats_exprs(df)).collect()[0]
    return row.asDict()


def decide(df: DataFrame, stats: dict, ignored_suffixes: list[str] | None = None) -> list[ColumnDecision]:
    """Compile observed stats into per-column decisions (T2/T3/T4/T8/T9).

    A 0-ROW input keeps every column untouched: with no observations
    there is no evidence for ANY decision, and the old behavior
    (all counts 0 → drop_empty everywhere) returned a zero-column
    frame that destroyed the table schema on empty partitions."""
    if stats.get("__total") == 0:
        return [
            ColumnDecision(f.name, f.dataType.simpleString(), "keep")
            for f in df.schema.fields
        ]
    out: list[ColumnDecision] = []
    for f in df.schema.fields:
        c, dt = f.name, f.dataType
        src = dt.simpleString()
        if ignored_suffixes and any(c.endswith(s) for s in ignored_suffixes):
            out.append(ColumnDecision(c, src, "drop_suffix"))
            continue
        n = stats.get(f"{c}__n", 0)
        if n == 0:
            out.append(ColumnDecision(c, src, "drop_empty"))
            continue
        if isinstance(dt, INT_TYPES):
            lo, hi = stats[f"{c}__min"], stats[f"{c}__max"]
            if stats.get(f"{c}__not01") == 0:
                out.append(ColumnDecision(c, src, "cast", "boolean", stats={"min": lo, "max": hi}))
                continue
            for name, tmin, tmax in _INT_LADDER:
                if lo >= tmin and hi <= tmax:
                    action = "keep" if name == src else "cast"
                    out.append(
                        ColumnDecision(c, src, action, None if action == "keep" else name,
                                       stats={"min": lo, "max": hi})
                    )
                    break
        elif isinstance(dt, T.StringType):
            maxlen = stats.get(f"{c}__maxlen") or 0
            out.append(
                ColumnDecision(c, src, "keep", varchar_n=next_pow2(maxlen),
                               stats={"max_len": maxlen})
            )
        else:
            # doubles/decimals/timestamps/binary pass through (T5–T7):
            # Spark's types are already the generic destination types.
            out.append(ColumnDecision(c, src, "keep"))
    return out


def apply_decisions(df: DataFrame, decisions: list[ColumnDecision]) -> DataFrame:
    """Compile decisions to a single ``select`` (casts + drops)."""
    cols = []
    for d in decisions:
        if d.action in ("drop_empty", "drop_suffix"):
            continue
        if d.action == "cast":
            cols.append(F.col(d.name).cast(d.target_type).alias(d.name))
        else:
            cols.append(F.col(d.name))
    return df.select(*cols)


def standardize(df: DataFrame, ignored_suffixes: list[str] | None = None) -> tuple[DataFrame, list[ColumnDecision]]:
    """Full T1–T9 pass: observe → decide → apply. Returns (new_df, decisions)."""
    decisions = decide(df, observe(df), ignored_suffixes)
    return apply_decisions(df, decisions), decisions


def varchar_metadata(decisions: list[ColumnDecision]) -> dict[str, int]:
    """{column: VARCHAR(n)} map for DDL sinks (Spark strings stay unbounded)."""
    return {d.name: d.varchar_n for d in decisions if d.varchar_n}
