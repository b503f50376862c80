"""Shared helpers for oracle-exact query formulations.

See the determinism contract in ``etlalchemy_spark.registry``: double
reductions go through exact decimal arithmetic so Spark and DuckDB agree
bit-for-bit regardless of partitioning / row order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etlalchemy_spark.catalog import load_table

# Default decimal widths: 18,4 for money/quantity columns (2 intrinsic
# decimals), 8,4 for rate columns in [0,1] (discount/tax).
MONEY = "decimal(18,4)"
RATE = "decimal(8,4)"


# Literal 1 kept at decimal(1,0): a bare int literal promotes to
# decimal(10,0), which pushes product precision past 38 and makes Spark
# silently round the scale (losing oracle-exactness).
def one() -> Column:
    return F.lit(1).cast("decimal(1,0)")


def col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dec(c: Column | str, typ: str = MONEY) -> Column:
    return col(c).cast(typ)


# Final rescale before decimal→double: at scale 4 the unscaled integer of
# any fixture-sized aggregate stays under 2^53, so int→double is exact and
# the single /10^4 division is correctly rounded — both engines produce the
# identical double. (At scale 12 the unscaled int overflows 2^53 and
# DuckDB's two-step conversion double-rounds: off-by-one-ulp mismatches.)
OUT = "decimal(38,4)"


def fsum(c: Column, alias: str) -> Column:
    """Order-insensitive, cross-engine-exact SUM of a decimal expression."""
    return F.sum(c).cast(OUT).cast("double").alias(alias)


def dsum(c: Column | str, alias: str, typ: str = MONEY) -> Column:
    """Order-insensitive SUM over a double column, returned as double."""
    return F.sum(dec(c, typ)).cast(OUT).cast("double").alias(alias)


def davg(c: Column | str, alias: str, typ: str = MONEY) -> Column:
    """Order-insensitive AVG: exact decimal sum / count, in pure double."""
    return (
        F.sum(dec(c, typ)).cast(OUT).cast("double") / F.count(col(c)).cast("double")
    ).alias(alias)


def sql_dsum(expr: str, alias: str, typ: str = "DECIMAL(18,4)") -> str:
    return f"CAST(ROUND(SUM(CAST({expr} AS {typ})), 4) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str, typ: str = "DECIMAL(18,4)") -> str:
    return (
        f"CAST(ROUND(SUM(CAST({expr} AS {typ})), 4) AS DOUBLE)"
        f" / CAST(COUNT({expr}) AS DOUBLE) AS {alias}"
    )


def t(spark: SparkSession, sf_dir: str, name: str, fanout: bool = False) -> DataFrame:
    """Load a fixture table; ``fanout=True`` for map-compute-bound
    queries only (see catalog.load_table)."""
    return load_table(spark, sf_dir, name, fanout=fanout)


def ts(s: str) -> Column:
    """UTC timestamp literal matching DuckDB ``TIMESTAMP '...'``."""
    return F.lit(s).cast("timestamp")


def sessionize(ev: "DataFrame", gap_minutes: int = 30) -> "DataFrame":
    """Gaps-and-islands session numbering per user: adds ``is_new`` and
    ``session_id`` (cumulative count of session-opening rows). The
    cumulative-sum window tie-breaks on event_id like the lag window —
    ordering by ts alone would make session assignment of same-ts rows
    engine-dependent. Shared by window_sessionize and the interval
    join (one oracle-checked shape, no drift)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wc = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    prev_ts = F.lag("ts").over(w)
    gap_us = gap_minutes * 60 * 1_000_000
    is_new = F.when(
        prev_ts.isNull()
        | ((F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts)) > gap_us),
        1,
    ).otherwise(0)
    return ev.withColumn("is_new", is_new).withColumn(
        "session_id", F.sum("is_new").over(wc)
    )


def scratch_dir(kind: str, sf_dir: str) -> str:
    """Stable per-(query, sf) scratch path: reruns overwrite instead of
    accumulating a fresh mkdtemp per invocation (repeated bench/verify
    runs were leaking fixture-sized copies under /tmp)."""
    import hashlib
    import os
    import tempfile

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = os.path.join(tempfile.gettempdir(), "etlalchemy_spark_scratch", f"{kind}_{tag}")
    os.makedirs(path, exist_ok=True)
    return path


def shingle_ctes(
    k: int,
    relation: str = "documents",
    words_cte: str = "w",
    sh_cte: str = "sh",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of ``operators.dedup.word_shingles`` as a pair of
    CTE bodies (``words_cte`` + ``sh_cte``): distinct word k-grams per
    id with the same trim/whitespace split and the same
    GREATEST(len - (k-1), 1) short-doc clamp. DuckDB list slices are
    end-INCLUSIVE, so the ``+ (k-1)`` span selects k words. Single
    source of truth — the Jaccard / connected-components / MinHash /
    boilerplate / decontamination oracles all embed this; edit shingle
    semantics here and in word_shingles together."""
    span = k - 1
    return f"""{words_cte} AS (
  SELECT {id_col}, regexp_split_to_array(trim(text), '\\s+') AS words FROM {relation}
), {sh_cte} AS (
  SELECT DISTINCT {id_col}, shingle FROM (
    SELECT {id_col},
           UNNEST(list_transform(generate_series(1, GREATEST(len(words) - {span}, 1)),
                  i -> array_to_string(words[CAST(i AS INT):CAST(i AS INT)+{span}], ' '))) AS shingle
    FROM {words_cte}
  )
)"""
