"""Deterministic sampling operators for training-data pipelines.

``df.sample()`` draws from an engine-private RNG — irreproducible
across engines, across runs with different partitioning, and across
retries of a failed stage. Pipelines that must be replayable (the 100
TB norm: a sample that changes under retry poisons incremental state)
sample by CONTENT: a portable hash of a stable key compared against the
rate. Same rows in, same sample out, on any engine.

The hash is the md5-prefix trick shared with the exact MinHash path
(operators/dedup.py): first 60 bits of md5 as int64 — uniform, portable,
and expressible in both Spark and ANSI-ish SQL.

Reference parity: the reference migrates full tables only (SURVEY.md
Table A) — sampling is part of the mandated LLM-pipeline extension
surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from etlalchemy_spark.operators.dedup import md5_prefix60

# Denominator for rate comparison: hash % 1_000_000 < rate * 1e6 gives
# micro-precision rates with exact integer comparison (no float drift).
_DENOM = 1_000_000


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Uniform bucket in [0, 1e6): portable, content-addressed.
    ``salt`` decorrelates independent samples over the same key."""
    return md5_prefix60(F.concat(F.lit(salt), key.cast("string"))) % _DENOM


def bernoulli_sample(
    df: DataFrame, key: Column, rate: float, salt: str = ""
) -> DataFrame:
    """Deterministic Bernoulli(rate) sample keyed on ``key``. A pure
    narrow filter — pushes into the scan stage, shuffles nothing."""
    return df.where(hash_bucket(key, salt) < int(rate * _DENOM))


def stratified_sample(
    df: DataFrame,
    key: Column,
    stratum: Column,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum Bernoulli rates (e.g. downsample common languages,
    keep rare ones whole). Still a narrow filter: the rate lookup is a
    literal CASE over the stratum column."""
    thresh = F.lit(int(default_rate * _DENOM))
    for value, rate in sorted(rates.items()):
        thresh = F.when(stratum == F.lit(value), int(rate * _DENOM)).otherwise(thresh)
    return df.where(hash_bucket(key, salt) < thresh)


def fixed_size_per_group(
    df: DataFrame,
    group_cols: list[str],
    key: Column,
    n: int,
    salt: str = "",
) -> DataFrame:
    """Exactly min(n, |group|) rows per group, chosen uniformly by hash
    order — the deterministic equivalent of per-group reservoir
    sampling. One window shuffle on the group key."""
    w = Window.partitionBy(*group_cols).orderBy(
        hash_bucket(key, salt).asc(), key.cast("string").asc()
    )
    return (
        df.withColumn("_srn", F.row_number().over(w))
        .where(F.col("_srn") <= n)
        .drop("_srn")
    )
