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
    narrow filter — pushes into the scan stage, shuffles nothing.
    (round, not int: truncation would sample 0.615 as 0.614999 —
    IEEE 0.615*1e6 is 614999.999...)"""
    return df.where(hash_bucket(key, salt) < round(rate * _DENOM))


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
    thresh = F.lit(round(default_rate * _DENOM))
    for value, rate in sorted(rates.items()):
        thresh = F.when(stratum == F.lit(value), round(rate * _DENOM)).otherwise(thresh)
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


def weighted_systematic_sample(
    df: DataFrame,
    order_cols: list[str],
    weight: Column,
    n: int,
    n_buckets: int = 32,
) -> DataFrame:
    """Weighted systematic sampling: n evenly spaced thresholds over
    the cumulative-weight axis; a row is drawn once per threshold
    falling inside its weight interval (``n_picks`` >= 1, so heavy rows
    can be drawn multiple times — probability-proportional-to-size
    with replacement).

    Needs a global cumulative sum — delegated to the range-bucketed
    two-phase prefix (operators/prefix.py), so no single-partition
    window at any scale. Weights are integralized as FLOOR(weight)
    cast to BIGINT: floor is the ONE integralization every engine
    computes identically on doubles and decimals, whereas a bare
    numeric→BIGINT cast truncates in Spark but rounds in DuckDB — on
    data with any fractional weight the two engines would pick
    different rows while both looking locally deterministic (r8
    root-cause candidate for the r7 driver hash mismatch). Threshold
    tests are exact integer floor-division, reproducible in any
    engine and under stage retries.
    """
    from etlalchemy_spark.operators.prefix import running_global_sum

    d = df.withColumn("_wsw", F.floor(weight).cast("long"))
    cum = running_global_sum(
        d,
        F.col(order_cols[0]),
        order_cols[1:],
        F.col("_wsw"),
        alias="_cum",
        n_buckets=n_buckets,
    ).withColumn("_cum", F.col("_cum").cast("long"))
    total = d.agg(F.sum("_wsw").alias("_W"))
    # 128-bit-safe integral division: _cum * n overflows int64 at full
    # scale (total weight ~1e13 × n ~1e6 > 2^63 → ANSI overflow abort
    # on exactly the tail rows). Decimal(38,0) DIV is exact integral
    # division with 38-digit headroom; result identical in range.
    hi = F.expr(f"CAST((CAST(_cum AS DECIMAL(38,0)) * {n}) DIV _W AS BIGINT)")
    lo = F.expr(f"CAST((CAST(_cum - _wsw AS DECIMAL(38,0)) * {n}) DIV _W AS BIGINT)")
    return (
        cum.crossJoin(F.broadcast(total))
        .withColumn("n_picks", hi - lo)
        .where(F.col("n_picks") > 0)
        .drop("_wsw", "_cum", "_W")
    )


def temperature_mixture_sample(
    df: DataFrame,
    key: Column,
    stratum: Column,
    alpha: float = 0.5,
    salt: str = "",
) -> DataFrame:
    """Temperature-rebalanced source mixture — the multinomial
    α-rebalancing used to flatten multi-source/multilingual LLM
    corpora (target share p_s ∝ n_s^α, α<1 boosts small sources).
    Realized as per-source acceptance rates
    ``r_s = n_s^(α-1) / max_t n_t^(α-1)`` (the smallest source keeps
    everything; larger sources downsample toward the tempered share),
    then the usual content-hash Bernoulli filter.

    Cost shape: one tiny per-source count aggregate (rows = number of
    sources), a one-row max joined back broadcast, and a narrow filter
    over the corpus — the corpus itself never shuffles.

    Cross-engine exactness: α = 0.5 computes n^(−1/2) as
    ``1/sqrt(n)`` (division and sqrt are correctly-rounded IEEE ops,
    bit-identical in Spark and DuckDB). Other α use ``pow``, which is
    NOT guaranteed correctly rounded across engines — fine for
    production, but only the sqrt form is used in oracle-gated
    queries."""
    if alpha == 0.5:
        pw = F.lit(1.0) / F.sqrt(F.col("_n").cast("double"))
    else:
        pw = F.pow(F.col("_n").cast("double"), F.lit(alpha - 1.0))
    rates = (
        df.groupBy(stratum.alias("_stratum"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .select("_stratum", pw.alias("_pw"))
    )
    mx = rates.agg(F.max("_pw").alias("_mx"))
    thresh = (
        rates.crossJoin(F.broadcast(mx))  # one-row aggregate frame
        .select(
            "_stratum",
            F.round(F.col("_pw") / F.col("_mx") * _DENOM, 0).cast("long").alias("_thresh"),
        )
    )
    return (
        df.join(F.broadcast(thresh), stratum == F.col("_stratum"), "inner")
        .where(hash_bucket(key, salt) < F.col("_thresh"))
        .drop("_stratum", "_thresh")
    )
