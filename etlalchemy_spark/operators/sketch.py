"""Portable HyperLogLog sketch (oracle-exact).

Spark's ``approx_count_distinct`` is a black-box HLL++ whose registers
and estimate are engine-internal — it can only ever be rows-checked.
This is a from-first-principles HLL over the portable md5-prefix hash
(operators/dedup.md5_prefix60) with the float hazards engineered out:

- register table: bucket = low 8 hash bits, register = max rho of the
  remaining 52 bits — pure integer MAX aggregate, exact in any engine;
- estimate: the harmonic-mean denominator sum(2^-M_b) is computed as
  the INTEGER sum of 2^(53-M_b) (≤ 256·2^53 < 2^62, exact), so the
  only float ops are one multiply chain and one division on identical
  operands — bit-identical across engines. (No small/large-range
  correction branch: ln() rounding is libm-specific, and the raw
  estimator is the part worth checking; callers needing the correction
  apply it driver-side.)

Mergeability is the 100 TB point: register tables from disjoint
partitions/days combine with a per-bucket MAX — count-distinct over any
time window without rescanning (the moral upgrade of the reference's
full-table row counts, SURVEY.md Table A op S2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etlalchemy_spark.operators.dedup import md5_prefix60

M_BUCKETS = 256  # 2^8 buckets → ~6.5% standard error
_W_BITS = 52  # hash bits left after the bucket byte


def hll_registers(df: DataFrame, key: Column) -> DataFrame:
    """(bucket, register) table — the mergeable sketch state."""
    h = md5_prefix60(key.cast("string"))
    w = F.shiftright(h, 8)
    # rho = leading zeros in the 52-bit window + 1 = 53 - bit_length(w);
    # w == 0 (all 52 bits zero) → 53 by the same formula via bin(0)='0'
    rho = F.when(w == 0, F.lit(_W_BITS + 1)).otherwise(
        F.lit(_W_BITS + 1) - F.length(F.bin(w))
    )
    return (
        df.select((h % M_BUCKETS).alias("bucket"), rho.alias("_rho"))
        .groupBy("bucket")
        .agg(F.max("_rho").alias("register"))
    )


def hll_estimate(registers: DataFrame) -> DataFrame:
    """One-row (estimate double) from a register table. Empty buckets
    contribute 2^0 = 1 to the harmonic denominator."""
    alpha = 0.7213 / (1.0 + 1.079 / M_BUCKETS)
    scaled = F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_W_BITS + 1} - register)"))
    agg = registers.agg(
        scaled.alias("_s_nonempty"), F.count(F.lit(1)).alias("_nonempty")
    )
    s_total = F.col("_s_nonempty") + (F.lit(M_BUCKETS) - F.col("_nonempty")) * F.lit(
        1 << (_W_BITS + 1)
    )
    est = (
        F.lit(alpha)
        * F.lit(float(M_BUCKETS))
        * F.lit(float(M_BUCKETS))
        * F.lit(float(1 << (_W_BITS + 1)))
        / s_total.cast("double")
    )
    return agg.select(est.alias("estimate"))


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Union register tables (e.g. one per partition/day) into one
    sketch: per-bucket MAX."""
    out = register_tables[0]
    for r in register_tables[1:]:
        out = out.unionByName(r)
    return out.groupBy("bucket").agg(F.max("register").alias("register"))
