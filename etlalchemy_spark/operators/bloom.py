"""Portable Bloom filter — the semi-join runtime-filter structure.

At 100 TB the cheapest join is the one that never shuffles: build a
fixed-size bit-set over the small side's keys (aggregate-sized, ~2 KB
here), broadcast it, and discard non-matching fact rows INSIDE the
scan stage before any exchange. Spark's AQE injects its own runtime
bloom filters when statistics allow; this explicit operator is the
engine-surface version — composable, persistable (a filter is just a
row of integers), and portable: positions come from the md5-prefix
hash (operators/dedup.md5_prefix60), so any engine builds and probes
the IDENTICAL filter — the correctness harness hash-compares the whole
pipeline exactly.

False positives are bounded (~0.8% at 1024 bits / 7 hashes / 100 keys)
and never lost: probes return the bloom verdict, and the exact verify
(a real semi-join on the survivors) stays in the plan when exactness
is required.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etlalchemy_spark.operators.dedup import MINHASH_P, md5_prefix60, minhash_params

BLOOM_BITS = 1024  # 16 × int64 words
BLOOM_WORDS = BLOOM_BITS // 64
N_HASHES = 7


def _positions(key: Column, seed: int = 99) -> list[Column]:
    """k bit positions in [0, BLOOM_BITS) from one portable hash."""
    h = md5_prefix60(key.cast("string")) % MINHASH_P
    return [
        (F.lit(a) * h + F.lit(b)) % MINHASH_P % BLOOM_BITS
        for a, b in minhash_params(N_HASHES, seed)
    ]


def bloom_build(df: DataFrame, key: Column, seed: int = 99) -> DataFrame:
    """One-row filter: ``words`` = array of BLOOM_WORDS int64s with the
    key set's bits OR-ed in. One narrow aggregate — partial bit_or
    map-side, constant-size result."""
    pos_rows = df.select(F.explode(F.array(*_positions(key, seed))).alias("_p"))
    word_aggs = [
        F.bit_or(
            F.when(
                F.shiftright(F.col("_p"), 6) == w,
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_p % 64 AS INT))"),
            ).otherwise(F.lit(0).cast("bigint"))
        ).alias(f"w{w}")
        for w in range(BLOOM_WORDS)
    ]
    agg = pos_rows.agg(*word_aggs)
    return agg.select(
        F.array(*[F.coalesce(F.col(f"w{w}"), F.lit(0).cast("bigint")) for w in range(BLOOM_WORDS)]).alias(
            "words"
        )
    )


def bloom_probe(
    df: DataFrame, key: Column, bloom: DataFrame, out: str = "bloom_pass", seed: int = 99
) -> DataFrame:
    """Append a membership verdict per row: all k bits set → True.
    The filter joins in as a broadcast single row; the probe is pure
    bit arithmetic inside the scan stage — no shuffle of ``df``."""
    # Namespaced temp columns so a user column named e.g. "words"
    # is neither made ambiguous by the crossJoin nor dropped below.
    tmp_cols = ["__bloom_words"] + [f"__bloom_p{i}" for i in range(N_HASHES)]
    clash = [c for c in tmp_cols if c in df.columns]
    if clash:
        raise ValueError(f"bloom_probe temp columns clash with input: {clash}")
    probed = df.crossJoin(F.broadcast(bloom.select(F.col("words").alias("__bloom_words"))))
    for i, p in enumerate(_positions(key, seed)):
        probed = probed.withColumn(f"__bloom_p{i}", p)
    cond = None
    for i in range(N_HASHES):
        # shiftright's python binding wants a literal shift amount, so
        # the variable-shift probe goes through the SQL expression form
        c = F.expr(
            f"((shiftright(element_at(__bloom_words, CAST(__bloom_p{i} DIV 64 AS INT) + 1),"
            f" CAST(__bloom_p{i} % 64 AS INT))) & 1) = 1"
        )
        cond = c if cond is None else cond & c
    # NULL keys hash to NULL positions → NULL verdict, and a consumer
    # splitting on where(col) vs where(~col) would lose the row from
    # BOTH branches. A NULL key is definitely-not-a-member: False, the
    # same side an exact anti-join would keep it on.
    return probed.withColumn(out, F.coalesce(cond, F.lit(False))).drop(*tmp_cols)
