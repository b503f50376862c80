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
    """(bucket, register) table — the mergeable sketch state. NULL
    keys are excluded (COUNT DISTINCT semantics): un-filtered they
    would emit a (NULL, NULL) row that hll_estimate counts as a
    non-empty bucket while its register contributes nothing, biasing
    the estimate high."""
    df = df.where(key.isNotNull())
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
    contribute 2^0 = 1 to the harmonic denominator. Standard
    small-range correction (r5 review): the raw harmonic estimate is
    badly biased high when n ≪ m (raw ~185 for 2 true distincts at
    m=256), so for raw ≤ 2.5m with empty buckets present the estimate
    switches to linear counting, m·ln(m/V) — the same double-precision
    ln on identical operands in any engine, so oracle exactness
    holds."""
    alpha = 0.7213 / (1.0 + 1.079 / M_BUCKETS)
    scaled = F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_W_BITS + 1} - register)"))
    agg = registers.agg(
        scaled.alias("_s_nonempty"), F.count(F.lit(1)).alias("_nonempty")
    )
    s_total = F.col("_s_nonempty") + (F.lit(M_BUCKETS) - F.col("_nonempty")) * F.lit(
        1 << (_W_BITS + 1)
    )
    raw = (
        F.lit(alpha)
        * F.lit(float(M_BUCKETS))
        * F.lit(float(M_BUCKETS))
        * F.lit(float(1 << (_W_BITS + 1)))
        / s_total.cast("double")
    )
    v_empty = F.lit(M_BUCKETS) - F.col("_nonempty")
    est = F.when(
        (raw <= F.lit(2.5 * M_BUCKETS)) & (v_empty > 0),
        F.lit(float(M_BUCKETS)) * F.log(F.lit(float(M_BUCKETS)) / v_empty.cast("double")),
    ).otherwise(raw)
    return agg.select(est.alias("estimate"))


def hll_registers_grouped(df: DataFrame, group_cols: list[str], key: Column) -> DataFrame:
    """Per-group (group..., bucket, register) sketch state — one hash
    aggregate; each group's 256-int register set merges across
    partitions/days exactly like the global sketch."""
    df = df.where(key.isNotNull())
    h = md5_prefix60(key.cast("string"))
    w = F.shiftright(h, 8)
    rho = F.when(w == 0, F.lit(_W_BITS + 1)).otherwise(
        F.lit(_W_BITS + 1) - F.length(F.bin(w))
    )
    return (
        df.select(*group_cols, (h % M_BUCKETS).alias("bucket"), rho.alias("_rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("_rho").alias("register"))
    )


def hll_estimate_grouped(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """(group..., estimate) — the hll_estimate formula applied per
    group in one aggregate pass (integer harmonic denominator, linear
    counting small-range switch; identical float chain per group)."""
    alpha = 0.7213 / (1.0 + 1.079 / M_BUCKETS)
    scaled = F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_W_BITS + 1} - register)"))
    agg = registers.groupBy(*group_cols).agg(
        scaled.alias("_s_nonempty"), F.count(F.lit(1)).alias("_nonempty")
    )
    s_total = F.col("_s_nonempty") + (F.lit(M_BUCKETS) - F.col("_nonempty")) * F.lit(
        1 << (_W_BITS + 1)
    )
    raw = (
        F.lit(alpha)
        * F.lit(float(M_BUCKETS))
        * F.lit(float(M_BUCKETS))
        * F.lit(float(1 << (_W_BITS + 1)))
        / s_total.cast("double")
    )
    v_empty = F.lit(M_BUCKETS) - F.col("_nonempty")
    est = F.when(
        (raw <= F.lit(2.5 * M_BUCKETS)) & (v_empty > 0),
        F.lit(float(M_BUCKETS)) * F.log(F.lit(float(M_BUCKETS)) / v_empty.cast("double")),
    ).otherwise(raw)
    return agg.select(*group_cols, est.alias("estimate"))


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Union register tables (e.g. one per partition/day) into one
    sketch: per-bucket MAX."""
    out = register_tables[0]
    for r in register_tables[1:]:
        out = out.unionByName(r)
    return out.groupBy("bucket").agg(F.max("register").alias("register"))


# --- Count-Min sketch (portable, oracle-exact) ------------------------------
#
# Frequency estimation in fixed memory: depth*width integer counters,
# est(x) = min_j C[j][h_j(x)] >= true count, always. Counter tables from
# disjoint partitions merge by cell-wise SUM — the heavy-hitter state a
# 100 TB pipeline keeps per shard/day and combines at query time. All
# arithmetic is the same portable mod-p universal hashing as MinHash
# (operators/dedup.minhash_params), so the sketch — and every estimate
# read from it — is bit-identical in any engine.

CMS_DEPTH = 4
CMS_WIDTH = 512
CMS_SEED = 7  # distinct from the MinHash seed: independent hash family


def _cms_cells(key: Column, depth: int, width: int, seed: int) -> Column:
    """Array of (r, c) counter coordinates for one key."""
    from etlalchemy_spark.operators.dedup import (
        MINHASH_P,
        md5_prefix60,
        minhash_params,
    )

    hm = md5_prefix60(key.cast("string")) % MINHASH_P
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("r"),
                (((F.lit(a) * hm + F.lit(b)) % MINHASH_P) % width).alias("c"),
            )
            for j, (a, b) in enumerate(minhash_params(depth, seed))
        ]
    )


def cms_registers(
    df: DataFrame,
    key: Column,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    seed: int = CMS_SEED,
) -> DataFrame:
    """(r, c, cnt) counter table. One scan: explode the depth
    coordinates per row, hash-aggregate — partial (map-side) combine
    collapses the depth*N stream to <= depth*width rows per task
    before the single shuffle."""
    return (
        df.select(F.explode(_cms_cells(key, depth, width, seed)).alias("e"))
        .select("e.r", "e.c")
        .groupBy("r", "c")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    registers: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    seed: int = CMS_SEED,
) -> DataFrame:
    """Point-query a counter table for each row of ``keys``: adds
    ``cms_est`` = min over the depth counters. The counter table is
    <= depth*width rows by construction → broadcast to the probe side,
    no shuffle of ``keys``."""
    coords = keys.select(
        key_col, F.explode(_cms_cells(F.col(key_col), depth, width, seed)).alias("e")
    ).select(key_col, "e.r", "e.c")
    return (
        coords.join(F.broadcast(registers), ["r", "c"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )


def cms_merge(*register_tables: DataFrame) -> DataFrame:
    """Cell-wise SUM of counter tables — sketches of disjoint data
    unions combine exactly."""
    out = register_tables[0]
    for r in register_tables[1:]:
        out = out.unionByName(r)
    return out.groupBy("r", "c").agg(F.sum("cnt").alias("cnt"))


def cms_join_size(reg_a: DataFrame, reg_b: DataFrame) -> DataFrame:
    """One-row equi-join cardinality estimate from two Count-Min
    counter tables: est = min over rows j of the inner product
    sum_c A[j][c] * B[j][c] (AMS/CMS join-size estimator — each row's
    inner product >= the true |A JOIN B| because colliding keys only
    ever ADD counts, and min over depth independent rows tightens it).

    This is the planner's question — "how big is this join?" —
    answered from two fixed-size sketches without shuffling either
    table: the counter tables are <= depth*width rows each, so the
    estimate costs a broadcast-sized join of aggregates no matter how
    big the inputs were. Products accumulate in DECIMAL(38,0): at
    10^12-row inputs a row inner product reaches ~N^2/width ~ 10^21,
    past int64 but exact in decimal."""
    a = reg_a.select("r", "c", F.col("cnt").alias("_ca"))
    b = reg_b.select("r", "c", F.col("cnt").alias("_cb"))
    prod = (
        a.join(b, ["r", "c"], "left")
        .groupBy("r")
        .agg(
            F.sum(
                F.col("_ca").cast("decimal(19,0)")
                * F.coalesce(F.col("_cb"), F.lit(0)).cast("decimal(19,0)")
            )
            .cast("decimal(38,0)")
            .alias("_ip")
        )
    )
    return prod.agg(F.min("_ip").cast("double").alias("join_size_est"))


# --- exact distinct-count via bitmap buckets --------------------------------
#
# For dense integer keys, exact COUNT(DISTINCT) in O(keyspace/8) bits
# with NO expansion of the data: bucket = key >> 6, word = OR of
# (1 << (key & 63)). Per-bucket words merge across partitions/days with
# bitwise OR (Spark's bit_or partial-aggregates map-side), so the state
# is as mergeable as a sketch but the answer is exact — the
# roaring-bitmap idea reduced to its Spark-native core. Contrast HLL
# above: use bitmaps when the keyspace is bounded, HLL when it isn't.


def bitmap_buckets(df: DataFrame, key: Column) -> DataFrame:
    """(bucket, n_in_bucket) — per-64-key-bucket exact distinct counts
    from one bit_or aggregate. Key must be a non-negative integer."""
    k = key.cast("long")
    # pyspark's shiftleft() only takes a literal shift count; the SQL
    # function form accepts a column.
    word = F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_k % 64 AS INT))"))
    return (
        df.select(F.shiftright(k, 6).alias("bucket"), k.alias("_k"))
        .groupBy("bucket")
        .agg(word.alias("_w"))
        .select("bucket", F.bit_count("_w").cast("long").alias("n_in_bucket"))
    )


def bitmap_distinct_count(df: DataFrame, key: Column) -> DataFrame:
    """One-row exact distinct count: SUM of per-bucket popcounts."""
    return bitmap_buckets(df, key).agg(
        F.coalesce(F.sum("n_in_bucket"), F.lit(0).cast("long")).alias("n_distinct")
    )


# --- fixed-bin histogram quantiles (portable, oracle-exact) -----------------
#
# The mergeable quantile state for a bounded-range metric: integer
# counts over nbins equal-width bins (bin tables from shards merge by
# per-bin SUM). The q-quantile estimate takes the k = ceil(q*N)-th
# value's bin and interpolates by rank fraction inside it. k is pure
# integer arithmetic (floor((num*N + den - 1)/den)) and the only float
# ops are one fixed multiply/divide chain on identical operands — the
# ESTIMATE hash-matches across engines, unlike approx_percentile's
# engine-internal GK/KLL state.


def hist_bins(df: DataFrame, x: Column, lo: float, width: float, nbins: int) -> DataFrame:
    """(bin, cnt) integer bin table; values outside [lo, lo+nbins*width)
    clamp into the edge bins. NULLs are excluded up front — GREATEST/
    LEAST skip NULL operands, so an un-filtered NULL would silently
    clamp into the TOP bin (least(nbins-1, NULL) = nbins-1), inflating
    the upper tail and dragging every high quantile estimate up."""
    df = df.where(x.isNotNull())
    raw = F.floor((x.cast("double") - F.lit(lo)) / F.lit(width))
    b = F.greatest(F.lit(0).cast("long"), F.least(F.lit(nbins - 1).cast("long"), raw))
    return df.select(b.alias("bin")).groupBy("bin").agg(F.count(F.lit(1)).alias("cnt"))


def hist_quantiles(
    bins: DataFrame,
    lo: float,
    width: float,
    quantiles: list[tuple[str, int, int]],
) -> DataFrame:
    """(q, estimate) for each (label, num, den) quantile num/den.

    The bin table is an aggregate bounded by construction at <= nbins
    rows (hist_bins groups by the clamped bin id), so the cumulative
    pass collects it to the driver — the same bounded-collect budget as
    prefix.py's quantile bounds — and does the rank walk in plain
    Python. (An earlier array-packed in-plan version cost O(nbins^2)
    lambda additions in one row and regressed the bench ~1.8x; a window
    is out too, since Spark 4 strips foldable partition keys and would
    execute it single-partition.)

    Exactness: rank k = ceil(q*N) is pure Python integer arithmetic,
    and the interpolation lo + ((bin + (k-cumb)/cnt) * width) is the
    identical IEEE-double chain the DuckDB oracle evaluates — each op
    correctly rounded, same operand order — so estimates hash-match."""
    table = sorted(
        (r["bin"], int(r["cnt"])) for r in bins.collect()
    )  # <= nbins rows: bounded aggregate state, not data
    n = sum(c for _, c in table)
    out: list[tuple[str, float]] = []
    for label, num, den in quantiles:
        # clamp to >= 1: k=0 (the 0-quantile) would satisfy no bin
        # because cumb < 0 is impossible — map it to the first
        # populated bin
        k = max(1, (num * n + den - 1) // den)
        cumb = 0
        for b, c in table:
            if cumb < k <= cumb + c:
                out.append((label, lo + ((float(b) + float(k - cumb) / float(c)) * width)))
                break
            cumb += c
    spark = bins.sparkSession
    if not out:
        return spark.createDataFrame([], schema="q string, estimate double")
    # Materialize the literal result JVM-side (range(1) + explode of a
    # literal array): createDataFrame on a python list parallelizes to
    # defaultParallelism python partitions, paying one Python-worker
    # roundtrip per partition just to emit 3 rows.
    entries = F.array(
        *[
            F.struct(F.lit(label).alias("q"), F.lit(float(est)).alias("estimate"))
            for label, est in sorted(out)
        ]
    )
    return (
        spark.range(0, 1, 1, 1)
        .select(F.explode(entries).alias("_e"))
        .select("_e.q", "_e.estimate")
    )


# --- portable Bloom filter (cross-engine-exact registers) --------------------
#
# The runtime-filter data structure as PORTABLE state (contrast
# join_bloom_prefilter, which uses Spark's engine-native bloom whose
# bits no other system can reproduce): k salted 60-bit md5 positions
# per key, registers = 60-bit words built with one bit_or aggregate —
# mergeable across shards/days like the HLL/CMS/bitmap families above,
# and bit-identical in any engine that can md5 UTF-8 bytes. 60-bit
# words (not 64) because DuckDB's BIGINT << errors at shift 63 and a
# sign bit would change the word's decimal rendering; Spark is
# indifferent, so the word layout bends to the portability contract.

BLOOM_K = 4
BLOOM_M_BITS = 122880  # 60 bits/word * 2048 words


def _bloom_positions(key: Column, k: int, m_bits: int) -> Column:
    from etlalchemy_spark.operators.dedup import md5_prefix60

    return F.array(
        *[
            md5_prefix60(F.concat(F.lit(f"bf{i}:"), key.cast("string"))) % m_bits
            for i in range(k)
        ]
    )


def bloom_registers(
    df: DataFrame, key: Column, k: int = BLOOM_K, m_bits: int = BLOOM_M_BITS
) -> DataFrame:
    """(word_idx, bits): the Bloom filter as 60-bit integer words.
    Duplicate keys are idempotent under OR — no distinct pass needed.
    One narrow explode (k small ints per row) + one hash aggregate;
    the filter is ~m/8 bytes however big the input."""
    p = df.select(F.explode(_bloom_positions(key, k, m_bits)).alias("_pos"))
    return (
        p.select(
            F.expr("_pos DIV 60").alias("word_idx"), (F.col("_pos") % 60).alias("_bit")
        )
        .groupBy("word_idx")
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_bit AS INT))")
            ).alias("bits")
        )
    )


def bloom_membership(
    registers: DataFrame,
    probes: DataFrame,
    probe_key: Column,
    truth: Column,
    k: int = BLOOM_K,
    m_bits: int = BLOOM_M_BITS,
) -> DataFrame:
    """Probe the filter: a key is FLAGGED iff all k of its bits are
    set (an absent register word means an unset bit). ``truth`` is the
    ground-truth membership column for the false-positive readout.
    Shape: probes explode to k narrow rows, one equi-join on word_idx
    against the ~m/60-row register table (broadcast), one aggregate."""
    pr = probes.select(
        probe_key.cast("string").alias("_pk"),
        truth.alias("_truth"),
        F.posexplode(_bloom_positions(probe_key, k, m_bits)).alias("_i", "_pos"),
    ).select(
        "_pk",
        "_truth",
        F.expr("_pos DIV 60").alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_pos % 60 AS INT))").alias("_mask"),
    )
    j = pr.join(F.broadcast(registers), "word_idx", "left")
    hit = (
        F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("_mask")) != 0
    ).cast("int")
    per = j.groupBy("_pk").agg(
        F.min(hit).alias("_all_set"), F.first("_truth").alias("_truth")
    )
    fl = F.col("_all_set") == 1
    tr = F.col("_truth")
    return per.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum(fl.cast("long")).alias("n_flagged"),
        F.sum(tr.cast("long")).alias("n_members"),
        F.sum((fl & ~tr).cast("long")).alias("n_false_positives"),
        F.sum((~fl & tr).cast("long")).alias("n_false_negatives"),
        F.try_divide(
            F.sum((fl & ~tr).cast("long")).cast("double"),
            F.nullif(F.sum((~tr).cast("long")), F.lit(0)).cast("double"),
        ).alias("fpp_observed"),
    )
