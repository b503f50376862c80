"""Sketch queries have no SQL oracle (engine-specific estimators) — pin
their error against exact counts here instead."""

from __future__ import annotations

from pyspark.sql import functions as F

from etlalchemy_spark.queries._util import t
from etlalchemy_spark.registry import all_queries

from conftest import SF_DIR


def test_hll_rollup_close_to_exact(spark):
    got = {
        r.o_orderpriority: r.approx_customers
        for r in all_queries()["sketch_hll_distinct_customers"].fn(spark, SF_DIR).collect()
    }
    exact = {
        r.o_orderpriority: r.n
        for r in t(spark, SF_DIR, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count_distinct("o_custkey").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for k in exact:
        rel = abs(got[k] - exact[k]) / exact[k]
        assert rel < 0.05, f"{k}: hll {got[k]} vs exact {exact[k]} ({rel:.1%} off)"


def test_hll_union_close_to_exact(spark):
    (got,) = all_queries()["sketch_hll_cross_table_union"].fn(spark, SF_DIR).collect()
    exact = (
        t(spark, SF_DIR, "customer")
        .select(F.col("c_custkey").alias("k"))
        .union(t(spark, SF_DIR, "orders").select(F.col("o_custkey").alias("k")))
        .agg(F.count_distinct("k"))
        .collect()[0][0]
    )
    rel = abs(got.approx_union_customers - exact) / exact
    assert rel < 0.05


# --- portable HLL ----------------------------------------------------------

from pyspark.sql import functions as F

from etlalchemy_spark.operators.sketch import (
    M_BUCKETS,
    hll_estimate,
    hll_merge,
    hll_registers,
)


def test_portable_hll_error_bound(spark):
    n = 5000
    df = spark.createDataFrame([(i,) for i in range(n)], "k long")
    est = hll_estimate(hll_registers(df, F.col("k"))).first()["estimate"]
    # 256 buckets → ~6.5% stderr; allow 4 sigma
    assert abs(est - n) / n < 0.26


def test_portable_hll_merge_equals_union(spark):
    a = spark.createDataFrame([(i,) for i in range(0, 3000)], "k long")
    b = spark.createDataFrame([(i,) for i in range(1500, 4500)], "k long")
    merged = hll_merge(hll_registers(a, F.col("k")), hll_registers(b, F.col("k")))
    both = a.unionByName(b)
    est_merged = hll_estimate(merged).first()["estimate"]
    est_direct = hll_estimate(hll_registers(both, F.col("k"))).first()["estimate"]
    assert est_merged == est_direct  # merge is lossless, not just close


def test_portable_hll_register_shape(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], "k long")
    regs = hll_registers(df, F.col("k")).collect()
    assert len(regs) <= M_BUCKETS
    assert all(0 <= r["bucket"] < M_BUCKETS and 1 <= r["register"] <= 53 for r in regs)


# --- Count-Min sketch ------------------------------------------------------

from etlalchemy_spark.operators.sketch import (
    CMS_DEPTH,
    CMS_WIDTH,
    bitmap_buckets,
    bitmap_distinct_count,
    cms_estimate,
    cms_merge,
    cms_registers,
    hist_bins,
    hist_quantiles,
)


def test_cms_never_underestimates(spark):
    rows = [(i % 50,) for i in range(2000)] + [(999,)] * 300
    df = spark.createDataFrame(rows, "k long")
    reg = cms_registers(df, F.col("k"))
    exact = df.groupBy("k").agg(F.count(F.lit(1)).alias("exact_cnt"))
    est = cms_estimate(reg, exact, "k")
    joined = exact.join(est, "k").collect()
    assert len(joined) == 51
    for r in joined:
        assert r["cms_est"] >= r["exact_cnt"]  # CMS one-sided guarantee
    # the heavy key collides with at most a few of 50 light keys
    hh = {r["k"]: r for r in joined}[999]
    assert hh["cms_est"] - hh["exact_cnt"] <= 2000 * CMS_DEPTH / CMS_WIDTH * 4


def test_cms_register_bounds(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "k long")
    regs = cms_registers(df, F.col("k"))
    assert regs.count() <= CMS_DEPTH * CMS_WIDTH
    bad = regs.where(
        (F.col("r") < 0) | (F.col("r") >= CMS_DEPTH)
        | (F.col("c") < 0) | (F.col("c") >= CMS_WIDTH)
    )
    assert bad.count() == 0
    # every row contributes once to each of the depth rows
    per_row = regs.groupBy("r").agg(F.sum("cnt").alias("s")).collect()
    assert all(p["s"] == 1000 for p in per_row)


def test_cms_merge_equals_combined(spark):
    a = spark.createDataFrame([(i % 30,) for i in range(900)], "k long")
    b = spark.createDataFrame([(i % 40,) for i in range(800)], "k long")
    merged = cms_merge(cms_registers(a, F.col("k")), cms_registers(b, F.col("k")))
    direct = cms_registers(a.unionByName(b), F.col("k"))
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_cms_estimate_unseen_key_is_small(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "k long")
    reg = cms_registers(df, F.col("k"))
    probe = spark.createDataFrame([(10_000_000,)], "k long")
    est = cms_estimate(reg, probe, "k").first()["cms_est"]
    assert 0 <= est <= 3  # collisions only


# --- bitmap distinct -------------------------------------------------------


def test_bitmap_distinct_exact(spark):
    rows = [(i % 777,) for i in range(5000)]
    df = spark.createDataFrame(rows, "k long")
    assert bitmap_distinct_count(df, F.col("k")).first()["n_distinct"] == 777


def test_bitmap_bucket_counts(spark):
    df = spark.createDataFrame([(i,) for i in range(0, 130)], "k long")
    got = {r["bucket"]: r["n_in_bucket"] for r in bitmap_buckets(df, F.col("k")).collect()}
    assert got == {0: 64, 1: 64, 2: 2}


def test_bitmap_high_bit_keys(spark):
    # keys hitting bit 63 of a word (two's-complement negative long)
    df = spark.createDataFrame([(63,), (127,), (64,), (0,)], "k long")
    assert bitmap_distinct_count(df, F.col("k")).first()["n_distinct"] == 4


# --- histogram quantiles ---------------------------------------------------


def test_hist_quantiles_near_truth(spark):
    df = spark.range(0, 10_000).select((F.col("id").cast("double")).alias("x"))
    bins = hist_bins(df, F.col("x"), 0.0, 10.0, 1000)
    got = {
        r["q"]: r["estimate"]
        for r in hist_quantiles(bins, 0.0, 10.0, [("p50", 50, 100), ("p99", 99, 100)]).collect()
    }
    assert abs(got["p50"] - 5000) <= 10.0  # within one bin width
    assert abs(got["p99"] - 9900) <= 10.0


def test_hist_bins_clamp_out_of_range(spark):
    df = spark.createDataFrame([(-5.0,), (0.0,), (99.0,), (500.0,)], "x double")
    got = {r["bin"]: r["cnt"] for r in hist_bins(df, F.col("x"), 0.0, 10.0, 10).collect()}
    assert got[0] == 2  # -5 clamps into bin 0
    assert got[9] == 2  # 99 in last bin; 500 clamps into it


def test_hist_quantiles_zero_quantile_maps_to_min_bin(spark):
    # q=0 → k clamps to 1 → first populated bin, not a silently missing row
    df = spark.range(0, 1000).select((F.col("id").cast("double")).alias("x"))
    bins = hist_bins(df, F.col("x"), 0.0, 10.0, 100)
    got = {
        r["q"]: r["estimate"]
        for r in hist_quantiles(
            bins, 0.0, 10.0, [("p0", 0, 100), ("p100", 100, 100)]
        ).collect()
    }
    assert "p0" in got and got["p0"] <= 10.0
    assert abs(got["p100"] - 1000.0) <= 10.0


def test_hist_bins_and_hll_ignore_nulls(spark):
    """NULLs must not count (r5 review): un-filtered they landed in the
    TOP histogram bin (GREATEST/LEAST skip NULLs) and inflated the HLL
    denominator via a (NULL, NULL) register row."""
    from etlalchemy_spark.operators.sketch import hist_bins, hll_estimate, hll_registers

    df = spark.createDataFrame(
        [(1.0,), (2.0,), (None,)], "x double"
    )
    bins = {r["bin"]: r["cnt"] for r in hist_bins(df, F.col("x"), 0.0, 1.0, 10).collect()}
    assert bins == {1: 1, 2: 1}  # no NULL row in bin 9

    keys = spark.createDataFrame([("a",), ("b",), (None,)], "k string")
    regs = hll_registers(keys, F.col("k"))
    assert regs.where(F.col("bucket").isNull()).count() == 0
    est = hll_estimate(regs).collect()[0]["estimate"]
    assert 1.5 < est < 2.5  # ~2 distinct, NULL excluded
