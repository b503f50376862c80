"""Invariant tests for the round-8 third wave, beyond the oracle gate:
estimator guarantees (CMS overestimates, HLL error bounds, bootstrap
weight moments) and brute-force property checks (interval union,
winsorization, passage coverage) the hash-compare can't express.
"""

import math

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_cms_join_size_overestimates(spark):
    from etlalchemy_spark.queries.sketches import sketch_cms_join_size

    row = sketch_cms_join_size(spark, SF_DIR).collect()[0]
    # CMS inner product can only ADD colliding mass: est >= exact, always.
    assert row["join_size_est"] >= row["join_size_exact"]
    # and with depth=4 rows of width 512 the collision inflation on a
    # fixture-sized input stays small
    assert row["overestimate_ratio"] < 1.5


def test_hll_intersection_error_bounded(spark):
    from etlalchemy_spark.queries.sketches import sketch_hll_intersection

    row = sketch_hll_intersection(spark, SF_DIR).collect()[0]
    exact = row["exact_intersection"]
    assert exact > 0
    # inclusion-exclusion compounds three ~6.5%-error estimates; allow 3x
    assert abs(row["est_intersection"] - exact) / exact < 0.2
    # union estimate can never exceed est_a + est_b
    assert row["est_union"] <= row["est_a"] + row["est_b"] + 1e-9


def test_interval_union_matches_brute_force(spark):
    from etlalchemy_spark.queries.events import ts_interval_union_coverage

    got = {
        r["user_id"]: (r["n_islands"], r["covered_seconds"])
        for r in ts_interval_union_coverage(spark, SF_DIR).collect()
    }
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("s"))
        .collect()
    )
    by_user = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append((r["s"], r["s"] + 300_000_000))
    for uid, ivs in by_user.items():
        ivs.sort()
        islands = []
        for s, e in ivs:
            if islands and s <= islands[-1][1]:
                islands[-1] = (islands[-1][0], max(islands[-1][1], e))
            else:
                islands.append((s, e))
        covered = sum(e - s for s, e in islands) // 1_000_000
        assert got[uid] == (len(islands), covered), uid


def test_winsorized_mean_properties(spark):
    from etlalchemy_spark.queries.aggregates import agg_winsorized_mean

    rows = agg_winsorized_mean(spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    by_status = {}
    for r in orders:
        by_status.setdefault(r["o_orderstatus"], []).append(r["o_totalprice"])
    for r in rows:
        vs = sorted(by_status[r["o_orderstatus"]])
        n = len(vs)
        lo_k = max(1, math.ceil(0.05 * n))
        hi_k = n + 1 - lo_k
        # brute-force winsorization on exact cents to dodge float-sum order
        cents = [round(v * 10000) for v in vs]
        lo_c, hi_c = cents[lo_k - 1], cents[hi_k - 1]
        wins = [min(max(c, lo_c), hi_c) for c in cents]
        expect = round((sum(wins) / n)) / 10000.0
        assert r["n"] == n
        assert abs(r["lo_cut"] - vs[lo_k - 1]) < 1e-3
        assert abs(r["hi_cut"] - vs[hi_k - 1]) < 1e-3
        assert abs(r["winsorized_mean"] - expect) < 2e-4
        assert r["lo_cut"] <= r["winsorized_mean"] <= r["hi_cut"]


def test_benford_counts_complete(spark):
    from etlalchemy_spark.queries.aggregates import agg_benford_audit

    rows = agg_benford_audit(spark, SF_DIR).collect()
    n_pos = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .where(F.col("o_totalprice") > 0)
        .count()
    )
    assert sum(r["observed"] for r in rows) == n_pos
    assert all(1 <= r["digit"] <= 9 for r in rows)
    # expected counts are a probability distribution times n
    assert abs(sum(r["expected"] for r in rows) - n_pos) < 1e-6 * n_pos
    for r in rows:
        assert abs(r["delta"] - (r["observed"] - r["expected"])) < 1e-9


def test_duplicate_passage_planted(spark):
    """Plant a shared 8-word passage across two synthetic docs; a third
    unique doc must report zero coverage."""
    from etlalchemy_spark.queries import text as qt

    passage = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, f"unique one {passage} tail words here"),
            (2, f"other head {passage} different ending entirely"),
            (3, "completely disjoint vocabulary nothing shared at all ok"),
        ],
        "doc_id long, text string",
    )
    k = qt._PASSAGE_K
    # reuse the registered query body on a temp view-less path: inline
    # the same operator chain over the synthetic frame
    words = docs.select("doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("words"))
    n_pos = F.greatest(F.size("words") - (k - 1), F.lit(0))
    pos = words.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), n_pos),
                lambda i: F.struct(
                    i.alias("pos"),
                    F.concat_ws(" ", F.slice("words", i, k)).alias("shingle"),
                ),
            )
        ).alias("e"),
    ).select("doc_id", "e.pos", "e.shingle")
    dup = (
        pos.groupBy("shingle")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("shingle")
    )
    cov = (
        pos.join(dup, "shingle", "left_semi")
        .select("doc_id", F.explode(F.sequence("pos", F.col("pos") + (k - 1))).alias("p"))
        .groupBy("doc_id")
        .agg(F.count_distinct("p").alias("covered"))
    )
    got = {r["doc_id"]: r["covered"] for r in cov.collect()}
    # the 8-word passage spans 8 positions in each carrier (plus any
    # overlapping 6-gram windows with the surrounding words are NOT
    # shared, so coverage == the 8 passage positions)
    assert got[1] == 8 and got[2] == 8
    assert 3 not in got


def test_quality_quantile_norm_monotone(spark):
    from etlalchemy_spark.queries.text import text_quality_quantile_norm

    rows = text_quality_quantile_norm(spark, SF_DIR).collect()
    assert all(0 <= r["src_decile"] <= 9 for r in rows)
    assert all(0 <= r["global_decile"] <= 9 for r in rows)
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: (r["quality"], r["doc_id"]))
        deciles = [r["src_decile"] for r in rs]
        assert deciles == sorted(deciles), src
        # a full decile sweep when the source has >= 10 docs
        if len(rs) >= 10:
            assert deciles[0] == 0 and deciles[-1] == 9
    g = sorted(rows, key=lambda r: (r["quality"], r["doc_id"]))
    gd = [r["global_decile"] for r in g]
    assert gd == sorted(gd)


def test_poisson_bootstrap_moments(spark):
    from etlalchemy_spark.queries.sampling import sample_poisson_bootstrap

    rows = sample_poisson_bootstrap(spark, SF_DIR).collect()
    assert len(rows) == 8
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").where(
        (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
    )
    n = li.count()
    mean = li.agg(F.avg("l_extendedprice")).collect()[0][0]
    for r in rows:
        # E[Poisson(1)] = 1: each replicate resamples ~n rows
        assert abs(r["n_resampled"] - n) / n < 0.15
        # replicate means cluster around the point estimate
        assert abs(r["boot_mean"] - mean) / mean < 0.1
    # salts decorrelate: not all replicates identical
    assert len({r["n_resampled"] for r in rows}) > 1


def test_hll_grouped_estimate_error_bounded(spark):
    from etlalchemy_spark.queries.sketches import sketch_hll_grouped_estimate

    rows = sketch_hll_grouped_estimate(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert abs(r["estimate"] - r["exact_customers"]) / r["exact_customers"] < 0.2


def test_hll_grouped_merge_equals_rebuild(spark):
    """Register state merged from two halves == registers built at
    once (the per-day mergeability contract)."""
    from pyspark.sql import functions as F

    from etlalchemy_spark.operators.sketch import hll_registers_grouped

    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    whole = hll_registers_grouped(o, ["o_orderpriority"], F.col("o_custkey"))
    h1 = hll_registers_grouped(
        o.where(F.col("o_orderkey") % 2 == 0), ["o_orderpriority"], F.col("o_custkey")
    )
    h2 = hll_registers_grouped(
        o.where(F.col("o_orderkey") % 2 == 1), ["o_orderpriority"], F.col("o_custkey")
    )
    merged = (
        h1.unionByName(h2)
        .groupBy("o_orderpriority", "bucket")
        .agg(F.max("register").alias("register"))
    )
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_ngram_novelty_first_doc_fully_novel(spark):
    from etlalchemy_spark.queries.text import text_ngram_novelty

    rows = {r["doc_id"]: r for r in text_ngram_novelty(spark, SF_DIR).collect()}
    first = rows[min(rows)]
    # the smallest doc_id can never have seen anything earlier
    assert first["novelty"] == 1.0
    for r in rows.values():
        assert 0.0 <= r["novelty"] <= 1.0
        assert r["n_novel"] <= r["n_shingles"]


def test_fixed_total_allocation_exact_budget(spark):
    from pyspark.sql import functions as F

    from etlalchemy_spark.queries.sampling import (
        _ALLOC_BUDGET,
        sample_fixed_total_allocation,
    )

    got = sample_fixed_total_allocation(spark, SF_DIR)
    assert got.count() == _ALLOC_BUDGET
    # proportionality: each stratum's take is within 1 of B*n_h/N
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    n_h = {
        r["o_orderpriority"]: r["n"]
        for r in o.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n = sum(n_h.values())
    taken = {
        r["o_orderpriority"]: r["n"]
        for r in got.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for p, k in taken.items():
        ideal = _ALLOC_BUDGET * n_h[p] / n
        assert abs(k - ideal) < 1.0


def test_rowhash_reconciliation_sides_agree(spark):
    from etlalchemy_spark.queries.etl import etl_rowhash_reconciliation

    rows = {r["side"]: r for r in etl_rowhash_reconciliation(spark, SF_DIR).collect()}
    assert rows["source"]["n_rows"] == rows["destination"]["n_rows"]
    assert rows["source"]["checksum"] == rows["destination"]["checksum"]


def test_rowhash_checksum_detects_single_row_change(spark):
    """The reconciliation must actually DETECT corruption: flipping one
    row's value changes the additive checksum."""
    from pyspark.sql import functions as F

    from etlalchemy_spark.operators.dedup import md5_prefix60

    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )

    def cs(df):
        row_str = F.concat_ws(
            "|",
            F.col("o_orderkey").cast("string"),
            F.col("o_custkey").cast("string"),
            F.col("o_orderstatus"),
            (F.col("o_totalprice").cast("decimal(18,4)") * 10000)
            .cast("bigint")
            .cast("string"),
        )
        return df.agg(
            F.sum(md5_prefix60(row_str).cast("decimal(38,0)")).alias("c")
        ).collect()[0]["c"]

    base = cs(o)
    corrupted = o.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") == o.select(F.min("o_orderkey")).collect()[0][0],
               F.col("o_totalprice") + 0.01).otherwise(F.col("o_totalprice")),
    )
    assert cs(corrupted) != base


def test_autocorrelation_bounds_and_lag0_sanity(spark):
    from etlalchemy_spark.queries.events import ts_autocorrelation

    rows = ts_autocorrelation(spark, SF_DIR).collect()
    assert len(rows) == 6
    for r in rows:
        assert -1.0 <= r["acf"] <= 1.0
        assert r["n_pairs"] > 0
    # each lag-k pair needs two distinct observed hours: strictly
    # fewer pairs than hours (n_pairs is NOT monotone in k once the
    # series has gaps, so no cross-lag ordering is asserted)
    n_hours = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select(F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("h"))
        .distinct()
        .count()
    )
    for r in rows:
        assert r["n_pairs"] < n_hours


def test_common_neighbors_predictions_are_nonadjacent(spark):
    from etlalchemy_spark.queries.graph import _edges, graph_common_neighbors_topk

    rows = graph_common_neighbors_topk(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 20
    edge_set = {(r["u"], r["v"]) for r in _edges(spark, SF_DIR).collect()}
    for r in rows:
        assert r["u"] < r["v"]
        assert (r["u"], r["v"]) not in edge_set
        assert r["common_neighbors"] >= 1
    scores = [r["common_neighbors"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_gini_against_brute_force(spark):
    from etlalchemy_spark.queries.aggregates import agg_gini_concentration

    row = agg_gini_concentration(spark, SF_DIR).collect()[0]
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    rev = {}
    for r in o:
        rev[r["o_custkey"]] = rev.get(r["o_custkey"], 0) + round(r["o_totalprice"] * 10000)
    xs = sorted(rev.values())
    n = len(xs)
    s1 = sum((i + 1) * x for i, x in enumerate(xs))
    gini = 2 * s1 / (n * sum(xs)) - (n + 1) / n
    assert row["n_customers"] == n
    assert abs(row["gini"] - gini) < 1e-9
    assert 0.0 <= row["gini"] <= 1.0


def test_cusum_against_brute_force(spark):
    from etlalchemy_spark.queries.events import ts_cusum_changepoint

    row = ts_cusum_changepoint(spark, SF_DIR).collect()[0]
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .selectExpr("CAST(unix_micros(CAST(ts AS TIMESTAMP)) / 3600000000 AS LONG) AS h")
        .groupBy("h")
        .count()
        .collect()
    )
    series = sorted((r["h"], r["count"]) for r in ev)
    n = len(series)
    sx = sum(x for _, x in series)
    best = None
    pre = 0
    for t, (_, x) in enumerate(series, start=1):
        pre += x
        stat = abs(n * pre - t * sx)
        if best is None or stat > best[0] or (stat == best[0] and t < best[1]):
            best = (stat, t)
    assert row["t_index"] == best[1]
    assert abs(row["cusum_stat"] - best[0] / n) < 1e-9
    assert row["n_hours"] == n


def test_pseudonymization_preserves_referential_integrity(spark):
    from etlalchemy_spark.queries.etl import etl_pseudonymize_referential

    rows = {r["side"]: r for r in etl_pseudonymize_referential(spark, SF_DIR).collect()}
    assert rows["raw"]["n_joined"] == rows["anonymized"]["n_joined"]
    assert rows["raw"]["n_distinct_keys"] == rows["anonymized"]["n_distinct_keys"]


def test_ks_drift_against_brute_force(spark):
    from etlalchemy_spark.queries.aggregates import agg_ks_drift_test

    row = agg_ks_drift_test(spark, SF_DIR).collect()[0]
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").selectExpr(
        "CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT) AS vc",
        "CAST(l_shipdate AS TIMESTAMP) AS sd",
    ).collect()
    import datetime

    a_lo = datetime.datetime(1996, 1, 1)
    a_hi = datetime.datetime(1997, 1, 1)
    b_hi = datetime.datetime(1998, 1, 1)
    sa = sorted(r["vc"] for r in li if a_lo <= r["sd"] < a_hi)
    sb = sorted(r["vc"] for r in li if a_hi <= r["sd"] < b_hi)
    n1, n2 = len(sa), len(sb)
    vals = sorted(set(sa) | set(sb))
    import bisect

    best = None
    for v in vals:
        ca = bisect.bisect_right(sa, v)
        cb = bisect.bisect_right(sb, v)
        d = abs(n2 * ca - n1 * cb)
        if best is None or d > best[0] or (d == best[0] and v < best[1]):
            best = (d, v)
    assert row["n1"] == n1 and row["n2"] == n2
    assert abs(row["ks_stat"] - best[0] / (n1 * n2)) < 1e-12
    assert abs(row["at_price"] - best[1] / 10000.0) < 1e-9
    assert 0.0 <= row["ks_stat"] <= 1.0


def test_mmr_diversifies_vs_plain_topk(spark):
    from etlalchemy_spark.queries.similarity import (
        _MMR_K,
        sim_mmr_diverse_topk,
    )

    rows = sorted(sim_mmr_diverse_topk(spark, SF_DIR).collect(), key=lambda r: r["step"])
    assert len(rows) == _MMR_K
    assert len({r["vec_id"] for r in rows}) == _MMR_K
    # step 1 is the plain argmax-relevance pick
    assert rows[0]["relevance"] == max(r["relevance"] for r in rows)
    # every pick is a real shortlist member with a sane cosine
    for r in rows:
        assert -1.0 <= r["relevance"] <= 1.0
