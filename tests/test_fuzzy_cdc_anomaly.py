"""Fuzzy join, CDC apply, mode, z-score anomaly, TF-IDF semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from etlalchemy_spark.queries._util import t
from etlalchemy_spark.registry import all_queries

from conftest import SF_DIR


def test_fuzzy_pairs_symmetric_free_and_bounded(spark):
    rows = all_queries()["join_fuzzy_levenshtein"].fn(spark, SF_DIR).collect()
    assert rows, "expected some near-name pairs"
    for r in rows:
        assert r["name_a"] < r["name_b"]  # each unordered pair once
        assert 1 <= r["dist"] <= 3


def test_cdc_apply_semantics(spark):
    out = all_queries()["etl_cdc_apply"].fn(spark, SF_DIR)
    o = t(spark, SF_DIR, "orders")
    n_total = o.count()
    n_deleted = o.where(F.col("o_orderkey") % 7 == 3).count()
    assert out.count() == n_total - n_deleted
    # updated keys carry +100; a deleted key is absent
    upd = (
        out.join(o.select("o_orderkey", F.col("o_totalprice").alias("orig")), "o_orderkey")
        .where(F.col("o_orderkey") % 10 == 0)
    )
    bad = upd.where(F.abs(F.col("o_totalprice") - (F.col("orig") + 100.0)) > 1e-9)
    assert bad.count() == 0
    assert out.where(F.col("o_orderkey") % 7 == 3).count() == 0


def test_mode_matches_value_counts(spark):
    got = {
        r["l_returnflag"]: (r["mode_qty"], r["mode_cnt"])
        for r in all_queries()["agg_mode_exact"].fn(spark, SF_DIR).collect()
    }
    li = t(spark, SF_DIR, "lineitem")
    for flag, (qty, cnt) in got.items():
        counts = (
            li.where(F.col("l_returnflag") == flag)
            .groupBy("l_quantity")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        mx = counts.agg(F.max("c")).collect()[0][0]
        assert cnt == mx
        ties = {r["l_quantity"] for r in counts.where(F.col("c") == mx).collect()}
        assert qty == min(ties)  # deterministic tie-break


def test_zscore_anomalies_are_outliers(spark):
    out = all_queries()["ts_zscore_anomaly"].fn(spark, SF_DIR)
    rows = out.collect()
    assert rows, "fixture should contain rolling outliers"
    assert all(abs(r["zscore"]) > 2.5 for r in rows)


def test_tfidf_rare_term_outranks_common(spark):
    docs = [
        (1, "alpha alpha alpha common"),
        (2, "beta common common"),
        (3, "gamma common"),
        (4, "common delta"),
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("term")
    ).where(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = toks.select("doc_id", "term").distinct().groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    scored = tf.join(dfreq, "term").select(
        "doc_id", "term",
        (F.col("tf").cast("double") * (F.lit(4.0) / F.col("df").cast("double"))).alias("s"),
    )
    top = {r["doc_id"]: r["term"] for r in
           scored.withColumn(
               "rn",
               F.row_number().over(
                   __import__("pyspark.sql.window", fromlist=["Window"]).Window
                   .partitionBy("doc_id").orderBy(F.desc("s"), F.asc("term"))
               ),
           ).where(F.col("rn") == 1).collect()}
    # doc-unique terms beat the shared 'common' term in every doc
    assert top == {1: "alpha", 2: "beta", 3: "gamma", 4: "delta"}
