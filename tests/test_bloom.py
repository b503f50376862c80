"""Portable bloom filter: no false negatives, bounded false positives."""

from pyspark.sql import functions as F

from etlalchemy_spark.operators.bloom import bloom_build, bloom_probe


def test_bloom_no_false_negatives(spark):
    keys = spark.createDataFrame([(i,) for i in range(0, 200, 2)], "k long")
    bloom = bloom_build(keys, F.col("k"))
    probed = bloom_probe(keys, F.col("k"), bloom)
    assert probed.where(~F.col("bloom_pass")).count() == 0


def test_bloom_false_positive_rate(spark):
    members = spark.createDataFrame([(i,) for i in range(100)], "k long")
    others = spark.createDataFrame([(i,) for i in range(10_000, 12_000)], "k long")
    bloom = bloom_build(members, F.col("k"))
    fp = bloom_probe(others, F.col("k"), bloom).where(F.col("bloom_pass")).count()
    # theory: (1 - e^(-kn/m))^k ≈ 0.8% at k=7, n=100, m=1024 → allow 5×
    assert fp / 2000 < 0.04


def test_bloom_empty_build_rejects_all(spark):
    empty = spark.createDataFrame([], "k long")
    bloom = bloom_build(empty, F.col("k"))
    others = spark.createDataFrame([(i,) for i in range(50)], "k long")
    assert bloom_probe(others, F.col("k"), bloom).where(F.col("bloom_pass")).count() == 0


def test_bloom_probe_preserves_user_words_column(spark):
    # a user column named "words" must survive the probe untouched
    df = spark.createDataFrame([(1, "a b"), (2, "c d")], "k long, words string")
    bloom = bloom_build(df, F.col("k"))
    out = bloom_probe(df, F.col("k"), bloom)
    assert "words" in out.columns
    assert sorted(r["words"] for r in out.collect()) == ["a b", "c d"]
    assert out.where(~F.col("bloom_pass")).count() == 0


def test_bloom_probe_null_key_is_false(spark):
    """NULL keys get a False verdict, not NULL — a NULL verdict row
    vanishes from BOTH sides of a where(col)/where(~col) split."""
    from pyspark.sql import functions as F

    from etlalchemy_spark.operators.bloom import bloom_build, bloom_probe

    keys = spark.createDataFrame([(1,), (2,)], "k int")
    bloom = bloom_build(keys, F.col("k"))
    df = spark.createDataFrame([(1,), (99,), (None,)], "k int")
    out = bloom_probe(df, F.col("k"), bloom)
    verdicts = {r["k"]: r["bloom_pass"] for r in out.collect()}
    assert verdicts[1] is True
    assert verdicts[None] is False
    n_split = out.where(F.col("bloom_pass")).count() + out.where(~F.col("bloom_pass")).count()
    assert n_split == 3  # no row lost between the two branches
