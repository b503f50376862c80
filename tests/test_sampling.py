"""Deterministic sampling + exact-MinHash operator tests."""

import pytest
from pyspark.sql import functions as F

from etlalchemy_spark.operators.dedup import (
    MINHASH_P,
    md5_prefix60,
    minhash_params,
    minhash_signature_exact,
)
from etlalchemy_spark.operators.sampling import (
    bernoulli_sample,
    fixed_size_per_group,
    hash_bucket,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"grp{i % 4}", " ".join(f"w{(i * 13 + j) % 40}" for j in range(20)))
        for i in range(200)
    ]
    return spark.createDataFrame(rows, "id int, grp string, body string")


def test_md5_prefix60_matches_python(spark):
    import hashlib

    vals = ["abc", "", "héllo", "123", "x y z"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", md5_prefix60(F.col("s")).alias("h")).collect()}
    for v in vals:
        assert got[v] == int(hashlib.md5(v.encode()).hexdigest()[:15], 16)


def test_bernoulli_deterministic_and_unbiased(spark, docs):
    s1 = bernoulli_sample(docs, F.col("id"), 0.3, salt="a").select("id").collect()
    s2 = bernoulli_sample(docs, F.col("id"), 0.3, salt="a").select("id").collect()
    assert sorted(r["id"] for r in s1) == sorted(r["id"] for r in s2)
    assert 30 <= len(s1) <= 90  # loose binomial bounds at n=200, p=0.3
    # different salt → different (decorrelated) sample
    s3 = bernoulli_sample(docs, F.col("id"), 0.3, salt="b").select("id").collect()
    assert sorted(r["id"] for r in s3) != sorted(r["id"] for r in s1)


def test_bernoulli_monotone_rates(spark, docs):
    small = {r["id"] for r in bernoulli_sample(docs, F.col("id"), 0.2).select("id").collect()}
    big = {r["id"] for r in bernoulli_sample(docs, F.col("id"), 0.6).select("id").collect()}
    assert small <= big  # nested samples: raising the rate only adds rows


def test_stratified_rates(spark, docs):
    out = stratified_sample(
        docs, F.col("id"), F.col("grp"), {"grp0": 1.0, "grp1": 0.0}, default_rate=0.5
    )
    by_grp = {
        r["grp"]: r["n"]
        for r in out.groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_grp.get("grp0") == 50
    assert "grp1" not in by_grp
    assert 10 <= by_grp.get("grp2", 0) <= 40


def test_fixed_size_per_group(spark, docs):
    out = fixed_size_per_group(docs, ["grp"], F.col("id"), 7)
    counts = [r["n"] for r in out.groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()]
    assert counts == [7, 7, 7, 7]
    # deterministic pick
    a = sorted(r["id"] for r in out.collect())
    b = sorted(r["id"] for r in fixed_size_per_group(docs, ["grp"], F.col("id"), 7).collect())
    assert a == b


def test_hash_bucket_range(spark, docs):
    stats = docs.select(hash_bucket(F.col("id")).alias("b")).agg(
        F.min("b").alias("lo"), F.max("b").alias("hi")
    ).first()
    assert 0 <= stats["lo"] and stats["hi"] < 1_000_000


def test_minhash_params_in_range():
    ps = minhash_params(32)
    assert len(set(ps)) == 32
    for a, b in ps:
        assert 1 <= a < MINHASH_P and 0 <= b < MINHASH_P


def test_minhash_signature_similarity_ordering(spark):
    # near-identical docs should share most minhashes; disjoint docs none
    base = " ".join(f"tok{i}" for i in range(50))
    near = " ".join(f"tok{i}" for i in range(49)) + " tokX"
    far = " ".join(f"other{i}" for i in range(50))
    df = spark.createDataFrame([(1, base), (2, near), (3, far)], "id int, body string")
    sig = minhash_signature_exact(df, "id", "body", k=3, num_hashes=32)
    rows = {r["id"]: [r[f"mh_{j}"] for j in range(32)] for r in sig.collect()}
    agree_near = sum(x == y for x, y in zip(rows[1], rows[2]))
    agree_far = sum(x == y for x, y in zip(rows[1], rows[3]))
    assert agree_near > 20
    assert agree_far == 0
