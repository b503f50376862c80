"""Parquet bloom-filter write option (fmt_parquet_bloom): prove the
option actually lands in the file — identical data written with and
without the bloom option must differ in size by the bloom bitset bytes
— and that the filtered read stays correct."""

import glob
import os

from pyspark.sql import functions as F


def _one_parquet_size(path):
    files = glob.glob(os.path.join(path, "*.parquet"))
    assert len(files) == 1, files
    return os.path.getsize(files[0])


def test_bloom_option_adds_bitset_bytes(spark, tmp_path):
    df = spark.range(0, 50_000).select(
        (F.col("id") * 7919 % 1_000_003).alias("k"), F.col("id").alias("v")
    )
    plain = os.path.join(str(tmp_path), "plain")
    bloom = os.path.join(str(tmp_path), "bloom")
    df.coalesce(1).write.mode("overwrite").parquet(plain)
    (
        df.coalesce(1)
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#k", "true")
        .option("parquet.bloom.filter.expected.ndv#k", "100000")
        .parquet(bloom)
    )
    p, b = _one_parquet_size(plain), _one_parquet_size(bloom)
    # bloom bitset for ndv=100k is ~100+ KB; anything clearly above the
    # plain size proves the option took effect (pyarrow 16 / DuckDB 1.0
    # can't introspect bloom offsets, so the size delta is the pin)
    assert b > p + 10_000, f"bloom file not larger: plain={p} bloom={b}"
    # correctness unchanged
    probe = [1, 7919, 500_000]
    got = sorted(
        r.v for r in spark.read.parquet(bloom).where(F.col("k").isin(probe)).collect()
    )
    want = sorted(r.v for r in df.where(F.col("k").isin(probe)).collect())
    assert got == want and got


def test_balanced_shards_write_and_bound(spark, tmp_path):
    """The shard assignment must land as exactly 8 partition dirs with
    a tight balance bound (hash uniformity: max/min doc count < 1.6 at
    500+ docs), and partitionBy on the assignment column must write
    without any extra shuffle of the data."""
    from etlalchemy_spark.operators.sampling import hash_bucket
    from etlalchemy_spark.queries._util import t

    from conftest import SF_DIR

    d = t(spark, SF_DIR, "documents").select("doc_id", "text")
    assigned = d.withColumn(
        "shard", (hash_bucket(F.col("doc_id"), "shard:") % 8).cast("int")
    )
    out = os.path.join(str(tmp_path), "shards")
    assigned.write.partitionBy("shard").parquet(out)
    dirs = sorted(n for n in os.listdir(out) if n.startswith("shard="))
    assert dirs == [f"shard={i}" for i in range(8)]
    back = spark.read.parquet(out)
    counts = {r.shard: r.n for r in back.groupBy("shard").count().withColumnRenamed("count", "n").collect()}
    assert len(counts) == 8
    assert max(counts.values()) / min(counts.values()) < 1.6, counts
    assert sum(counts.values()) == d.count()
