"""Z-order layout: interleave correctness + clustering quality."""

import os

from pyspark.sql import functions as F

from etlalchemy_spark.operators.layout import zorder_value, zorder_write


def _py_z(x, y, bits=16):
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_value_matches_python(spark):
    rows = [(3, 5), (0, 0), (65535, 65535), (1234, 4321)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zorder_value(F.col("x"), F.col("y")).alias("z")).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _py_z(x, y)


def test_zorder_write_prunes_both_dims(spark, tmp_path):
    # a grid where row id correlates with NEITHER dim alone
    rows = [(i % 64, (i * 37) % 64, i) for i in range(4096)]
    df = spark.createDataFrame(rows, "x int, y int, payload int")
    path = os.path.join(str(tmp_path), "z")
    zorder_write(df, path, "x", "y", n_files=8, bits=6)

    back = spark.read.parquet(path).withColumn("f", F.input_file_name())
    spans = back.groupBy("f").agg(
        (F.max("x") - F.min("x")).alias("sx"),
        (F.max("y") - F.min("y")).alias("sy"),
    ).collect()
    # each file must cover well under the full 0..63 range in BOTH dims
    avg_sx = sum(r["sx"] for r in spans) / len(spans)
    avg_sy = sum(r["sy"] for r in spans) / len(spans)
    assert avg_sx < 48 and avg_sy < 48
    # and the data round-trips completely
    assert back.count() == 4096
