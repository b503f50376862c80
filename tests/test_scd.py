"""SCD-2 merge: two update cycles over a literal dimension."""

from __future__ import annotations

from pyspark.sql import functions as F

from etlalchemy_spark.operators.scd import scd2_init, scd2_merge


def _snap(spark, rows):
    return spark.createDataFrame(rows, "id int, city string")


def test_scd2_two_cycles(spark):
    dim = scd2_init(_snap(spark, [(1, "nyc"), (2, "sf"), (3, "la")]), "2020-01-01")

    # cycle 1: 1 moves, 3 vanishes, 4 appears
    dim = scd2_merge(
        dim, _snap(spark, [(1, "boston"), (2, "sf"), (4, "austin")]),
        "id", ["city"], "2021-01-01",
    )
    rows = {(r.id, r.city, bool(r.is_current)) for r in dim.collect()}
    assert (1, "nyc", False) in rows and (1, "boston", True) in rows
    assert (2, "sf", True) in rows
    assert (3, "la", False) in rows
    assert (4, "austin", True) in rows
    assert dim.count() == 5

    # cycle 2: 1 moves again — nyc history must survive, boston closes
    dim = scd2_merge(
        dim, _snap(spark, [(1, "chicago"), (2, "sf"), (4, "austin")]),
        "id", ["city"], "2022-01-01",
    )
    one = sorted(
        (r.city, bool(r.is_current), str(r.valid_to)) for r in dim.where(F.col("id") == 1).collect()
    )
    assert one == [
        ("boston", False, "2022-01-01 00:00:00"),
        ("chicago", True, "None"),
        ("nyc", False, "2021-01-01 00:00:00"),
    ]
    # exactly one current row per surviving key
    cur = dim.where("is_current").groupBy("id").count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_scd2_null_safe_change_detection(spark):
    dim = scd2_init(
        spark.createDataFrame([(1, None), (2, "x")], "id int, city string"), "2020-01-01"
    )
    # NULL → value and value → NULL are both changes; NULL → NULL is not
    merged = scd2_merge(
        dim,
        spark.createDataFrame([(1, None), (2, None)], "id int, city string"),
        "id", ["city"], "2021-01-01",
    )
    one = [r for r in merged.where("id = 1").collect()]
    assert len(one) == 1 and bool(one[0].is_current)  # NULL==NULL: unchanged
    two = sorted((str(r.city), bool(r.is_current)) for r in merged.where("id = 2").collect())
    assert two == [("None", True), ("x", False)]


def test_scd2_null_business_key_not_dropped(spark):
    """A current row with a NULL business key must survive the merge
    (null-safe join + presence flags, not key-null sentinels)."""
    dim = scd2_init(
        spark.createDataFrame([(None, "x"), (1, "y")], "id int, city string"),
        "2020-01-01",
    )
    merged = scd2_merge(
        dim,
        spark.createDataFrame([(None, "x"), (1, "y")], "id int, city string"),
        "id", ["city"], "2021-01-01",
    )
    assert merged.count() == 2
    assert merged.where("id IS NULL").count() == 1
    assert all(bool(r.is_current) for r in merged.collect())
