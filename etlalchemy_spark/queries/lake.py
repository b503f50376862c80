"""Versioned-lake-table queries: time travel and rollback reads over
the manifest-snapshot store (operators/lake.py), oracle-checked by
reconstructing the expected snapshot state relationally in DuckDB.

Each query rebuilds its scratch table from the fixture deterministically
(drop → create → commits), so repeated gate runs see identical state;
the interesting machinery — atomic manifest commits, copy-on-write with
file skipping, O(1) snapshot reads — is what produced the rows being
hash-compared.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etlalchemy_spark.operators.lake import (
    lake_append,
    lake_create,
    lake_delete,
    lake_drop,
    lake_read,
    lake_rollback,
    lake_upsert,
)
from etlalchemy_spark.registry import register
from etlalchemy_spark.queries._util import scratch_dir, t

_BASE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]


def _base(spark, sf_dir):
    return t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 7 == 0).select(*_BASE_COLS)


_TIME_TRAVEL_SQL = """
SELECT o_orderkey, o_custkey,
       CASE WHEN o_orderkey % 3 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
       o_totalprice
FROM orders WHERE o_orderkey % 7 = 0
UNION ALL
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
FROM orders WHERE o_orderkey % 7 = 1 AND o_orderkey % 3 = 0
"""


@register("lake_time_travel_read", oracle=_TIME_TRAVEL_SQL, tags=("lake", "etl"))
def lake_time_travel_read(spark, sf_dir):
    """Snapshot isolation + time travel end-to-end: build a versioned
    lake table (v1 create from an orders slice, v2 copy-on-write
    UPSERT that updates every third key and inserts a disjoint slice,
    v3 DELETE of a customer stripe), then TIME-TRAVEL READ v2 — the
    pre-delete snapshot — and hash-compare it against the relational
    reconstruction of exactly that state. The v3 delete happening
    AFTER proves old snapshots are immutable under later commits
    (data files are never touched, only manifests grow). At 100 TB:
    the upsert reads only manifest-stats-overlapping files, the v2
    read is one manifest fetch + a parquet scan of its file list, and
    nothing ever replays a log. Same MERGE semantics as
    `etl_merge_upsert`; what's new is the versioned storage contract
    underneath (operators/lake.py)."""
    root = scratch_dir("lake_tt", sf_dir) + "/tbl"
    lake_drop(spark, root)
    lake_create(spark, root, _base(spark, sf_dir), "o_orderkey")

    orders = t(spark, sf_dir, "orders")
    updates = (
        orders.where((F.col("o_orderkey") % 7 == 0) & (F.col("o_orderkey") % 3 == 0))
        .select(
            "o_orderkey",
            "o_custkey",
            F.lit("X").alias("o_orderstatus"),
            "o_totalprice",
        )
    )
    inserts = orders.where(
        (F.col("o_orderkey") % 7 == 1) & (F.col("o_orderkey") % 3 == 0)
    ).select(*_BASE_COLS)
    v2 = lake_upsert(spark, root, updates.unionByName(inserts))
    lake_delete(spark, root, "o_custkey % 5 = 0")

    return lake_read(spark, root, v2)


_ROLLBACK_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
FROM orders WHERE o_orderkey % 7 = 0
UNION ALL
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
FROM orders WHERE o_orderkey % 7 = 2 AND o_orderkey % 3 = 0
"""


@register("lake_rollback_read", oracle=_ROLLBACK_SQL, tags=("lake", "etl"))
def lake_rollback_read(spark, sf_dir):
    """Rollback as FORWARD commit: v2 corrupts every row's status
    ('BAD' upsert over the whole key range), v3 rolls back to v1 by
    committing v1's file list as a new version (the bad version stays
    in history for audit — nothing is deleted), v4 appends a disjoint
    slice on top of the restored state. The latest read must equal
    v1 + the append, bit-exact — proving rollback restored by
    REFERENCE (v1's untouched files) and that the table keeps
    accepting commits afterwards. Metadata-only rollback cost at any
    table size."""
    root = scratch_dir("lake_rb", sf_dir) + "/tbl"
    lake_drop(spark, root)
    base = _base(spark, sf_dir)
    lake_create(spark, root, base, "o_orderkey")

    bad = base.select(
        "o_orderkey", "o_custkey", F.lit("BAD").alias("o_orderstatus"), "o_totalprice"
    )
    lake_upsert(spark, root, bad)
    lake_rollback(spark, root, 1)

    appended = (
        t(spark, sf_dir, "orders")
        .where((F.col("o_orderkey") % 7 == 2) & (F.col("o_orderkey") % 3 == 0))
        .select(*_BASE_COLS)
    )
    lake_append(spark, root, appended)

    return lake_read(spark, root)
