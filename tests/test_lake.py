"""Versioned lake table invariants (operators/lake.py): atomic commit
protocol, O(1) time travel, copy-on-write file skipping, rollback
audit trail, vacuum reachability."""

import json
import os

import pytest
from pyspark.sql import functions as F

from etlalchemy_spark.operators.lake import (
    lake_append,
    lake_create,
    lake_delete,
    lake_drop,
    lake_history,
    lake_read,
    lake_rollback,
    lake_upsert,
    lake_vacuum,
    latest_version,
    _read_manifest,
)


@pytest.fixture()
def root(spark, tmp_path):
    return str(tmp_path / "laketbl")


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def _rows(df):
    return sorted((r.k, r.v) for r in df.collect())


def test_create_append_time_travel(spark, root):
    lake_create(spark, root, _mk(spark, [(1, "a"), (2, "b")]), "k")
    lake_append(spark, root, _mk(spark, [(3, "c")]))
    lake_append(spark, root, _mk(spark, [(4, "d")]))
    assert latest_version(spark, root) == 3
    assert _rows(lake_read(spark, root, 1)) == [(1, "a"), (2, "b")]
    assert _rows(lake_read(spark, root, 2)) == [(1, "a"), (2, "b"), (3, "c")]
    assert _rows(lake_read(spark, root)) == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]
    # append carries parent files by reference — no rewrite
    m1, m2 = _read_manifest(spark, root, 1), _read_manifest(spark, root, 2)
    assert {f["path"] for f in m1["files"]} <= {f["path"] for f in m2["files"]}


def test_upsert_file_skipping_and_semantics(spark, root):
    # low and high key ranges land in separate commit dirs (two files min)
    lake_create(spark, root, _mk(spark, [(1, "a"), (2, "b")]), "k")
    lake_append(spark, root, _mk(spark, [(100, "x"), (200, "y")]))
    v = lake_upsert(spark, root, _mk(spark, [(100, "X"), (150, "new")]))
    assert _rows(lake_read(spark, root, v)) == [
        (1, "a"), (2, "b"), (100, "X"), (150, "new"), (200, "y"),
    ]
    # the low-range file(s) must be carried untouched by reference
    m_parent = _read_manifest(spark, root, v - 1)
    m_new = _read_manifest(spark, root, v)
    # change hull is [100, 150]: the key-200 file is outside it too
    low_files = {
        f["path"] for f in m_parent["files"] if f["max_key"] < 100 or f["min_key"] > 150
    }
    assert low_files and low_files <= {f["path"] for f in m_new["files"]}
    # and the hull-overlapping file(s) must NOT appear in v
    overlapping = {
        f["path"] for f in m_parent["files"] if f["max_key"] >= 100 and f["min_key"] <= 150
    }
    assert overlapping and overlapping.isdisjoint({f["path"] for f in m_new["files"]})
    # time travel still sees the pre-upsert state
    assert _rows(lake_read(spark, root, v - 1)) == [
        (1, "a"), (2, "b"), (100, "x"), (200, "y"),
    ]


def test_delete_prunes_untouched_files(spark, root):
    lake_create(spark, root, _mk(spark, [(1, "a"), (2, "b")]), "k")
    lake_append(spark, root, _mk(spark, [(10, "keep"), (11, "drop")]))
    v = lake_delete(spark, root, "v = 'drop'")
    assert _rows(lake_read(spark, root, v)) == [(1, "a"), (2, "b"), (10, "keep")]
    m_parent = _read_manifest(spark, root, v - 1)
    m_new = _read_manifest(spark, root, v)
    untouched = {f["path"] for f in m_parent["files"] if f["max_key"] <= 2}
    assert untouched and untouched <= {f["path"] for f in m_new["files"]}


def test_rollback_commits_forward(spark, root):
    lake_create(spark, root, _mk(spark, [(1, "a")]), "k")
    lake_upsert(spark, root, _mk(spark, [(1, "BAD")]))
    v = lake_rollback(spark, root, 1)
    assert v == 3
    assert _rows(lake_read(spark, root)) == [(1, "a")]
    # the bad version stays readable (audit trail)
    assert _rows(lake_read(spark, root, 2)) == [(1, "BAD")]
    ops = [h["op"] for h in lake_history(spark, root)]
    assert ops == ["create", "upsert", "rollback:1"]


def test_crash_before_manifest_leaves_version_invisible(spark, root):
    """Data files without a manifest are NOT a committed version — the
    manifest write is the atomic commit point."""
    lake_create(spark, root, _mk(spark, [(1, "a")]), "k")
    # simulate a writer that died after writing data, before manifest
    _mk(spark, [(9, "ghost")]).write.parquet(f"{root}/data/c00000002")
    assert latest_version(spark, root) == 1
    assert _rows(lake_read(spark, root)) == [(1, "a")]


def test_concurrent_commit_collision_fails_loudly(spark, root):
    lake_create(spark, root, _mk(spark, [(1, "a")]), "k")
    m = _read_manifest(spark, root, 1)
    from etlalchemy_spark.operators.lake import _write_manifest

    with pytest.raises(Exception):  # create(overwrite=False) on existing version
        _write_manifest(spark, root, m)


def test_vacuum_reclaims_and_preserves(spark, root):
    lake_create(spark, root, _mk(spark, [(1, "a")]), "k")
    lake_upsert(spark, root, _mk(spark, [(1, "b")]))
    lake_upsert(spark, root, _mk(spark, [(1, "c")]))
    stats = lake_vacuum(spark, root, retain_last=1)
    assert stats["removed_files"] >= 1 and stats["removed_manifests"] == 2
    assert _rows(lake_read(spark, root)) == [(1, "c")]
    with pytest.raises(ValueError, match="no version 1"):
        lake_read(spark, root, 1)


def test_empty_change_set_is_metadata_only(spark, root):
    lake_create(spark, root, _mk(spark, [(1, "a")]), "k")
    v = lake_upsert(spark, root, _mk(spark, []).limit(0))
    assert v == 2
    assert _rows(lake_read(spark, root)) == [(1, "a")]
    m1, m2 = _read_manifest(spark, root, 1), _read_manifest(spark, root, 2)
    assert m1["files"] == m2["files"]


def test_drop_removes_table(spark, root):
    lake_create(spark, root, _mk(spark, [(1, "a")]), "k")
    lake_drop(spark, root)
    with pytest.raises(ValueError, match="not a lake table"):
        latest_version(spark, root)


def test_stream_append_replay_is_exactly_once(spark, root):
    """A re-delivered micro-batch (same batch id) must SKIP: the
    idempotence tag is already committed, so the table never double-
    appends under foreachBatch's at-least-once contract."""
    from etlalchemy_spark.operators.lake import lake_stream_append

    b0 = _mk(spark, [(1, "a"), (2, "b")])
    b1 = _mk(spark, [(3, "c")])
    assert lake_stream_append(spark, root, b0, 0, "k") == 1
    assert lake_stream_append(spark, root, b1, 1, "k") == 2
    # engine restarts and re-delivers both batches
    assert lake_stream_append(spark, root, b0, 0, "k") is None
    assert lake_stream_append(spark, root, b1, 1, "k") is None
    assert _rows(lake_read(spark, root)) == [(1, "a"), (2, "b"), (3, "c")]
    assert latest_version(spark, root) == 2


def test_changes_reads_only_diff_files(spark, root):
    """lake_changes must not plan over carried files — the file-diff
    pruning is the whole point."""
    from etlalchemy_spark.operators.lake import lake_changes

    lake_create(spark, root, _mk(spark, [(1, "a"), (2, "b")]), "k")
    lake_append(spark, root, _mk(spark, [(100, "x")]))
    lake_upsert(spark, root, _mk(spark, [(100, "X"), (150, "new")]))
    cdf = lake_changes(spark, root, 2, 3)
    got = sorted((r.op, r.k, r.v) for r in cdf.collect())
    assert got == [("+", 100, "X"), ("+", 150, "new"), ("-", 100, "x")]
    # the carried low-range file must not appear in the scan plan
    m2 = _read_manifest(spark, root, 2)
    low = [f["path"] for f in m2["files"] if f["max_key"] < 100]
    plan = cdf._jdf.queryExecution().executedPlan().toString()
    assert low and all(p.rsplit("/", 1)[-1] not in plan for p in low)


def test_compact_preserves_state_and_reduces_files(spark, root):
    from etlalchemy_spark.operators.lake import lake_compact

    lake_create(spark, root, _mk(spark, [(1, "a"), (2, "b")]), "k")
    for i in range(3, 7):
        lake_append(spark, root, _mk(spark, [(i, f"v{i}")]).coalesce(1))
    before = _rows(lake_read(spark, root))
    v_pre = latest_version(spark, root)
    v = lake_compact(spark, root, small_rows=2, target_partitions=1)
    assert _rows(lake_read(spark, root, v)) == before
    m_pre, m_post = _read_manifest(spark, root, v_pre), _read_manifest(spark, root, v)
    assert len(m_post["files"]) < len(m_pre["files"])
    # pre-compaction layout stays time-travelable
    assert _rows(lake_read(spark, root, v_pre)) == before
    # nothing-to-pack is a metadata-only no-op commit
    v2 = lake_compact(spark, root, small_rows=1)
    assert _read_manifest(spark, root, v2)["files"] == m_post["files"]


def test_schema_evolution_null_fills_old_files(spark, root):
    lake_create(spark, root, _mk(spark, [(1, "a")]), "k")
    widened = spark.createDataFrame([(2, "b", 99)], "k long, v string, extra long")
    lake_append(spark, root, widened)
    got = sorted((r.k, r.v, r.extra) for r in lake_read(spark, root).collect())
    assert got == [(1, "a", None), (2, "b", 99)]
