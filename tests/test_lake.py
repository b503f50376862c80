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


def test_upsert_after_schema_evolution_preserves_evolved_column(spark, root):
    """A copy-on-write rewrite spanning an additive schema evolution
    must carry the union schema: rows that merely ride along in the
    rewrite keep their evolved-column values (ADVICE r8 high)."""
    lake_create(spark, root, _mk(spark, [(1, "a"), (5, "e")]), "k")
    widened = spark.createDataFrame([(10, "x", 50)], "k long, v string, extra long")
    lake_append(spark, root, widened)
    # change hull [1, 10] overlaps BOTH files -> both rewritten
    lake_upsert(spark, root, _mk(spark, [(1, "A"), (10, "X")]))
    got = sorted(
        (r.k, r.v, r.extra) for r in lake_read(spark, root).collect()
    )
    # (5,'e') rode along from the narrow file (extra null-fills);
    # (10,'X') was updated but must NOT lose its carried 'extra'... the
    # update REPLACES the row, so extra becomes NULL by upsert
    # semantics; the ADVICE bug was (5,'e',50) losing a column it never
    # had vs rows like the untouched-but-rewritten ones. Pin the
    # non-updated carried row from the WIDE file instead:
    lake_upsert(spark, root, spark.createDataFrame(
        [(5, "E", 55)], "k long, v string, extra long"))
    got = sorted((r.k, r.v, r.extra) for r in lake_read(spark, root).collect())
    assert got == [(1, "A", None), (5, "E", 55), (10, "X", None)]


def test_upsert_rides_along_wide_rows_without_dropping_column(spark, root):
    """Exact ADVICE r8 repro: narrow create, widened append, then an
    upsert whose rewrite touches both files — the wide row that is NOT
    in the change set must keep its evolved column."""
    lake_create(spark, root, _mk(spark, [(1, "a")]), "k")
    lake_append(
        spark, root,
        spark.createDataFrame([(5, "e", 50)], "k long, v string, extra long"),
    )
    lake_upsert(spark, root, _mk(spark, [(1, "A"), (5, "e2")]).where("k = 1"))
    # hull [1,1] touches only the narrow file; widen the hull to [1,9]
    lake_upsert(spark, root, _mk(spark, [(2, "b"), (9, "i")]))
    got = sorted((r.k, r.v, r.extra) for r in lake_read(spark, root).collect())
    assert got == [(1, "A", None), (2, "b", None), (5, "e", 50), (9, "i", None)]


def test_delete_after_schema_evolution_keeps_null_predicate_rows(spark, root):
    """DELETE with a predicate on an evolved column: old rows null-fill,
    predicate evaluates NULL there, and those rows must SURVIVE."""
    lake_create(spark, root, _mk(spark, [(1, "a"), (2, "b")]), "k")
    lake_append(
        spark, root,
        spark.createDataFrame(
            [(10, "x", 99), (11, "y", 1)], "k long, v string, extra long"
        ),
    )
    lake_delete(spark, root, "extra = 99")
    got = sorted((r.k, r.v, r.extra) for r in lake_read(spark, root).collect())
    assert got == [(1, "a", None), (2, "b", None), (11, "y", 1)]


def test_changes_across_schema_evolution_boundary(spark, root):
    """CDF spanning an evolution boundary must align schemas and keep
    rows differing only in the evolved column (ADVICE r8 medium)."""
    from etlalchemy_spark.operators.lake import lake_changes

    lake_create(spark, root, _mk(spark, [(1, "a"), (2, "b")]), "k")
    lake_append(
        spark, root,
        spark.createDataFrame([(3, "c", 30)], "k long, v string, extra long"),
    )
    cdf = lake_changes(spark, root, 1, 2)
    got = sorted((r.op, r.k, r.v, r.extra) for r in cdf.collect())
    assert got == [("+", 3, "c", 30)]
    # update that changes ONLY the evolved column must show up
    lake_upsert(
        spark, root,
        spark.createDataFrame([(3, "c", 31)], "k long, v string, extra long"),
    )
    cdf2 = lake_changes(spark, root, 2, 3)
    got2 = sorted((r.op, r.k, r.v, r.extra) for r in cdf2.collect())
    assert ("+", 3, "c", 31) in got2 and ("-", 3, "c", 30) in got2


def test_dangling_commit_dir_does_not_wedge_table(spark, root):
    """A writer crash after data-write but before manifest (ADVICE r8
    medium): the dangling directory must not block subsequent commits,
    and vacuum must sweep the orphaned files AND the directory."""
    lake_create(spark, root, _mk(spark, [(1, "a")]), "k")
    # crashed attempt at the next version, old fixed-name layout
    _mk(spark, [(9, "ghost")]).write.parquet(f"{root}/data/c00000002")
    v = lake_append(spark, root, _mk(spark, [(2, "b")]))  # must not raise
    assert v == 2
    assert _rows(lake_read(spark, root)) == [(1, "a"), (2, "b")]
    # two crashed attempts at the SAME version are fine under nonce dirs
    from etlalchemy_spark.operators.lake import _commit_data

    _commit_data(spark, root, 3, _mk(spark, [(7, "g1")]), "k")
    _commit_data(spark, root, 3, _mk(spark, [(8, "g2")]), "k")
    v = lake_append(spark, root, _mk(spark, [(3, "c")]))
    assert v == 3
    assert _rows(lake_read(spark, root)) == [(1, "a"), (2, "b"), (3, "c")]
    stats = lake_vacuum(spark, root, retain_last=1)
    assert stats["removed_files"] >= 3  # ghost + g1 + g2 at minimum
    assert _rows(lake_read(spark, root)) == [(1, "a"), (2, "b"), (3, "c")]


def test_upsert_all_null_keys_inserts_not_discards(spark, root):
    """A non-empty change set whose keys are all NULL takes the insert
    path (consistent with how null-key rows behave when mixed with
    non-null ones), never the silent metadata-no-op (ADVICE r8 low)."""
    lake_create(spark, root, _mk(spark, [(1, "a")]), "k")
    nulls = spark.createDataFrame([(None, "n1"), (None, "n2")], "k long, v string")
    v = lake_upsert(spark, root, nulls)
    got = sorted(
        ((r.k, r.v) for r in lake_read(spark, root, v).collect()),
        key=lambda t: (t[0] is not None, t[0] or 0, t[1]),
    )
    assert got == [(None, "n1"), (None, "n2"), (1, "a")]


def test_stream_append_txn_watermark_o1_and_survives_maintenance(spark, root):
    """Replay detection reads ONE manifest field (txns watermark), and
    the watermark survives interleaved maintenance commits — a compact
    or upsert between micro-batches must not reopen the door to a
    double-append (ADVICE r8 low)."""
    from etlalchemy_spark.operators.lake import lake_compact, lake_stream_append

    assert lake_stream_append(spark, root, _mk(spark, [(1, "a")]), 0, "k") == 1
    assert lake_stream_append(spark, root, _mk(spark, [(2, "b")]), 1, "k") == 2
    # maintenance commits between batches
    lake_compact(spark, root, small_rows=10, target_partitions=1)
    lake_upsert(spark, root, _mk(spark, [(2, "B")]))
    lake_rollback(spark, root, 3)
    # replays of both batches must STILL skip
    assert lake_stream_append(spark, root, _mk(spark, [(1, "a")]), 0, "k") is None
    assert lake_stream_append(spark, root, _mk(spark, [(2, "b")]), 1, "k") is None
    m = _read_manifest(spark, root, latest_version(spark, root))
    assert m["txns"] == {"stream-append": 1}
    # and a NEW batch still commits
    assert lake_stream_append(spark, root, _mk(spark, [(3, "c")]), 2, "k") is not None


def test_concurrent_writers_loser_retries_cleanly(spark, root):
    """Two writers racing the same parent version: exactly one manifest
    create wins; the loser's data stays invisible, it retries onto the
    next version, and no reader ever sees a torn state (VERDICT r8 #6)."""
    from etlalchemy_spark.operators.lake import _commit_data, _write_manifest

    lake_create(spark, root, _mk(spark, [(1, "a")]), "k")
    parent = latest_version(spark, root)
    m = _read_manifest(spark, root, parent)
    v = parent + 1
    # both writers have written their data for version 2
    files_a = _commit_data(spark, root, v, _mk(spark, [(2, "A")]), "k")
    files_b = _commit_data(spark, root, v, _mk(spark, [(3, "B")]), "k")
    # writer A commits first and wins
    _write_manifest(spark, root, {"version": v, "parent": parent, "op": "append",
                                  "key": "k", "files": m["files"] + files_a})
    # writer B loses the race LOUDLY
    with pytest.raises(Exception):
        _write_manifest(spark, root, {"version": v, "parent": parent,
                                      "op": "append", "key": "k",
                                      "files": m["files"] + files_b})
    # reader between the attempts sees only A's committed state
    assert _rows(lake_read(spark, root)) == [(1, "a"), (2, "A")]
    # B retries against the NEW latest: its data files are already on
    # disk and referenced by full path, so the retry is metadata-only
    parent2 = latest_version(spark, root)
    m2 = _read_manifest(spark, root, parent2)
    _write_manifest(spark, root, {"version": parent2 + 1, "parent": parent2,
                                  "op": "append", "key": "k",
                                  "files": m2["files"] + files_b})
    assert _rows(lake_read(spark, root)) == [(1, "a"), (2, "A"), (3, "B")]
    ops = [h["op"] for h in lake_history(spark, root)]
    assert ops == ["create", "append", "append"]


# --- deletion vectors (merge-on-read) ----------------------------------------

from etlalchemy_spark.operators.lake import (  # noqa: E402
    lake_changes,
    lake_compact,
    lake_compact_dvs,
    lake_delete_dv,
)


def test_dv_delete_leaves_files_untouched_and_time_travels(spark, root):
    lake_create(spark, root, _mk(spark, [(1, "a"), (2, "b"), (3, "c"), (4, "d")]), "k")
    v2 = lake_delete_dv(spark, root, "k % 2 = 0")
    m1, m2 = _read_manifest(spark, root, 1), _read_manifest(spark, root, v2)
    # data files are IDENTICAL by path — nothing was rewritten
    assert [f["path"] for f in m1["files"]] == [f["path"] for f in m2["files"]]
    assert m2["dvs"] and m2["dvs"][0]["rows"] == 2
    assert _rows(lake_read(spark, root)) == [(1, "a"), (3, "c")]
    # the pre-delete snapshot still sees every row
    assert _rows(lake_read(spark, root, 1)) == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]


def test_dv_append_carries_vectors_and_never_marks_new_files(spark, root):
    lake_create(spark, root, _mk(spark, [(1, "a"), (2, "b")]), "k")
    lake_delete_dv(spark, root, "k = 2")
    # an append must not resurrect the deleted row (dvs carried forward)
    lake_append(spark, root, _mk(spark, [(2, "fresh")]))
    assert _rows(lake_read(spark, root)) == [(1, "a"), (2, "fresh")]


def test_dv_delete_is_idempotent_on_live_scan(spark, root):
    lake_create(spark, root, _mk(spark, [(1, "a"), (2, "b")]), "k")
    lake_delete_dv(spark, root, "k = 2")
    v3 = lake_delete_dv(spark, root, "k = 2")  # matches nothing live
    m3 = _read_manifest(spark, root, v3)
    assert len(m3["dvs"]) == 1  # no second vector was recorded
    assert _rows(lake_read(spark, root)) == [(1, "a")]


def test_dv_cow_upsert_does_not_resurrect(spark, root):
    lake_create(spark, root, _mk(spark, [(1, "a"), (2, "b"), (3, "c")]), "k")
    lake_delete_dv(spark, root, "k = 2")
    lake_upsert(spark, root, _mk(spark, [(3, "C"), (4, "d")]))  # rewrites the file
    assert _rows(lake_read(spark, root)) == [(1, "a"), (3, "C"), (4, "d")]


def test_dv_cow_delete_does_not_resurrect(spark, root):
    lake_create(spark, root, _mk(spark, [(1, "a"), (2, "b"), (3, "c")]), "k")
    lake_delete_dv(spark, root, "k = 2")
    lake_delete(spark, root, "k = 3")  # COW rewrite of the same file
    assert _rows(lake_read(spark, root)) == [(1, "a")]


def test_dv_small_file_compaction_applies_vectors(spark, root):
    lake_create(spark, root, _mk(spark, [(1, "a")]), "k")
    lake_append(spark, root, _mk(spark, [(2, "b")]))
    lake_delete_dv(spark, root, "k = 2")
    lake_compact(spark, root, small_rows=10**9, target_partitions=1)
    assert _rows(lake_read(spark, root)) == [(1, "a")]


def test_dv_compact_folds_clears_and_carries_clean_files(spark, root):
    lake_create(spark, root, _mk(spark, [(1, "a"), (2, "b")]), "k")
    lake_append(spark, root, _mk(spark, [(10, "x")]))  # clean file
    lake_delete_dv(spark, root, "k = 1")
    before = _rows(lake_read(spark, root))
    v = lake_compact_dvs(spark, root)
    m = _read_manifest(spark, root, v)
    assert m["dvs"] == []
    assert _rows(lake_read(spark, root)) == before == [(2, "b"), (10, "x")]
    # the clean file carried by reference
    clean = {f["path"] for f in _read_manifest(spark, root, 2)["files"]} - {
        f["path"] for f in _read_manifest(spark, root, 1)["files"]
    }
    assert clean <= {f["path"] for f in m["files"]}


def test_dv_rollback_restores_vector_state(spark, root):
    lake_create(spark, root, _mk(spark, [(1, "a"), (2, "b")]), "k")
    v2 = lake_delete_dv(spark, root, "k = 2")
    lake_delete_dv(spark, root, "k = 1")
    lake_rollback(spark, root, v2)  # restore: only k=2 deleted
    assert _rows(lake_read(spark, root)) == [(1, "a")]
    lake_rollback(spark, root, 1)  # restore the vector-free state
    assert _rows(lake_read(spark, root)) == [(1, "a"), (2, "b")]


def test_dv_change_feed_emits_removed_rows(spark, root):
    lake_create(spark, root, _mk(spark, [(1, "a"), (2, "b"), (3, "c")]), "k")
    v2 = lake_delete_dv(spark, root, "k >= 2")
    ch = lake_changes(spark, root, 1, v2)
    got = sorted((r.op, r.k, r.v) for r in ch.collect())
    assert got == [("-", 2, "b"), ("-", 3, "c")]


def test_dv_change_feed_filters_window_added_files(spark, root):
    lake_create(spark, root, _mk(spark, [(1, "a")]), "k")
    lake_append(spark, root, _mk(spark, [(2, "b"), (3, "c")]))
    v3 = lake_delete_dv(spark, root, "k = 3")
    # appended-then-DV-deleted inside the window: '+' only for the live row
    ch = lake_changes(spark, root, 1, v3)
    got = sorted((r.op, r.k, r.v) for r in ch.collect())
    assert got == [("+", 2, "b")]


def test_dv_change_feed_rollback_resurrects(spark, root):
    lake_create(spark, root, _mk(spark, [(1, "a"), (2, "b")]), "k")
    v2 = lake_delete_dv(spark, root, "k = 2")
    v3 = lake_rollback(spark, root, 1)
    ch = lake_changes(spark, root, v2, v3)
    got = sorted((r.op, r.k, r.v) for r in ch.collect())
    assert got == [("+", 2, "b")]


def test_dv_vacuum_reachability(spark, root):
    lake_create(spark, root, _mk(spark, [(1, "a"), (2, "b")]), "k")
    lake_delete_dv(spark, root, "k = 2")
    stats = lake_vacuum(spark, root, retain_last=1)
    assert stats["removed_dv_dirs"] == 0  # reachable vector kept
    assert _rows(lake_read(spark, root)) == [(1, "a")]
    lake_compact_dvs(spark, root)
    stats = lake_vacuum(spark, root, retain_last=1)
    assert stats["removed_dv_dirs"] == 1  # orphaned vector swept
    assert _rows(lake_read(spark, root)) == [(1, "a")]


def test_dv_stream_append_carries_vectors(spark, root):
    from etlalchemy_spark.operators.lake import lake_stream_append

    lake_stream_append(spark, root, _mk(spark, [(1, "a"), (2, "b")]), 0, "k")
    lake_delete_dv(spark, root, "k = 2")
    lake_stream_append(spark, root, _mk(spark, [(3, "c")]), 1, "k")
    assert _rows(lake_read(spark, root)) == [(1, "a"), (3, "c")]
    # replayed batch still skips, with vectors intact
    assert lake_stream_append(spark, root, _mk(spark, [(3, "c")]), 1, "k") is None
    assert _rows(lake_read(spark, root)) == [(1, "a"), (3, "c")]


def test_dv_delete_keys_hull_pruning_and_exactly_once(spark, root):
    from etlalchemy_spark.operators.lake import lake_delete_dv_keys

    lake_create(spark, root, _mk(spark, [(1, "a"), (2, "b")]), "k")
    lake_append(spark, root, _mk(spark, [(100, "x"), (200, "y")]))
    keys = _mk(spark, [(200, "_")]).select("k")
    v = lake_delete_dv_keys(spark, root, keys, app="scrub", batch_id=0)
    assert v == 3
    assert _rows(lake_read(spark, root)) == [(1, "a"), (2, "b"), (100, "x")]
    # replayed batch id skips without touching state
    assert lake_delete_dv_keys(spark, root, keys, app="scrub", batch_id=0) is None
    assert latest_version(spark, root) == 3
    # a later batch with an all-null / empty key set commits metadata-only
    empty = keys.where("k < 0")
    v2 = lake_delete_dv_keys(spark, root, empty, app="scrub", batch_id=1)
    assert v2 == 4
    m = _read_manifest(spark, root, v2)
    assert len(m["dvs"]) == 1  # no empty vector appended
    assert _rows(lake_read(spark, root)) == [(1, "a"), (2, "b"), (100, "x")]


def test_stats_pruned_range_read(spark, root):
    from etlalchemy_spark.operators.lake import lake_read_range

    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 100).alias("v")
    )
    # date-cluster analog: range-partition by v so per-file hulls are tight
    lake_create(
        spark, root, df.repartitionByRange(5, "v"), "k", stat_cols=["v"]
    )
    out, kept, total = lake_read_range(spark, root, "v", 10, 25)
    assert kept < total  # the prune actually happened, from metadata only
    assert out.count() == df.where("v between 10 and 25").count()
    # conservative on a column without stats: nothing pruned, still correct
    out2, kept2, total2 = lake_read_range(spark, root, "k", 10, 25)
    assert kept2 == total2
    assert out2.count() == 16
    # stats keep riding later commits (appends re-derive them)
    lake_append(spark, root, df.where("v = 50").limit(5))
    out3, kept3, total3 = lake_read_range(spark, root, "v", 10, 25)
    assert kept3 < total3 and out3.count() == df.where("v between 10 and 25").count()
    # deletion vectors still apply under the pruned scan
    from etlalchemy_spark.operators.lake import lake_delete_dv

    lake_delete_dv(spark, root, "v = 10")
    out4, _, _ = lake_read_range(spark, root, "v", 10, 25)
    assert out4.count() == df.where("v between 11 and 25").count()


def test_dv_change_feed_mixed_window_and_empty_upsert_carry(spark, root):
    lake_create(spark, root, _mk(spark, [(1, "a"), (2, "b"), (3, "c")]), "k")
    lake_delete_dv(spark, root, "k = 2")
    # metadata-only (empty-changes) upsert must carry the vectors
    v3 = lake_upsert(spark, root, _mk(spark, []).limit(0))
    assert _read_manifest(spark, root, v3).get("dvs")
    assert _rows(lake_read(spark, root)) == [(1, "a"), (3, "c")]
    # one CDF window spanning a DV delete AND a COW upsert
    lake_upsert(spark, root, _mk(spark, [(3, "C"), (4, "d")]))
    ch = sorted((r.op, r.k, r.v) for r in lake_changes(spark, root, 1, 4).collect())
    assert ch == [("+", 3, "C"), ("+", 4, "d"), ("-", 2, "b"), ("-", 3, "c")]


def test_shallow_clone_zero_copy_and_independence(spark, root):
    from etlalchemy_spark.operators.lake import lake_shallow_clone

    src, dst = root + "/src", root + "/dst"
    lake_create(spark, src, _mk(spark, [(1, "a"), (2, "b")]), "k")
    lake_delete_dv(spark, src, "k = 2")
    lake_shallow_clone(spark, src, dst)
    # clone sees the source's LIVE state (vectors inherited), zero copy
    assert _rows(lake_read(spark, dst)) == [(1, "a")]
    m = _read_manifest(spark, dst, 1)
    assert {f["path"] for f in m["files"]} == {
        f["path"] for f in _read_manifest(spark, src, 1)["files"]
    }
    # clone evolves independently; the source never moves
    lake_append(spark, dst, _mk(spark, [(3, "c")]))
    lake_delete_dv(spark, dst, "k = 1")
    assert _rows(lake_read(spark, dst)) == [(3, "c")]
    assert _rows(lake_read(spark, src)) == [(1, "a")]
    assert latest_version(spark, src) == 2
    # cloning a historical version pins that snapshot
    dst2 = root + "/dst2"
    lake_shallow_clone(spark, src, dst2, version=1)
    assert _rows(lake_read(spark, dst2)) == [(1, "a"), (2, "b")]


def test_check_constraints_strict_and_quarantine(spark, root):
    from etlalchemy_spark.operators.lake import lake_stream_append

    lake_create(
        spark, root, _mk(spark, [(1, "a"), (2, "b")]), "k",
        constraints=["k > 0", "v IS NOT NULL"],
    )
    # strict refuses the whole commit before any row lands
    with pytest.raises(ValueError, match="constraint violation"):
        lake_append(spark, root, _mk(spark, [(3, "c"), (-4, "bad")]))
    assert latest_version(spark, root) == 1
    assert _rows(lake_read(spark, root)) == [(1, "a"), (2, "b")]
    # quarantine admits the valid rows and diverts the rest
    lake_append(
        spark, root, _mk(spark, [(3, "c"), (-4, "bad")]), on_violation="quarantine"
    )
    assert _rows(lake_read(spark, root)) == [(1, "a"), (2, "b"), (3, "c")]
    q = spark.read.parquet(root + "/_quarantine/*")
    assert sorted((r.k, r.v) for r in q.collect()) == [(-4, "bad")]
    # NULL predicate result counts as a violation (never admit unevaluable)
    lake_append(
        spark, root, spark.createDataFrame([(None, "n")], "k long, v string"),
        on_violation="quarantine",
    )
    assert _rows(lake_read(spark, root)) == [(1, "a"), (2, "b"), (3, "c")]
    # streaming ingest goes through the same gate (quarantine, never dies)
    lake_stream_append(spark, root, _mk(spark, [(5, "e"), (-6, "bad")]), 0, "k")
    assert _rows(lake_read(spark, root)) == [(1, "a"), (2, "b"), (3, "c"), (5, "e")]


def test_create_refuses_constraint_violating_seed(spark, root):
    with pytest.raises(ValueError, match="constraint violation"):
        lake_create(
            spark, root, _mk(spark, [(1, "a"), (-2, "b")]), "k", constraints=["k > 0"]
        )


def test_deep_clone_survives_source_vacuum(spark, root):
    from etlalchemy_spark.operators.lake import lake_deep_clone, lake_shallow_clone

    src, shallow, deep = root + "/src", root + "/shallow", root + "/deep"
    lake_create(spark, src, _mk(spark, [(1, "a"), (2, "b")]), "k")
    lake_delete_dv(spark, src, "k = 2")
    lake_shallow_clone(spark, src, shallow)
    lake_deep_clone(spark, src, deep)
    assert _rows(lake_read(spark, deep)) == [(1, "a")]
    # rewrite the source so its old files become unreachable, then vacuum
    lake_upsert(spark, src, _mk(spark, [(1, "A"), (2, "B")]))
    lake_vacuum(spark, src, retain_last=1)
    # the deep clone owns its bytes and still reads
    assert _rows(lake_read(spark, deep)) == [(1, "a")]


def test_fsck_catches_corrupted_stats_and_counts_inert_dvs(spark, root):
    from etlalchemy_spark.operators.lake import lake_compact_dvs, lake_fsck

    lake_create(spark, root, _mk(spark, [(1, "a"), (2, "b"), (3, "c")]), "k")
    lake_delete_dv(spark, root, "k = 2")
    row = lake_fsck(spark, root).collect()[0]
    assert row.n_mismatched_files == 0 and row.dv_live_rows == 1 and row.dv_inert_rows == 0
    # a COW rewrite of a DIFFERENT file carries the vector -> still live
    lake_upsert(spark, root, _mk(spark, [(3, "C")]))
    row = lake_fsck(spark, root).collect()[0]
    assert row.dv_live_rows == 1 and row.dv_inert_rows == 0
    # rewriting the DV'd key's own file strands the vector -> inert
    lake_upsert(spark, root, _mk(spark, [(2, "B2")]))
    assert _rows(lake_read(spark, root)) == [(1, "a"), (2, "B2"), (3, "C")]
    row = lake_fsck(spark, root).collect()[0]
    assert row.dv_live_rows == 0 and row.dv_inert_rows == 1
    lake_compact_dvs(spark, root)
    row = lake_fsck(spark, root).collect()[0]
    assert row.dv_live_rows == 0 and row.dv_inert_rows == 0
    # corrupt a recorded row count: fsck must flag exactly that file
    import json as _json

    v = latest_version(spark, root)
    m = _read_manifest(spark, root, v)
    m["files"][0]["rows"] += 1
    m["version"] = v + 1
    m["parent"] = v
    from etlalchemy_spark.operators.lake import _write_manifest

    _write_manifest(spark, root, m)
    row = lake_fsck(spark, root).collect()[0]
    assert row.n_mismatched_files == 1
    assert row.manifest_rows == row.actual_rows + 1


def test_dv_delete_keys_watermark_advances_with_parent_txns(spark, root):
    """ADVICE r9 high: _with_txns used to overwrite a delete-keys
    manifest's own merged txns with the parent's whenever the parent
    had any — so the scrub watermark never advanced past its first
    batch and a replayed delete re-executed, wrongly deleting keys
    re-inserted in between."""
    from etlalchemy_spark.operators.lake import lake_delete_dv_keys, lake_stream_append

    # parent manifest HAS txns (the bug trigger): table born via stream
    lake_stream_append(spark, root, _mk(spark, [(1, "a"), (2, "b")]), 0, "k")
    keys = _mk(spark, [(2, "_")]).select("k")
    v = lake_delete_dv_keys(spark, root, keys, app="scrub", batch_id=0)
    assert v == 2
    m = _read_manifest(spark, root, v)
    assert m["txns"] == {"stream-append": 0, "scrub": 0}
    # key 2 is re-inserted AFTER the delete committed...
    lake_append(spark, root, _mk(spark, [(2, "b2")]))
    # ...then the delete batch replays (at-least-once): must be a no-op
    assert lake_delete_dv_keys(spark, root, keys, app="scrub", batch_id=0) is None
    assert _rows(lake_read(spark, root)) == [(1, "a"), (2, "b2")]
    # and a genuinely new batch still commits and advances the watermark
    v2 = lake_delete_dv_keys(spark, root, keys, app="scrub", batch_id=1)
    assert v2 is not None
    assert _read_manifest(spark, root, v2)["txns"]["scrub"] == 1
    assert _rows(lake_read(spark, root)) == [(1, "a")]


def test_stream_append_carries_constraints_and_stat_cols(spark, root):
    """ADVICE r9 high: a streaming micro-batch used to drop the
    table's CHECK constraints and stat_cols from its manifest, so the
    NEXT writer stopped enforcing and range reads stopped pruning."""
    from etlalchemy_spark.operators.lake import lake_stream_append

    lake_create(
        spark, root, _mk(spark, [(1, "a")]), "k",
        stat_cols=["v"], constraints=["k > 0"],
    )
    v = lake_stream_append(spark, root, _mk(spark, [(2, "b")]), 0, "k")
    m = _read_manifest(spark, root, v)
    assert m["constraints"] == ["k > 0"] and m["stat_cols"] == ["v"]
    # the post-stream table still enforces on the batch path
    with pytest.raises(ValueError, match="constraint violation"):
        lake_append(spark, root, _mk(spark, [(-3, "bad")]))
    # and new stream files still carry v-stats for pruning
    new_files = [f for f in m["files"] if f not in
                 _read_manifest(spark, root, 1)["files"]]
    assert new_files and all("v" in f.get("stats", {}) for f in new_files)


def test_shallow_clone_carries_constraints(spark, root):
    """ADVICE r9 medium: shallow clones used to drop constraints,
    letting writers bypass the source's CHECK invariants (deep clone
    carried them — the two paths were inconsistent)."""
    from etlalchemy_spark.operators.lake import lake_shallow_clone

    src, dst = root + "/src", root + "/clone"
    lake_create(spark, src, _mk(spark, [(1, "a")]), "k", constraints=["k > 0"])
    lake_shallow_clone(spark, src, dst)
    assert _read_manifest(spark, dst, 1)["constraints"] == ["k > 0"]
    with pytest.raises(ValueError, match="constraint violation"):
        lake_append(spark, dst, _mk(spark, [(-1, "bad")]))


def test_quarantine_skips_write_on_clean_batch(spark, root):
    """ADVICE r9 low: quarantine mode used to write one empty
    _quarantine/ parquet dir per clean micro-batch with no sweeper."""
    from etlalchemy_spark.operators.lake import lake_stream_append

    lake_create(spark, root, _mk(spark, [(1, "a")]), "k", constraints=["k > 0"])
    for b in range(3):  # three clean micro-batches
        lake_stream_append(spark, root, _mk(spark, [(10 + b, "x")]), b, "k")
    assert not os.path.exists(os.path.join(root, "_quarantine"))
    # a dirty batch still quarantines its violating rows
    lake_stream_append(spark, root, _mk(spark, [(5, "e"), (-6, "bad")]), 3, "k")
    q = spark.read.parquet(root + "/_quarantine/*")
    assert [(r.k, r.v) for r in q.collect()] == [(-6, "bad")]


def test_concurrent_append_and_upsert_both_succeed(spark, root, monkeypatch):
    """API-level optimistic retry (VERDICT r9 #5): a competing upsert
    lands BETWEEN the append's data staging and its manifest write —
    deterministically injected — and the append must succeed on its
    own by rebasing metadata-only onto the new latest."""
    import etlalchemy_spark.operators.lake as L

    lake_create(spark, root, _mk(spark, [(1, "a"), (8, "h")]), "k")
    real_write = L._write_manifest
    state = {"injected": False}

    def racing_write(sp, rt, manifest):
        if not state["injected"] and manifest["op"] == "append":
            state["injected"] = True
            L.lake_upsert(sp, rt, _mk(sp, [(8, "H2")]))  # steals this version
        return real_write(sp, rt, manifest)

    monkeypatch.setattr(L, "_write_manifest", racing_write)
    appended_v = L.lake_append(spark, root, _mk(spark, [(2, "b")]))
    assert state["injected"]
    assert appended_v == 3  # v2 went to the racing upsert
    assert _rows(lake_read(spark, root)) == [(1, "a"), (2, "b"), (8, "H2")]
    # the rebase carried the upsert's rewrite BY REFERENCE: every v2
    # file path appears untouched in v3
    m2, m3 = _read_manifest(spark, root, 2), _read_manifest(spark, root, 3)
    assert {f["path"] for f in m2["files"]} <= {f["path"] for f in m3["files"]}
    assert [h["op"] for h in lake_history(spark, root)] == ["create", "upsert", "append"]


def test_concurrent_upsert_re_executes_against_new_state(spark, root, monkeypatch):
    """A COW upsert that loses the race re-EXECUTES (not just re-lists):
    the competing append lands a hull-overlapping key the upsert's
    first staging never saw, and the retried upsert must still produce
    the serial-order result."""
    import etlalchemy_spark.operators.lake as L

    lake_create(spark, root, _mk(spark, [(1, "a"), (2, "b")]), "k")
    real_write = L._write_manifest
    state = {"injected": False}

    def racing_write(sp, rt, manifest):
        if not state["injected"] and manifest["op"] == "upsert":
            state["injected"] = True
            L.lake_append(sp, rt, _mk(sp, [(3, "c")]))
        return real_write(sp, rt, manifest)

    monkeypatch.setattr(L, "_write_manifest", racing_write)
    v = L.lake_upsert(spark, root, _mk(spark, [(2, "B2"), (4, "d")]))
    assert state["injected"] and v == 3
    assert _rows(lake_read(spark, root)) == [(1, "a"), (2, "B2"), (3, "c"), (4, "d")]
    assert [h["op"] for h in lake_history(spark, root)] == ["create", "append", "upsert"]


def test_retry_is_bounded(spark, root, monkeypatch):
    """A pathological writer that ALWAYS loses must fail loudly after
    the bounded retries, never spin."""
    import etlalchemy_spark.operators.lake as L

    lake_create(spark, root, _mk(spark, [(1, "a")]), "k")
    calls = {"n": 0}
    real_write = L._write_manifest

    def always_stolen(sp, rt, manifest):
        if manifest["op"] == "append":
            calls["n"] += 1
            raise L.CommitConflict("stolen")
        return real_write(sp, rt, manifest)

    monkeypatch.setattr(L, "_write_manifest", always_stolen)
    with pytest.raises(L.CommitConflict):
        L.lake_append(spark, root, _mk(spark, [(2, "b")]))
    assert calls["n"] == L._MAX_COMMIT_RETRIES + 1


def test_column_mapping_rename_is_metadata_only(spark, root):
    """r10 Delta-style column mapping: RENAME touches no data file,
    reads show the new name, writers speak the new name, time travel
    shows each version under its then-current names, and the key's
    physical stats keep driving upsert file skipping."""
    from etlalchemy_spark.operators.lake import lake_rename_column

    lake_create(spark, root, _mk(spark, [(1, "a"), (2, "b")]), "k")
    v = lake_rename_column(spark, root, "v", "label")
    assert v == 2
    m1, m2 = _read_manifest(spark, root, 1), _read_manifest(spark, root, 2)
    assert m1["files"] == m2["files"]  # zero rewrite
    assert m2["column_map"] == {"label": "v"}
    assert lake_read(spark, root).columns == ["k", "label"]
    assert lake_read(spark, root, 1).columns == ["k", "v"]  # time travel
    # writers speak the logical name; files keep the physical one
    df = spark.createDataFrame([(3, "c")], "k long, label string")
    lake_append(spark, root, df)
    assert sorted((r.k, r.label) for r in lake_read(spark, root).collect()) == [
        (1, "a"), (2, "b"), (3, "c"),
    ]
    # upsert through the logical name, file skipping intact
    lake_upsert(spark, root, spark.createDataFrame([(2, "B")], "k long, label string"))
    assert sorted((r.k, r.label) for r in lake_read(spark, root).collect()) == [
        (1, "a"), (2, "B"), (3, "c"),
    ]
    # chained rename points the NEW logical at the ORIGINAL physical
    lake_rename_column(spark, root, "label", "tag")
    m = _read_manifest(spark, root, latest_version(spark, root))
    assert m["column_map"] == {"tag": "v"}
    assert lake_read(spark, root).columns == ["k", "tag"]


def test_column_mapping_drop_and_guards(spark, root):
    from etlalchemy_spark.operators.lake import (
        lake_delete_dv,
        lake_drop_column,
        lake_rename_column,
    )

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k long, v string, x long"
    )
    lake_create(spark, root, df, "k")
    lake_drop_column(spark, root, "x")
    assert lake_read(spark, root).columns == ["k", "v"]
    assert lake_read(spark, root, 1).columns == ["k", "v", "x"]  # time travel
    # predicates and DV deletes speak the logical schema post-rename
    lake_rename_column(spark, root, "v", "label")
    lake_delete_dv(spark, root, "label = 'a'")
    assert [(r.k, r.label) for r in lake_read(spark, root).collect()] == [(2, "b")]
    # COW delete rewrites shed the dropped column physically
    lake_delete(spark, root, "label = 'zzz'")  # no match: metadata only
    # guards: key/dropped-name reuse refuse loudly
    with pytest.raises(ValueError, match="key column"):
        lake_drop_column(spark, root, "k")
    with pytest.raises(ValueError, match="dropped"):
        lake_append(
            spark, root,
            spark.createDataFrame([(9, "z", 1)], "k long, label string, x long"),
        )
    with pytest.raises(ValueError, match="already exists"):
        lake_rename_column(spark, root, "label", "k")


def test_column_mapping_constraint_and_changes(spark, root):
    from etlalchemy_spark.operators.lake import (
        lake_changes,
        lake_drop_column,
        lake_rename_column,
    )

    lake_create(
        spark, root, _mk(spark, [(1, "a")]), "k", constraints=["v IS NOT NULL"]
    )
    # renaming/dropping a constraint-referenced column refuses
    with pytest.raises(ValueError, match="constraint"):
        lake_rename_column(spark, root, "v", "label")
    with pytest.raises(ValueError, match="constraint"):
        lake_drop_column(spark, root, "v")
    # the change feed emits LOGICAL names of the target version
    lake_drop(spark, root)
    lake_create(spark, root, _mk(spark, [(1, "a"), (2, "b")]), "k")
    lake_rename_column(spark, root, "v", "label")
    lake_upsert(spark, root, spark.createDataFrame([(2, "B")], "k long, label string"))
    cdf = lake_changes(spark, root, 1, 3)
    assert set(cdf.columns) == {"op", "k", "label"}
    got = sorted((r.op, r.k, r.label) for r in cdf.collect())
    assert got == [("+", 2, "B"), ("-", 2, "b")]
