"""Delta-log reader boundaries (operators/deltalog.py): checkpoint
resolution, per-path last-action-wins, loud refusals (protocol
features, deletion vectors, gaps, non-hive layouts). Snapshot VALUE
correctness is gated cross-engine by lake_delta_interop_read /
lake_delta_time_travel; these tests pin the log mechanics."""

from __future__ import annotations

import glob
import json
import os
import shutil

import pytest

from etlalchemy_spark.operators.deltalog import delta_snapshot, read_delta


def _write_table(spark, root, partitioned=False):
    """Tiny 3-commit Delta table: v0 add f0 (+meta/protocol), v1 add
    f1, v2 remove f0. Unpartitioned single-column files."""
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    schema_json = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True, "metadata": {}}
            ],
        }
    )

    def data_file(lo, hi, rel):
        tmp = os.path.join(root, "_tmp")
        spark.range(lo, hi).coalesce(1).write.mode("overwrite").parquet(tmp)
        src = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(root, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.move(src, dst)
        shutil.rmtree(tmp)
        return {
            "path": rel,
            "partitionValues": {},
            "size": os.path.getsize(dst),
            "modificationTime": 1,
            "dataChange": True,
        }

    def commit(v, actions):
        with open(os.path.join(log, f"{v:020d}.json"), "w") as fp:
            fp.write("\n".join(json.dumps(a) for a in actions) + "\n")

    a0 = data_file(0, 5, "f0.parquet")
    a1 = data_file(5, 9, "f1.parquet")
    commit(
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {
                "metaData": {
                    "id": "t",
                    "format": {"provider": "parquet"},
                    "schemaString": schema_json,
                    "partitionColumns": [],
                    "configuration": {},
                }
            },
            {"add": a0},
            {"commitInfo": {"operation": "WRITE"}},
        ],
    )
    commit(1, [{"add": a1}])
    commit(2, [{"remove": {"path": "f0.parquet", "deletionTimestamp": 2,
                           "dataChange": True}}])
    return log


def _ids(df):
    return sorted(r.id for r in df.collect())


def test_snapshot_last_action_wins_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "t")
    _write_table(spark, root)
    assert _ids(read_delta(spark, root)) == [5, 6, 7, 8]
    assert _ids(read_delta(spark, root, version=1)) == list(range(9))
    assert _ids(read_delta(spark, root, version=0)) == [0, 1, 2, 3, 4]
    snap = delta_snapshot(spark, root)
    assert snap["version"] == 2 and snap["files"] == ["f1.parquet"]


def test_re_add_resurrects_removed_path(spark, tmp_path):
    root = str(tmp_path / "t")
    log = _write_table(spark, root)
    add_back = {
        "path": "f0.parquet",
        "partitionValues": {},
        "size": 1,
        "modificationTime": 3,
        "dataChange": True,
    }
    with open(os.path.join(log, f"{3:020d}.json"), "w") as fp:
        fp.write(json.dumps({"add": add_back}) + "\n")
    assert _ids(read_delta(spark, root)) == list(range(9))


def test_missing_commit_gap_fails_loudly(spark, tmp_path):
    root = str(tmp_path / "t")
    log = _write_table(spark, root)
    os.remove(os.path.join(log, f"{1:020d}.json"))
    with pytest.raises(ValueError, match="not contiguous"):
        delta_snapshot(spark, root)


def test_reader_protocol_refusals(spark, tmp_path):
    root = str(tmp_path / "t")
    log = _write_table(spark, root)
    with open(os.path.join(log, f"{3:020d}.json"), "w") as fp:
        fp.write(
            json.dumps(
                {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                              "readerFeatures": ["deletionVectors"]}}
            )
            + "\n"
        )
    with pytest.raises(NotImplementedError, match="minReaderVersion"):
        delta_snapshot(spark, root)
    # deletion vector on an action (protocol rolled back to readable)
    with open(os.path.join(log, f"{3:020d}.json"), "w") as fp:
        fp.write(
            json.dumps(
                {
                    "add": {
                        "path": "f1.parquet",
                        "partitionValues": {},
                        "size": 1,
                        "modificationTime": 1,
                        "dataChange": False,
                        "deletionVector": {"storageType": "u", "pathOrInlineDv": "x"},
                    }
                }
            )
            + "\n"
        )
    with pytest.raises(NotImplementedError, match="deletion vectors"):
        delta_snapshot(spark, root)


def test_not_a_delta_table(spark, tmp_path):
    with pytest.raises(ValueError, match="not a Delta table"):
        delta_snapshot(spark, str(tmp_path / "nope"))


def test_checkpoint_is_actually_used(spark, tmp_path):
    """Delete every pre-checkpoint JSON from the sf fixture's table:
    the latest snapshot must still resolve (checkpoint + later JSON),
    while version 0 — which needs the deleted JSONs — must fail
    loudly. Proves the reader starts from the checkpoint rather than
    replaying the full JSON history."""
    from conftest import SF_DIR
    from etlalchemy_spark.queries.lake import _delta_root

    src = _delta_root(spark, SF_DIR)
    root = str(tmp_path / "table")
    shutil.copytree(src, root)
    log = os.path.join(root, "_delta_log")
    os.remove(os.path.join(log, f"{0:020d}.json"))
    os.remove(os.path.join(log, f"{1:020d}.json"))
    snap = delta_snapshot(spark, root)
    assert snap["version"] == 2 and len(snap["files"]) == 6
    assert read_delta(spark, root).count() > 0
    with pytest.raises(ValueError, match="does not exist|not contiguous"):
        delta_snapshot(spark, root, version=0)


def test_partition_column_reconstruction(spark, tmp_path):
    from conftest import SF_DIR
    from etlalchemy_spark.queries.lake import _delta_root

    df = read_delta(spark, _delta_root(spark, SF_DIR))
    assert set(df.columns) == {"l_orderkey", "l_partkey", "l_quantity", "l_returnflag"}
    flags = {r.l_returnflag for r in df.select("l_returnflag").distinct().collect()}
    assert flags == {"A", "N", "R"}


def test_multipart_checkpoint_resolution(spark, tmp_path):
    """Real writers split big checkpoints into
    <v>.checkpoint.<i>.<n>.parquet parts: a COMPLETE 1..n set must be
    used for snapshot resolution (pre-checkpoint JSONs deletable),
    while an incomplete (torn) set must be ignored and replay fall
    back to the JSON commits."""
    from conftest import SF_DIR
    from etlalchemy_spark.queries.lake import _delta_root

    src = _delta_root(spark, SF_DIR)
    root = str(tmp_path / "table")
    shutil.copytree(src, root)
    log = os.path.join(root, "_delta_log")
    single = os.path.join(log, f"{1:020d}.checkpoint.parquet")
    # split the single-file checkpoint into 2 parts by rewriting rows
    rows = spark.read.parquet(single).collect()
    schema = spark.read.parquet(single).schema
    half = len(rows) // 2
    for i, chunk in ((1, rows[:half]), (2, rows[half:])):
        tmp = str(tmp_path / f"_part{i}")
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        shutil.move(
            part, os.path.join(log, f"{1:020d}.checkpoint.{i}.2.parquet")
        )
    os.remove(single)
    os.remove(os.path.join(log, f"{0:020d}.json"))
    os.remove(os.path.join(log, f"{1:020d}.json"))
    snap = delta_snapshot(spark, root)
    assert snap["version"] == 2 and len(snap["files"]) == 6
    # torn set: drop part 2 -> the checkpoint no longer counts, and
    # with the JSONs gone the log is loudly unusable
    os.remove(os.path.join(log, f"{1:020d}.checkpoint.2.2.parquet"))
    with pytest.raises(ValueError, match="not contiguous|does not exist"):
        delta_snapshot(spark, root)
