"""Iceberg reader boundaries (operators/iceberg.py): metadata
resolution, snapshot status semantics, path re-rooting after a table
relocation, loud refusals (delete manifests/files, non-parquet,
unknown snapshot). Snapshot VALUE correctness is gated cross-engine by
lake_iceberg_interop_read / lake_iceberg_time_travel."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from etlalchemy_spark.operators.iceberg import iceberg_snapshot, read_iceberg

from conftest import SF_DIR


def _fixture_table(spark):
    from etlalchemy_spark.queries.lake import _iceberg_root

    return _iceberg_root(spark, SF_DIR)


def test_snapshot_file_sets(spark):
    tbl = _fixture_table(spark)
    cur = iceberg_snapshot(spark, tbl)
    old = iceberg_snapshot(spark, tbl, snapshot_id=101)
    assert cur["snapshot_id"] == 202
    assert [os.path.basename(f) for f in cur["files"]] == ["A1.parquet", "B.parquet"]
    assert [os.path.basename(f) for f in old["files"]] == ["A1.parquet", "A2.parquet"]
    assert [f.name for f in cur["schema"].fields] == [
        "l_orderkey", "l_partkey", "l_quantity", "l_returnflag",
    ]


def test_unknown_snapshot_and_missing_table(spark, tmp_path):
    tbl = _fixture_table(spark)
    with pytest.raises(ValueError, match="snapshot 999"):
        iceberg_snapshot(spark, tbl, snapshot_id=999)
    with pytest.raises(ValueError, match="not an Iceberg table"):
        iceberg_snapshot(spark, str(tmp_path / "nope"))


def test_relocated_table_re_roots_paths(spark, tmp_path):
    """Metadata records the writer's absolute paths; after the table
    directory is MOVED those paths are dead and every layer (manifest
    list, manifests, data files) must re-root by basename under the
    new location."""
    src = _fixture_table(spark)
    moved = str(tmp_path / "relocated")
    shutil.copytree(src, moved)
    # poison nothing: the original still exists, so force re-rooting
    # by rewriting every recorded path to a dead location
    md = os.path.join(moved, "metadata")
    with open(os.path.join(md, "v2.metadata.json")) as fh:
        meta = json.load(fh)
    for s in meta["snapshots"]:
        s["manifest-list"] = "/dead/" + os.path.basename(s["manifest-list"])
    with open(os.path.join(md, "v2.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    # manifests still point at the ORIGINAL absolute data files — also
    # fine (they exist); the manifest-list layer exercises re-rooting
    got = iceberg_snapshot(spark, moved)
    assert [os.path.basename(f) for f in got["files"]] == ["A1.parquet", "B.parquet"]
    assert read_iceberg(spark, moved).count() > 0


def test_delete_manifest_and_delete_file_refusals(spark, tmp_path):
    from etlalchemy_spark.operators.avrowire import read_ocf_any, write_ocf_any
    from etlalchemy_spark.queries.lake import (
        _ICE_MANIFEST_SCHEMA,
        _ICE_MLIST_SCHEMA,
    )

    src = _fixture_table(spark)
    tbl = str(tmp_path / "t")
    shutil.copytree(src, tbl)
    md = os.path.join(tbl, "metadata")
    # the copied metadata still records the ORIGINAL (live) absolute
    # manifest-list paths — point them at a dead location so the
    # re-root fallback resolves into THIS copy, whose avro files the
    # test mutates below
    with open(os.path.join(md, "v2.metadata.json")) as fh:
        meta = json.load(fh)
    for s in meta["snapshots"]:
        s["manifest-list"] = "/dead/" + os.path.basename(s["manifest-list"])
    with open(os.path.join(md, "v2.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    ml_path = os.path.join(md, "snap-202-manifest-list.avro")
    with open(ml_path, "rb") as fh:
        _, rows = read_ocf_any(fh.read())
    # (a) delete MANIFEST (content=1) refuses
    bad = [dict(rows[0], content=1)]
    with open(ml_path, "wb") as fh:
        fh.write(write_ocf_any(bad, _ICE_MLIST_SCHEMA))
    with pytest.raises(NotImplementedError, match="delete manifest"):
        iceberg_snapshot(spark, tbl)
    # (b) delete FILE (data_file.content=1) refuses — manifest paths
    # also deadened so the copy's mutated manifest-2.avro is the one
    # resolved
    dead_rows = [
        dict(r, manifest_path="/dead/" + os.path.basename(r["manifest_path"]))
        for r in rows
    ]
    with open(ml_path, "wb") as fh:
        fh.write(write_ocf_any(dead_rows, _ICE_MLIST_SCHEMA))
    m2 = os.path.join(md, "manifest-2.avro")
    with open(m2, "rb") as fh:
        _, entries = read_ocf_any(fh.read())
    entries[0]["data_file"]["content"] = 1
    with open(m2, "wb") as fh:
        fh.write(write_ocf_any(entries, _ICE_MANIFEST_SCHEMA))
    with pytest.raises(NotImplementedError, match="delete file"):
        iceberg_snapshot(spark, tbl)
    # (c) non-parquet refuses
    entries[0]["data_file"]["content"] = 0
    entries[0]["data_file"]["file_format"] = "ORC"
    with open(m2, "wb") as fh:
        fh.write(write_ocf_any(entries, _ICE_MANIFEST_SCHEMA))
    with pytest.raises(NotImplementedError, match="file format ORC"):
        iceberg_snapshot(spark, tbl)


def test_generic_avro_handles_full_type_system():
    """The manifest layer's prerequisite, pinned directly: nested
    records, enums, fixed, blocked arrays/maps (including the
    negative-count skippable form), and non-trivial unions round-trip
    through the generic codec."""
    from etlalchemy_spark.operators.avrowire import (
        decode_value,
        encode_long,
        read_ocf_any,
        write_ocf_any,
    )

    schema = json.dumps(
        {
            "type": "record",
            "name": "outer",
            "fields": [
                {"name": "s", "type": "string"},
                {
                    "name": "inner",
                    "type": {
                        "type": "record",
                        "name": "pt",
                        "fields": [
                            {"name": "e", "type": {"type": "enum", "name": "E",
                                                   "symbols": ["A", "B"]}},
                            {"name": "fx", "type": {"type": "fixed", "name": "FX",
                                                    "size": 3}},
                        ],
                    },
                },
                {"name": "arr", "type": {"type": "array",
                                         "items": ["null", "long"]}},
                {"name": "mp", "type": {"type": "map", "values": "double"}},
                {"name": "u", "type": ["null", "string", "long"]},
            ],
        }
    )
    rows = [
        {"s": "x", "inner": {"e": "B", "fx": b"abc"},
         "arr": [1, None, 3], "mp": {"k": 1.5}, "u": "hi"},
        {"s": "", "inner": {"e": "A", "fx": b"zzz"},
         "arr": [], "mp": {}, "u": None},
    ]
    buf = write_ocf_any(rows, schema, codec="deflate")
    _, back = read_ocf_any(buf)
    assert back == rows
    # negative-count blocked array form (writers may emit it): decode
    # [-2, <bytesize>, item, item, 0] by hand
    arr_schema = {"type": "array", "items": "long"}
    body = (
        encode_long(-2) + encode_long(2) + encode_long(7) + encode_long(9)
        + encode_long(0)
    )
    val, pos = decode_value(arr_schema, body, 0, {})
    assert val == [7, 9] and pos == len(body)
