"""Minimal Apache Iceberg table READER, from the public spec
(https://iceberg.apache.org/spec/) — the second external-lakehouse
interop leg beside the Delta reader (operators/deltalog.py; r12
verdict "what's missing #5"). Pure metadata walk + one parquet scan:

- ``metadata/version-hint.text`` (or the highest ``v<N>.metadata.json``
  / ``<N>-<uuid>.metadata.json``) names the current table metadata.
- Table metadata JSON: format-version 1 or 2, the current schema
  (v2 ``schemas`` + ``current-schema-id``, v1 ``schema``), the
  snapshot list and ``current-snapshot-id``.
- Each snapshot's ``manifest-list`` is an Avro OCF (read with the
  generic full-schema codec, operators/avrowire.read_ocf_any) whose
  rows name manifest files; each manifest's entries carry a status
  (0 EXISTING / 1 ADDED / 2 DELETED) and a ``data_file`` struct. The
  snapshot's live file set = entries with status != 2 across its
  manifests.
- Iceberg data files store EVERY column (partition values live in the
  files, unlike Hive/Delta layouts), so the scan is simply the
  explicit live-file list under the declared schema — predicate
  pushdown and column pruning intact.

Honest boundaries (raise, never silently misread): delete manifests /
delete files (v2 content != 0 — merge-on-read is out of scope, same
honesty as the Delta reader's deletion vectors), non-parquet data
files, and non-scalar schema types beyond struct nesting. Metadata
paths are resolved tolerantly: absolute URIs from the writing
cluster's filesystem are re-rooted under the local table directory
when the original location does not exist (tables get copied/cloned;
basename resolution under metadata//data is the portable fallback
every engine implements).

Upstream reference (seanharr11/etlalchemy) has no lake surface; this
extends SURVEY Table B's "Versioned lake table" family.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from etlalchemy_spark.operators.avrowire import read_ocf_any
from etlalchemy_spark.operators.deltalog import _fs, _read_utf8


def _list_names(spark, d: str) -> list[str]:
    fs, p = _fs(spark, d)
    if not fs.exists(p):
        return []
    return [st.getPath().getName() for st in fs.listStatus(p)]


def _read_bytes(spark, path: str) -> bytes:
    fs, p = _fs(spark, path)
    stream = fs.open(p)
    try:
        jbytes = spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        return bytes(jbytes)
    finally:
        stream.close()


def current_metadata_path(spark, table_path: str) -> str:
    """The live table-metadata JSON: version-hint.text when present,
    else the highest-numbered v<N>.metadata.json / <N>-<uuid>
    metadata file — the file-system-catalog resolution rule."""
    md = f"{table_path.rstrip('/')}/metadata"
    names = _list_names(spark, md)
    if not names:
        raise ValueError(f"not an Iceberg table: no metadata dir at {md}")
    if "version-hint.text" in names:
        v = _read_utf8(spark, f"{md}/version-hint.text").strip()
        cand = [f"v{v}.metadata.json", f"{v}.metadata.json"]
        for c in cand:
            if c in names:
                return f"{md}/{c}"
        raise ValueError(
            f"iceberg: version-hint names {v!r} but no matching metadata "
            f"file exists in {md}"
        )
    best, best_n = None, -1
    for nm in names:
        m = re.match(r"^v?(\d+)(?:-[0-9a-f-]+)?\.metadata\.json$", nm)
        if m and int(m.group(1)) > best_n:
            best, best_n = nm, int(m.group(1))
    if best is None:
        raise ValueError(f"not an Iceberg table: no *.metadata.json in {md}")
    return f"{md}/{best}"


def _resolve_path(spark, table_path: str, p: str, subdir: str) -> str:
    """Metadata records absolute URIs from the WRITING cluster; a
    copied/relocated table keeps the same basenames under its own
    metadata// data dirs. Use the recorded path if it exists, else
    re-root its basename — the portable fallback."""
    fs, jp = _fs(spark, p)
    try:
        if fs.exists(jp):
            return p
    except Exception:
        pass
    base = p.rstrip("/").rsplit("/", 1)[-1]
    return f"{table_path.rstrip('/')}/{subdir}/{base}"


_SCALARS = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "binary": T.BinaryType(),
    "date": T.DateType(),
    "timestamp": T.TimestampNTZType(),
    "timestamptz": T.TimestampType(),
}


def _iceberg_type(t) -> T.DataType:
    if isinstance(t, str):
        if t in _SCALARS:
            return _SCALARS[t]
        m = re.match(r"^decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)$", t)
        if m:
            return T.DecimalType(int(m.group(1)), int(m.group(2)))
        raise NotImplementedError(f"iceberg: type {t!r} (uuid/time etc. out of scope)")
    if isinstance(t, dict) and t.get("type") == "struct":
        return T.StructType(
            [
                T.StructField(
                    f["name"], _iceberg_type(f["type"]), not f.get("required", False)
                )
                for f in t["fields"]
            ]
        )
    raise NotImplementedError(f"iceberg: type {t!r} (list/map columns out of scope)")


def _schema_of(meta: dict) -> T.StructType:
    if "schemas" in meta:
        sid = meta.get("current-schema-id", 0)
        for s in meta["schemas"]:
            if s.get("schema-id", 0) == sid:
                return _iceberg_type(s)
        raise ValueError(f"iceberg: current-schema-id {sid} not in schemas")
    if "schema" in meta:
        return _iceberg_type(meta["schema"])
    raise ValueError("iceberg: metadata has no schema")


def iceberg_snapshot(
    spark, table_path: str, snapshot_id: int | None = None
) -> dict:
    """Resolve the live data-file set as of ``snapshot_id`` (default:
    the current snapshot): returns {"snapshot_id", "schema"
    (StructType), "files" (sorted absolute paths)}. Metadata-only —
    two small JSON/Avro layers, no data row is touched."""
    meta = json.loads(_read_utf8(spark, current_metadata_path(spark, table_path)))
    fv = meta.get("format-version", 1)
    if fv not in (1, 2):
        raise NotImplementedError(f"iceberg: format-version {fv} (1 or 2)")
    schema = _schema_of(meta)
    snaps = meta.get("snapshots") or []
    target = snapshot_id if snapshot_id is not None else meta.get("current-snapshot-id")
    if target is None or (snapshot_id is None and target == -1):
        return {"snapshot_id": None, "schema": schema, "files": []}
    snap = next((s for s in snaps if s.get("snapshot-id") == target), None)
    if snap is None:
        raise ValueError(
            f"iceberg: snapshot {target} not in table (have "
            f"{[s.get('snapshot-id') for s in snaps]})"
        )
    ml_path = _resolve_path(spark, table_path, snap["manifest-list"], "metadata")
    _, manifests = read_ocf_any(_read_bytes(spark, ml_path))
    files: list[str] = []
    for m in manifests:
        if m.get("content", 0) != 0:
            raise NotImplementedError(
                f"iceberg: delete manifest {m.get('manifest_path')!r} "
                "(merge-on-read deletes are out of scope — rewrite/compact "
                "the source table first)"
            )
        mf_path = _resolve_path(spark, table_path, m["manifest_path"], "metadata")
        _, entries = read_ocf_any(_read_bytes(spark, mf_path))
        for e in entries:
            if e.get("status", 0) == 2:  # DELETED in this snapshot
                continue
            df = e["data_file"]
            if df.get("content", 0) != 0:
                raise NotImplementedError(
                    f"iceberg: delete file {df.get('file_path')!r} "
                    "(position/equality deletes are out of scope)"
                )
            fmt = str(df.get("file_format", "PARQUET")).upper()
            if fmt != "PARQUET":
                raise NotImplementedError(f"iceberg: file format {fmt} (PARQUET only)")
            files.append(
                _resolve_path(spark, table_path, df["file_path"], "data")
            )
    return {"snapshot_id": target, "schema": schema, "files": sorted(files)}


def read_iceberg(
    spark, table_path: str, snapshot_id: int | None = None
) -> DataFrame:
    """The table as a DataFrame at ``snapshot_id`` (default: current).
    Iceberg data files store every column, so the plan is one pruned/
    pushed parquet FileScan over the explicit live-file list under the
    metadata-declared schema."""
    snap = iceberg_snapshot(spark, table_path, snapshot_id)
    if not snap["files"]:
        return spark.createDataFrame([], snap["schema"])
    return spark.read.schema(snap["schema"]).parquet(*snap["files"])
