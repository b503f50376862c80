"""Versioned lake table: snapshots, time travel, copy-on-write MERGE
with manifest-level file skipping, rollback, vacuum.

The storage contract the big lake formats (Delta/Iceberg/Hudi) settled
on, built from first principles on plain parquet + JSON manifests:

- Data files are IMMUTABLE. Every commit ATTEMPT writes its new rows
  to a fresh ``data/c<version>-<nonce>/`` directory and never touches
  existing bytes; the per-attempt nonce means a crashed or race-losing
  writer leaves only invisible files (vacuum sweeps them) and can
  never block the next writer at the same version.
- A commit is ONE manifest file ``_manifests/v<version>.json``
  holding the FULL file list of that snapshot plus per-file stats
  (row count, min/max of the table key). Writing the manifest is the
  atomic commit point: readers either see the whole version or none
  of it, and a crash mid-commit leaves dangling data files but no
  visible version (tested). The manifest is created exclusively
  (``FileSystem.create(overwrite=False)``), so two racing writers on
  the same parent cannot both commit one version — single-table
  optimistic concurrency, the Delta protocol's core trick.
- Time travel is O(1) metadata: reading version N opens one manifest
  and hands Spark its file list. No log replay, no directory listing
  of ``data/``.
- UPSERT is copy-on-write with FILE SKIPPING from manifest stats:
  only files whose [min_key, max_key] overlaps the change set's key
  hull are read and rewritten; every other file is carried into the
  new manifest BY REFERENCE (compared paths test-pinned). A matched
  key can only live in an overlapping file, so the skip is exact.
  At 100 TB with a sorted/clustered key this is the difference
  between rewriting a partition and rewriting the table.
- DELETE prunes by actually counting matches per file in one scan
  (``_metadata.file_path`` group-by — arbitrary predicates can't be
  answered from key stats alone); files with zero matches are
  carried by reference.
- DELETION VECTORS (merge-on-read DELETE): ``lake_delete_dv`` writes
  the matched (file, row-position) pairs to an immutable sidecar under
  ``dv/`` and leaves every data file untouched; each manifest pins the
  ``dvs`` list alongside its file list, reads subtract the vectors
  with one anti-join, and every other commit carries the vectors
  forward (or applies them before rewriting a file — resurrection is
  the invariant being defended, test-pinned). ``lake_compact_dvs``
  folds vectors back into data and empties the list. Delta DV /
  Iceberg positional-delete semantics from first principles.
- MANIFEST COLUMN STATS (Iceberg-style scan planning): ``stat_cols``
  declared at create ride every commit as per-file [min, max] hulls;
  ``lake_read_range`` plans a range read from ONE manifest fetch with
  zero parquet footers opened, keeps stat-less files conservatively,
  and applies the residual filter plus deletion vectors.
- CHECK CONSTRAINTS (write-side governance): predicates declared at
  create ride every manifest; appends and streaming ingest validate
  each batch BEFORE any row lands — strict mode refuses the commit
  loudly, quarantine mode diverts violators to ``_quarantine/`` and
  admits the rest; NULL predicate results count as violations.
- ROLLBACK is a new commit pointing at an old version's file list —
  history is append-only, the bad version stays auditable.
- VACUUM deletes data files unreachable from the retained manifests
  (and the manifests themselves below the horizon) — the explicit,
  separate step where time travel is traded for space, exactly as in
  Delta.

All driver-side metadata work is bounded by the FILE COUNT, never row
count, and all IO goes through the Hadoop FileSystem API (HDFS/S3A/
local alike), same discipline as operators/merge.py.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST_DIR = "_manifests"


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), jvm


def _manifest_path(jvm, root: str, version: int):
    return jvm.org.apache.hadoop.fs.Path(root, f"{_MANIFEST_DIR}/v{version:08d}.json")


def _read_manifest(spark: SparkSession, root: str, version: int) -> dict:
    fs, jvm = _fs(spark, root)
    p = _manifest_path(jvm, root, version)
    if not fs.exists(p):
        raise ValueError(f"lake table at {root} has no version {version}")
    stream = fs.open(p)
    try:
        text = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
    return json.loads(text)


class CommitConflict(Exception):
    """A racing writer committed this version first. Ops retry onto the
    new latest via _retry_on_conflict; losers' data files stay
    invisible until vacuum."""


def _write_manifest(spark: SparkSession, root: str, manifest: dict) -> None:
    """The atomic commit point. ``create(overwrite=False)`` throws if
    the version already exists — a racing writer loses cleanly (as
    CommitConflict, so the op-level retry loop can rebase) and its
    data files stay invisible (vacuum sweeps them)."""
    fs, jvm = _fs(spark, root)
    p = _manifest_path(jvm, root, manifest["version"])
    try:
        out = fs.create(p, False)
    except Exception as e:  # noqa: BLE001 — py4j error classes vary by FS
        msg = str(e)
        if "exist" in msg.lower() or "FileAlreadyExists" in msg:
            raise CommitConflict(
                f"version {manifest['version']} was committed by a racing writer"
            ) from None
        raise
    try:
        out.write(bytearray(json.dumps(manifest, sort_keys=True) + "\n", "utf-8"))
    finally:
        out.close()


_MAX_COMMIT_RETRIES = 4


def _retry_on_conflict(fn):
    """Optimistic-concurrency wrapper (VERDICT r9 #5): on a manifest
    collision the WHOLE op re-executes against the new latest —
    re-reads the parent, re-validates constraints/hulls, re-stages —
    so both racing writers succeed without caller intervention and
    semantics compose as if the ops ran serially (which, commit-order-
    wise, they did). Metadata-only ops rebase for free; copy-on-write
    ops pay a re-stage, whose orphaned first-attempt files vacuum
    sweeps. lake_append keeps its own loop (data files are parent-
    independent, so ITS retry is metadata-only). Bounded: the final
    attempt propagates CommitConflict."""
    import functools

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        for _ in range(_MAX_COMMIT_RETRIES):
            try:
                return fn(*args, **kwargs)
            except CommitConflict:
                continue
        return fn(*args, **kwargs)

    return wrapper


def _with_txns(parent_manifest: dict, manifest: dict) -> dict:
    """Carry cross-commit table state forward through EVERY commit:
    the cumulative per-app transaction watermarks (Delta's txnAppId/
    txnVersion idea — a maintenance commit between streaming
    micro-batches can never make a replayed batch look uncommitted)
    AND the deletion vectors (a commit that doesn't explicitly rewrite
    or drop them must keep them, or the first append after a DV delete
    would silently resurrect the deleted rows). A manifest that sets
    ``dvs`` itself (DV deletes, DV compaction, rollback) wins."""
    txns = parent_manifest.get("txns")
    if txns and "txns" not in manifest:
        # same guard as dvs/stat_cols/constraints: a manifest that sets
        # its own txns (DV-keyed streaming deletes merging a new batch
        # watermark) must win, or the watermark would never advance past
        # the first delete batch and replays would re-execute (ADVICE r9)
        manifest = {**manifest, "txns": txns}
    dvs = parent_manifest.get("dvs")
    if dvs and "dvs" not in manifest:
        manifest = {**manifest, "dvs": dvs}
    sc = parent_manifest.get("stat_cols")
    if sc and "stat_cols" not in manifest:
        manifest = {**manifest, "stat_cols": sc}
    cons = parent_manifest.get("constraints")
    if cons and "constraints" not in manifest:
        manifest = {**manifest, "constraints": cons}
    cmap = parent_manifest.get("column_map")
    if cmap and "column_map" not in manifest:
        manifest = {**manifest, "column_map": cmap}
    dropped = parent_manifest.get("dropped_cols")
    if dropped and "dropped_cols" not in manifest:
        manifest = {**manifest, "dropped_cols": dropped}
    return manifest


def latest_version(spark: SparkSession, root: str) -> int:
    """Highest committed version — one directory listing of the
    manifest dir (file count == version count, never data-sized)."""
    fs, jvm = _fs(spark, root)
    d = jvm.org.apache.hadoop.fs.Path(root, _MANIFEST_DIR)
    if not fs.exists(d):
        raise ValueError(f"{root} is not a lake table (no {_MANIFEST_DIR}/)")
    versions = [
        int(st.getPath().getName()[1:-5])
        for st in fs.listStatus(d)
        if st.getPath().getName().startswith("v")
        and st.getPath().getName().endswith(".json")
    ]
    if not versions:
        raise ValueError(f"{root} has no committed versions")
    return max(versions)


def _json_stat(v):
    """Manifest-JSON-safe stat value: dates/timestamps serialize to
    ISO strings (which compare lexicographically in range order), the
    rest pass through."""
    import datetime

    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat()
    return v


def _file_stats(
    spark: SparkSession, data_dir: str, key: str, stat_cols: list[str] | None = None
) -> list[dict]:
    """Per-file (rows, min/max key, schema fingerprint, optional extra
    column min/max) for a freshly written commit dir — ONE distributed
    aggregate over ``_metadata.file_path``, collected at file-count
    size. The key stats power upsert's file skipping; ``stat_cols``
    (declared at lake_create, carried in the manifest) power
    lake_read_range's metadata-only pruning on NON-key columns — the
    Iceberg idea: scan planning reads zero parquet footers. The schema
    ``sig`` lets readers skip the mergeSchema footer pass when every
    file in a snapshot shares one schema (the common case — Delta
    stores the schema in the log for exactly this)."""
    scan = spark.read.parquet(data_dir)
    import hashlib

    sig = hashlib.md5(scan.schema.simpleString().encode()).hexdigest()[:12]
    aggs = [
        F.count(F.lit(1)).alias("rows"),
        F.min(key).alias("min_key"),
        F.max(key).alias("max_key"),
    ]
    for c in stat_cols or []:
        if c in scan.columns:
            aggs.append(F.min(c).alias(f"_lo_{c}"))
            aggs.append(F.max(c).alias(f"_hi_{c}"))
    rows = scan.groupBy(F.col("_metadata.file_path").alias("path")).agg(*aggs).collect()

    def entry(r):
        e = {
            "path": r["path"],
            "rows": r["rows"],
            "min_key": r["min_key"],
            "max_key": r["max_key"],
            "sig": sig,
        }
        stats = {
            c: [_json_stat(r[f"_lo_{c}"]), _json_stat(r[f"_hi_{c}"])]
            for c in stat_cols or []
            if f"_lo_{c}" in r.__fields__
        }
        if stats:
            e["stats"] = stats
        return e

    return sorted((entry(r) for r in rows), key=lambda f: f["path"])


def _read_files(spark: SparkSession, files: list[dict]):
    """Plan a scan over manifest file entries: when every entry carries
    the SAME schema fingerprint, a plain read suffices (one footer);
    mixed or unknown (pre-r9 manifests) fingerprints take the
    mergeSchema path so evolved columns null-fill instead of silently
    dropping (ADVICE r8 high)."""
    sigs = {f.get("sig") for f in files}
    reader = spark.read
    if len(sigs) != 1 or None in sigs:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(*[f["path"] for f in files])


def _dv_frame(spark: SparkSession, m: dict):
    """Union of a snapshot's deletion-vector sidecars as a
    (_dv_fp, _dv_ri) DataFrame, deduplicated (two DV commits are
    allowed to mark the same physical position — only once counts), or
    None when the snapshot carries no vectors. DV volume is O(deleted
    rows since the last DV compaction), never table-sized."""
    dvs = m.get("dvs") or []
    if not dvs:
        return None
    return (
        spark.read.parquet(*[d["path"] for d in dvs])
        .select(F.col("file_path").alias("_dv_fp"), F.col("row_index").alias("_dv_ri"))
        .dropDuplicates(["_dv_fp", "_dv_ri"])
    )


def _apply_dvs(scan: DataFrame, dv, out_cols: list[str]) -> DataFrame:
    """Merge-on-read: anti-join a fresh file-source scan (``_metadata``
    still reachable) against the deletion vectors on (file, in-file row
    position — parquet's stable ``_metadata.row_index``). One shuffle,
    O(scan + |dv|); AQE broadcasts the DV side while deletions are
    small, which is the regime deletion vectors exist for."""
    if dv is None:
        return scan.select(*out_cols)
    keyed = scan.withColumn("_fp", F.col("_metadata.file_path")).withColumn(
        "_ri", F.col("_metadata.row_index")
    )
    return keyed.join(
        dv,
        (keyed["_fp"] == dv["_dv_fp"]) & (keyed["_ri"] == dv["_dv_ri"]),
        "left_anti",
    ).select(*out_cols)


def _commit_data(
    spark: SparkSession,
    root: str,
    version: int,
    df: DataFrame,
    key: str,
    stat_cols: list[str] | None = None,
) -> list[dict]:
    """Write a commit attempt's data under a UNIQUE per-attempt
    directory (``data/c<version>-<nonce>/``). The manifest records full
    file paths, so the directory name is never derived by readers; the
    nonce means a writer that crashed after writing data (or lost the
    manifest race) leaves only invisible files that vacuum sweeps — it
    can never wedge the next writer's ``errorifexists`` write at the
    same version."""
    data_dir = f"{root}/data/c{version:08d}-{uuid.uuid4().hex[:8]}"
    df.write.mode("errorifexists").parquet(data_dir)
    return _file_stats(spark, data_dir, key, stat_cols)


def lake_drop(spark: SparkSession, root: str) -> None:
    """Remove the whole table (data + manifests) — for scratch rebuilds
    and tests; production tables vacuum instead."""
    fs, jvm = _fs(spark, root)
    fs.delete(jvm.org.apache.hadoop.fs.Path(root), True)


def lake_create(
    spark: SparkSession,
    root: str,
    df: DataFrame,
    key: str,
    stat_cols: list[str] | None = None,
    constraints: list[str] | None = None,
) -> int:
    """Create version 1 from ``df``. ``key`` is the table's logical
    primary key; its per-file min/max drives upsert file skipping.
    ``stat_cols`` declares extra columns whose per-file min/max ride
    every future commit's manifest — the metadata layer lake_read_range
    prunes on (write date-clustered, e.g. repartitionByRange on the
    stat column, or the hulls all overlap and nothing prunes)."""
    manifest = {"version": 1, "parent": 0, "op": "create", "key": key}
    if stat_cols:
        manifest["stat_cols"] = list(stat_cols)
    if constraints:
        manifest["constraints"] = list(constraints)
        df = _enforce_constraints(spark, root, df, list(constraints), "strict")[0]
    manifest["files"] = _commit_data(spark, root, 1, df, key, stat_cols)
    _write_manifest(spark, root, manifest)
    return 1


def _apply_column_map(df: DataFrame, m: dict) -> DataFrame:
    """Project PHYSICAL parquet columns to the snapshot's LOGICAL view
    (Delta column mapping, r10): ``column_map`` is {logical: physical}
    for renamed columns, ``dropped_cols`` lists physical columns no
    snapshot reader may see. Both are manifest metadata — renames and
    drops never rewrite a byte, and because parquet is columnar a
    dropped column is never even scanned (the projection prunes it at
    the footer). Each manifest carries its OWN map, so time travel
    shows every version under the names it had then."""
    cmap = m.get("column_map") or {}
    dropped = set(m.get("dropped_cols") or [])
    if not cmap and not dropped:
        return df
    phys_to_logical = {p: l for l, p in cmap.items()}
    cols = [
        F.col(c).alias(phys_to_logical.get(c, c))
        for c in df.columns
        if c not in dropped
    ]
    return df.select(*cols)


def _to_physical(df: DataFrame, m: dict) -> DataFrame:
    """Rename an incoming LOGICAL batch to PHYSICAL column names before
    it lands — writers speak the logical schema, files keep physical
    names, so old and new files always union cleanly."""
    cmap = m.get("column_map") or {}
    if not cmap:
        return df
    cols = [F.col(c).alias(cmap.get(c, c)) for c in df.columns]
    return df.select(*cols)


def _guard_dropped(df: DataFrame, m: dict) -> DataFrame:
    """Refuse a batch that re-uses a DROPPED physical column name: the
    projection would silently hide the new data (full Delta column-ID
    indirection is what lifts this; an honest refusal beats silently
    invisible columns)."""
    dropped = set(m.get("dropped_cols") or [])
    clash = dropped & set(df.columns)
    if clash:
        raise ValueError(
            f"column(s) {sorted(clash)} were dropped from this table; "
            "re-adding a dropped name needs a fresh column name"
        )
    return df


@_retry_on_conflict
def lake_rename_column(spark: SparkSession, root: str, old: str, new: str) -> int:
    """Metadata-only column RENAME (Delta column mapping, r10): the
    manifest's ``column_map`` {logical: physical} gains/updates one
    entry and NO data file is touched — at 100 TB a rename costs one
    manifest write, and every existing snapshot keeps its own map so
    time travel shows each version under its then-current names.
    Renaming a column referenced by a CHECK constraint refuses loudly
    (the stored predicate text would silently stop matching)."""
    parent = latest_version(spark, root)
    m = _read_manifest(spark, root, parent)
    cmap = dict(m.get("column_map") or {})
    phys = cmap.get(old, old)
    if old not in cmap and old in (m.get("dropped_cols") or []):
        raise ValueError(f"column {old!r} was dropped")
    # logical-name collision check costs one schema read (footer-bounded)
    logical = set(lake_read(spark, root, parent).columns)
    if old not in logical:
        raise ValueError(f"column {old!r} does not exist")
    if new in logical:
        raise ValueError(f"column {new!r} already exists")
    for c in m.get("constraints") or []:
        import re as _re

        if _re.search(rf"\b{_re.escape(old)}\b", c):
            raise ValueError(
                f"column {old!r} is referenced by constraint {c!r}; "
                "drop or rewrite the constraint first"
            )
    cmap.pop(old, None)
    if new != phys:
        cmap[new] = phys
    v = parent + 1
    manifest = {"version": v, "parent": parent, "op": f"rename:{old}->{new}",
                "key": m["key"], "files": m["files"], "column_map": cmap}
    _write_manifest(spark, root, _with_txns(m, manifest))
    return v


@_retry_on_conflict
def lake_drop_column(spark: SparkSession, root: str, col: str) -> int:
    """Metadata-only column DROP: the physical column joins
    ``dropped_cols`` and vanishes from every subsequent snapshot read
    — parquet being columnar, its bytes are never even scanned again,
    and the next COW rewrite of a file sheds them physically. The
    table key, stat columns, and constraint-referenced columns refuse
    to drop (each would break an invariant the manifest still
    enforces). Time travel before the drop still sees the column."""
    parent = latest_version(spark, root)
    m = _read_manifest(spark, root, parent)
    cmap = dict(m.get("column_map") or {})
    phys = cmap.get(col, col)
    if phys == m["key"]:
        raise ValueError("cannot drop the table key column")
    if phys in (m.get("stat_cols") or []):
        raise ValueError(f"column {col!r} is a declared stat column")
    for c in m.get("constraints") or []:
        import re as _re

        if _re.search(rf"\b{_re.escape(col)}\b", c):
            raise ValueError(
                f"column {col!r} is referenced by constraint {c!r}"
            )
    cmap.pop(col, None)
    dropped = list(m.get("dropped_cols") or [])
    if phys not in dropped:
        dropped.append(phys)
    v = parent + 1
    manifest = {"version": v, "parent": parent, "op": f"drop_column:{col}",
                "key": m["key"], "files": m["files"], "column_map": cmap,
                "dropped_cols": dropped}
    _write_manifest(spark, root, _with_txns(m, manifest))
    return v


def lake_read(spark: SparkSession, root: str, version: int | None = None) -> DataFrame:
    """Snapshot read: one manifest fetch, then Spark plans over exactly
    that version's files, minus that version's deletion-vector rows
    (merge-on-read anti-join — a no-op when the snapshot has no DVs),
    projected through the snapshot's column map (renames/drops are
    metadata-only). Older versions stay readable until vacuumed."""
    v = latest_version(spark, root) if version is None else version
    m = _read_manifest(spark, root, v)
    if not m["files"]:
        schema_src = _find_schema_source(spark, root, v)
        if schema_src is None:
            raise ValueError(f"version {v} is empty and no ancestor has files")
        return spark.read.parquet(*schema_src).limit(0)
    # union-schema read (null-filling old files) when the snapshot's
    # fingerprints differ — the additive-evolution contract lake
    # formats promise; single-schema snapshots skip the footer merge
    base = _read_files(spark, m["files"])
    return _apply_column_map(
        _apply_dvs(base, _dv_frame(spark, m), base.columns), m
    )


def lake_read_range(
    spark: SparkSession, root: str, column: str, lo, hi, version: int | None = None
):
    """Range read planned ENTIRELY from manifest metadata (the Iceberg
    scan-planning idea): files whose stored [min, max] for ``column``
    (a ``stat_cols`` member declared at lake_create) is disjoint from
    [lo, hi] are never handed to Spark — zero parquet footers are
    opened to decide, so planning cost is one manifest fetch at any
    table size. Files without stats for the column (pre-declaration
    commits) are conservatively kept. The residual filter still
    applies (pruning is file-granular), and deletion vectors apply as
    in lake_read. Returns (DataFrame, n_files_planned, n_files_total)
    so callers and tests can assert the prune actually happened —
    date-cluster the writes (repartitionByRange on the stat column)
    or every hull overlaps and nothing prunes."""
    v = latest_version(spark, root) if version is None else version
    m = _read_manifest(spark, root, v)
    # callers speak the logical schema; stats are keyed physical
    phys = (m.get("column_map") or {}).get(column, column)
    lo_j, hi_j = _json_stat(lo), _json_stat(hi)

    def overlaps(f):
        st = (f.get("stats") or {}).get(phys)
        if st is None or st[0] is None:
            return True  # no stats recorded: must read
        return not (st[1] < lo_j or st[0] > hi_j)

    kept = [f for f in m["files"] if overlaps(f)]
    if not kept:
        base = lake_read(spark, root, v).limit(0)
        return base.where(F.col(column).between(lo, hi)), 0, len(m["files"])
    scan = _read_files(spark, kept)
    live = _apply_column_map(
        _apply_dvs(scan, _dv_frame(spark, m), scan.columns), m
    )
    return live.where(F.col(column).between(lo, hi)), len(kept), len(m["files"])


def _find_schema_source(spark, root, v):
    while v > 0:
        m = _read_manifest(spark, root, v)
        if m["files"]:
            return [f["path"] for f in m["files"]]
        v = m["parent"]
    return None


def _enforce_constraints(
    spark: SparkSession, root: str, df: DataFrame, constraints: list[str], mode: str
):
    """Write-side CHECK constraints (the Delta table-constraint idea):
    every incoming row must satisfy EVERY stored predicate. ``strict``
    refuses the whole commit loudly on the first violation count
    (one aggregate over the batch — no row ever lands); ``quarantine``
    diverts violating rows to ``_quarantine/`` parquet and admits the
    rest (the etl_expectations_quarantine discipline applied at the
    storage boundary, so EVERY writer — batch, streaming, clone —
    goes through one gate). Rows where a predicate is NULL count as
    violations: an unevaluable constraint must never admit a row.
    Returns (valid_df, n_rejected)."""
    ok = None
    for c in constraints:
        cond = F.coalesce(F.expr(c), F.lit(False))
        ok = cond if ok is None else (ok & cond)
    bad = df.where(~ok)
    if mode == "strict":
        n_bad = bad.count()
        if n_bad:
            raise ValueError(
                f"constraint violation: {n_bad} incoming row(s) fail "
                f"{constraints!r} — commit refused (strict mode)"
            )
        return df, 0
    # count first and skip the write entirely on a clean batch — the
    # common case for a healthy stream; otherwise every micro-batch
    # leaves an empty _quarantine/ dir that nothing sweeps (ADVICE r9).
    # The count is one batch-sized aggregate, never table-sized.
    n_bad = bad.count()
    if n_bad == 0:
        return df, 0
    q_dir = f"{root}/_quarantine/q{uuid.uuid4().hex[:8]}"
    bad.write.mode("errorifexists").parquet(q_dir)
    return df.where(ok), n_bad


def lake_append(
    spark: SparkSession, root: str, df: DataFrame, on_violation: str = "strict"
) -> int:
    """Blind append: O(new data) write + metadata commit. No existing
    file is read or rewritten. Stored CHECK constraints validate the
    batch first (strict refuse / quarantine divert). Commit collisions
    retry METADATA-ONLY (VERDICT r9 #5): the staged files are parent-
    independent and referenced by full path, so a losing writer just
    re-reads the new latest and re-lists — unless the table's
    constraints changed underneath it, which refuses loudly (the
    staged batch was validated against the old invariants)."""
    staged = checked = None
    for attempt in range(_MAX_COMMIT_RETRIES + 1):
        parent = latest_version(spark, root)
        m = _read_manifest(spark, root, parent)
        v = parent + 1
        cons = m.get("constraints")
        if staged is not None and cons != checked:
            raise CommitConflict(
                "table constraints changed while retrying append; re-run "
                "so the batch re-validates against the new invariants"
            )
        if staged is None:
            if cons:
                df, _ = _enforce_constraints(spark, root, df, cons, on_violation)
            checked = cons
            staged = _commit_data(
                spark, root, v, _guard_dropped(_to_physical(df, m), m),
                m["key"], m.get("stat_cols"),
            )
        try:
            _write_manifest(
                spark,
                root,
                _with_txns(
                    m,
                    {
                        "version": v,
                        "parent": parent,
                        "op": "append",
                        "key": m["key"],
                        "files": m["files"] + staged,
                    },
                ),
            )
            return v
        except CommitConflict:
            if attempt == _MAX_COMMIT_RETRIES:
                raise
    raise AssertionError("unreachable")


@_retry_on_conflict
def lake_upsert(
    spark: SparkSession, root: str, changes: DataFrame, on_violation: str = "strict"
) -> int:
    """Copy-on-write MERGE (update matched keys, insert the rest) with
    manifest-stats file skipping: only files whose [min_key, max_key]
    overlaps the change hull are read; a matched key cannot live in a
    non-overlapping file, so carried files need no inspection. The
    rewrite reads O(overlapping files) + O(changes), never the table.
    Stored CHECK constraints validate the change set first (r10 —
    MERGE used to bypass the gate every other writer goes through)."""
    parent = latest_version(spark, root)
    m = _read_manifest(spark, root, parent)
    key = m["key"]
    v = parent + 1
    if m.get("constraints"):
        changes = _enforce_constraints(
            spark, root, changes, m["constraints"], on_violation
        )[0]
    changes = _guard_dropped(_to_physical(changes, m), m)

    hull = changes.agg(
        F.count(F.lit(1)).alias("n"), F.min(key).alias("lo"), F.max(key).alias("hi")
    ).collect()[0]
    if hull["n"] == 0:  # empty change set: metadata-only no-op commit
        _write_manifest(
            spark,
            root,
            _with_txns(
                m,
                {"version": v, "parent": parent, "op": "upsert", "key": key,
                 "files": m["files"]},
            ),
        )
        return v

    # NULL-key change rows can't match any stored key (hull/anti-join
    # both ignore NULLs), so they take the plain-insert path below —
    # a non-empty all-NULL-key batch still inserts instead of silently
    # vanishing into the empty-change branch.
    cand = (
        []
        if hull["lo"] is None
        else [
            f
            for f in m["files"]
            if f["min_key"] is not None
            and not (f["max_key"] < hull["lo"] or f["min_key"] > hull["hi"])
        ]
    )
    carried = [f for f in m["files"] if f not in cand]

    merged = changes
    if cand:
        # union-schema read + allowMissingColumns: a rewrite that
        # touches files from before AND after an additive schema
        # evolution must carry the union schema forward (old rows
        # null-fill), never infer one footer's narrow schema and drop
        # evolved columns (ADVICE r8 high). Deletion vectors are
        # applied BEFORE the rewrite — a COW rewrite of a DV'd file
        # must not resurrect its deleted rows (the rewritten file
        # leaves the manifest, so its DV rows go inert with it).
        old = _read_files(spark, cand)
        old = _apply_dvs(old, _dv_frame(spark, m), old.columns)
        merged = old.join(changes.select(key), key, "left_anti").unionByName(
            changes, allowMissingColumns=True
        )
    new_files = _commit_data(spark, root, v, merged, key, m.get("stat_cols"))
    _write_manifest(
        spark,
        root,
        _with_txns(
            m,
            {
                "version": v,
                "parent": parent,
                "op": "upsert",
                "key": key,
                "files": carried + new_files,
            },
        ),
    )
    return v


@_retry_on_conflict
def lake_delete(spark: SparkSession, root: str, predicate: str) -> int:
    """Copy-on-write DELETE of rows matching a SQL predicate. Arbitrary
    predicates can't be pruned from key stats, so pruning is one scan
    counting matches per file (``_metadata.file_path`` group-by with
    the predicate pushed into the scan); files with zero matches carry
    by reference, files with matches are rewritten predicate-inverted."""
    parent = latest_version(spark, root)
    m = _read_manifest(spark, root, parent)
    v = parent + 1
    if not m["files"]:
        _write_manifest(
            spark,
            root,
            _with_txns(
                m,
                {"version": v, "parent": parent, "op": "delete", "key": m["key"],
                 "files": []},
            ),
        )
        return v

    # union-schema scans (fingerprint-gated): a predicate may reference
    # an evolved column, and the survivor rewrite must carry the union
    # schema (old files null-fill) instead of one footer's narrow one.
    # Both scans are LIVE-row scans (deletion vectors applied): a row
    # already DV-deleted must neither count as a match nor be written
    # back as a survivor (resurrection).
    dv = _dv_frame(spark, m)
    scan = _read_files(spark, m["files"])
    keyed = _apply_column_map(  # predicates speak the LOGICAL schema
        _apply_dvs(
            scan.withColumn("_path", F.col("_metadata.file_path")),
            dv,
            [*scan.columns, "_path"],
        ),
        m,
    )
    touched = {
        r["path"]
        for r in keyed.where(F.expr(predicate))
        .groupBy(F.col("_path").alias("path"))
        .count()
        .collect()
    }
    carried = [f for f in m["files"] if f["path"] not in touched]
    new_files: list[dict] = []
    if touched:
        # DELETE removes rows where the predicate is TRUE; rows where
        # it evaluates NULL (e.g. an evolved column null-filled in old
        # files) must SURVIVE — a bare NOT(p) would silently drop them.
        tscan = _read_files(spark, [f for f in m["files"] if f["path"] in touched])
        survivors = _apply_column_map(
            _apply_dvs(tscan, dv, tscan.columns), m
        ).where(~F.coalesce(F.expr(predicate), F.lit(False)))
        # survivors are logical; rewrite them physical (dropped columns
        # fall away here — the lazy physical cleanup a COW pass buys)
        new_files = _commit_data(
            spark, root, v, _to_physical(survivors, m), m["key"], m.get("stat_cols")
        )
    _write_manifest(
        spark,
        root,
        _with_txns(
            m,
            {
                "version": v,
                "parent": parent,
                "op": "delete",
                "key": m["key"],
                "files": carried + new_files,
            },
        ),
    )
    return v


def _write_dv(spark: SparkSession, root: str, version: int, matched: DataFrame):
    """Write one deletion-vector sidecar and return (rows, dir). The
    row count rides an Observation on the write action itself — no
    second read-back job per delete commit."""
    from pyspark.sql import Observation

    dv_dir = f"{root}/dv/d{version:08d}-{uuid.uuid4().hex[:8]}"
    obs = Observation()
    matched.observe(obs, F.count(F.lit(1)).alias("n")).write.mode(
        "errorifexists"
    ).parquet(dv_dir)
    return int(obs.get["n"]), dv_dir


@_retry_on_conflict
def lake_delete_dv(spark: SparkSession, root: str, predicate: str) -> int:
    """Merge-on-read DELETE via deletion vectors: instead of rewriting
    every touched file (lake_delete's copy-on-write), record the
    POSITIONS of matched rows — (file_path, _metadata.row_index),
    parquet's stable in-file row numbering — in an immutable sidecar
    parquet under ``dv/``, and let reads subtract them with an
    anti-join. The Delta deletion-vector / Iceberg positional-delete
    trade: a 10-row delete from a 100 TB table writes kilobytes and
    rewrites NOTHING; reads pay one extra (file, pos) anti-join whose
    build side is O(deleted rows), paid down by lake_compact_dvs.

    Semantics match lake_delete exactly (test-pinned): rows where the
    predicate is TRUE are marked; NULL survives. The matching scan is
    a LIVE scan (existing vectors applied), so re-running a predicate
    marks nothing new and two overlapping DV deletes never
    double-mark. Data files are untouched — time travel to any prior
    version still sees the rows, because each manifest pins its own
    ``dvs`` list alongside its file list."""
    parent = latest_version(spark, root)
    m = _read_manifest(spark, root, parent)
    v = parent + 1
    dvs = list(m.get("dvs") or [])
    if m["files"]:
        scan = _read_files(spark, m["files"])
        keyed = _apply_dvs(
            scan.withColumn("file_path", F.col("_metadata.file_path")).withColumn(
                "row_index", F.col("_metadata.row_index")
            ),
            _dv_frame(spark, m),
            [*scan.columns, "file_path", "row_index"],
        )
        matched = (
            _apply_column_map(keyed, m)  # predicates speak logical
            .where(F.expr(predicate))
            .select("file_path", "row_index")
        )
        n, dv_dir = _write_dv(spark, root, v, matched)
        if n:
            dvs.append({"path": dv_dir, "rows": n})
        # a zero-match attempt leaves an empty dir for vacuum to sweep
    _write_manifest(
        spark,
        root,
        _with_txns(
            m,
            {"version": v, "parent": parent, "op": "delete_dv", "key": m["key"],
             "files": m["files"], "dvs": dvs},
        ),
    )
    return v


@_retry_on_conflict
def lake_delete_dv_keys(
    spark: SparkSession,
    root: str,
    keys: DataFrame,
    app: str | None = None,
    batch_id: int | None = None,
) -> int | None:
    """Positional delete by KEY SET — the CDC/GDPR tombstone shape
    (lake_delete_dv's predicate form can't carry a million-id IN
    list through the plan). Manifest key stats prune the scan to
    files whose [min_key, max_key] overlaps the key hull (a matched
    key cannot live elsewhere), existing vectors apply first
    (idempotent re-marking), and the matched positions append as one
    sidecar: cost is O(overlapping files + |keys|), rewrite nothing.

    With ``app``/``batch_id`` the commit is EXACTLY-ONCE under
    foreachBatch's at-least-once contract via the same cumulative
    ``txns`` watermark as lake_stream_append (returns None on a
    replayed batch) — streaming deletes and streaming appends share
    one idempotence ledger, so interleaving them stays safe."""
    parent = latest_version(spark, root)
    m = _read_manifest(spark, root, parent)
    if app is not None:
        last = m.get("txns", {}).get(app)
        if last is not None and batch_id is not None and batch_id <= last:
            return None
    v = parent + 1
    key = m["key"]
    keys = _to_physical(keys, m)  # callers speak the logical schema
    dvs = list(m.get("dvs") or [])
    hull = keys.agg(
        F.count(F.lit(1)).alias("n"), F.min(key).alias("lo"), F.max(key).alias("hi")
    ).collect()[0]
    cand = (
        []
        if hull["n"] == 0 or hull["lo"] is None
        else [
            f
            for f in m["files"]
            if f["min_key"] is not None
            and not (f["max_key"] < hull["lo"] or f["min_key"] > hull["hi"])
        ]
    )
    if cand:
        scan = _read_files(spark, cand)
        keyed = _apply_dvs(
            scan.withColumn("file_path", F.col("_metadata.file_path")).withColumn(
                "row_index", F.col("_metadata.row_index")
            ),
            _dv_frame(spark, m),
            [key, "file_path", "row_index"],
        )
        matched = keyed.join(keys.select(key), key, "left_semi").select(
            "file_path", "row_index"
        )
        n, dv_dir = _write_dv(spark, root, v, matched)
        if n:
            dvs.append({"path": dv_dir, "rows": n})
    manifest = {"version": v, "parent": parent, "op": "delete_dv_keys",
                "key": key, "files": m["files"], "dvs": dvs}
    if app is not None and batch_id is not None:
        manifest["txns"] = {**m.get("txns", {}), app: batch_id}
    _write_manifest(spark, root, _with_txns(m, manifest))
    return v


@_retry_on_conflict
def lake_compact_dvs(spark: SparkSession, root: str) -> int:
    """Fold the deletion vectors back into the data (merge-on-read →
    copy-on-write): rewrite exactly the files that have DV'd positions
    with their deletions applied, carry every clean file by REFERENCE,
    and commit with an empty ``dvs`` list. Logical state is identical
    (read-before ≡ read-after, test-pinned); cost tracks the DV'd-file
    volume, never the table. This is the maintenance step that keeps
    the read-side anti-join bounded — run it when the vector volume or
    per-file deletion ratio crosses a threshold, exactly Delta's
    OPTIMIZE on tables with deletion vectors."""
    parent = latest_version(spark, root)
    m = _read_manifest(spark, root, parent)
    v = parent + 1
    dv = _dv_frame(spark, m)
    carried, new_files = m["files"], []
    if dv is not None:
        # bounded collect: DISTINCT file paths present in the vectors —
        # file-count sized, never row-count sized
        dv_paths = {r["_dv_fp"] for r in dv.select("_dv_fp").distinct().collect()}
        touched = [f for f in m["files"] if f["path"] in dv_paths]
        carried = [f for f in m["files"] if f["path"] not in dv_paths]
        if touched:
            tscan = _read_files(spark, touched)
            live = _apply_dvs(tscan, dv, tscan.columns)
            new_files = _commit_data(spark, root, v, live, m["key"], m.get("stat_cols"))
    _write_manifest(
        spark,
        root,
        _with_txns(
            m,
            {"version": v, "parent": parent, "op": "compact_dvs", "key": m["key"],
             "files": carried + new_files, "dvs": []},
        ),
    )
    return v


def lake_changes(
    spark: SparkSession, root: str, v_from: int, v_to: int
) -> DataFrame:
    """Change data feed between two snapshots by FILE diff: only files
    in the symmetric difference of the two manifests are read (carried
    files can't contain changes), then unchanged rows that merely rode
    along in copy-on-write rewrites cancel out via EXCEPT ALL in both
    directions. Result: '+' rows (inserts + post-update values) and
    '-' rows (deletes + pre-update values) — the multiset state diff,
    computed at O(changed files) cost instead of scanning both
    snapshots. The lake-native equivalent of
    `text_corpus_snapshot_diff`, and the input a downstream
    incremental MV wants."""
    mf = _read_manifest(spark, root, v_from)
    mt = _read_manifest(spark, root, v_to)
    from_paths = {f["path"] for f in mf["files"]}
    to_paths = {f["path"] for f in mt["files"]}
    added_only = sorted(
        (f for f in mt["files"] if f["path"] not in from_paths),
        key=lambda f: f["path"],
    )
    removed_only = sorted(
        (f for f in mf["files"] if f["path"] not in to_paths),
        key=lambda f: f["path"],
    )

    schema_files = added_only or removed_only or mt["files"]
    if not schema_files:
        raise ValueError("both snapshots are empty — no schema to diff against")

    # fingerprint-gated union-schema reads: a diff window spanning
    # several commits may mix pre- and post-evolution files on one side.
    # Each side is a LIVE scan under ITS OWN snapshot's deletion
    # vectors: a file appended then DV-deleted inside the window must
    # not emit '+' rows for its dead positions, and a file that was
    # DV'd at v_from must not emit '-' rows for positions that were
    # already invisible there.
    empty = _read_files(spark, schema_files).limit(0)
    dv_from, dv_to = _dv_frame(spark, mf), _dv_frame(spark, mt)
    if added_only:
        a_scan = _read_files(spark, added_only)
        added = _apply_dvs(a_scan, dv_to, a_scan.columns)
    else:
        added = empty
    if removed_only:
        r_scan = _read_files(spark, removed_only)
        removed = _apply_dvs(r_scan, dv_from, r_scan.columns)
    else:
        removed = empty

    # DV-diff leg: vectors ADDED in the window delete rows from files
    # carried in BOTH manifests (rows in files that left the manifest
    # already show up via the file diff — restricting to carried files
    # is what prevents double-counting them). Resolve the new positions
    # back to row content with an inner join on (file, pos): O(new DV
    # rows), never a table scan.
    from_dv_paths = {d["path"] for d in mf.get("dvs") or []}
    new_dv = [d for d in mt.get("dvs") or [] if d["path"] not in from_dv_paths]
    both = [f for f in mt["files"] if f["path"] in from_paths]
    if new_dv and both:
        marks = (
            spark.read.parquet(*[d["path"] for d in new_dv])
            .select(
                F.col("file_path").alias("_dv_fp"),
                F.col("row_index").alias("_dv_ri"),
            )
            .dropDuplicates(["_dv_fp", "_dv_ri"])
        )
        b_scan = _read_files(spark, both)
        keyed = b_scan.withColumn("_fp", F.col("_metadata.file_path")).withColumn(
            "_ri", F.col("_metadata.row_index")
        )
        dv_removed = keyed.join(
            marks,
            (keyed["_fp"] == marks["_dv_fp"]) & (keyed["_ri"] == marks["_dv_ri"]),
        ).select(*b_scan.columns)
        removed = removed.unionByName(dv_removed, allowMissingColumns=True)

    # symmetric leg: vectors DROPPED in the window while their files
    # carried (a rollback across a DV delete) RESURRECT those rows
    to_dv_paths = {d["path"] for d in mt.get("dvs") or []}
    gone_dv = [d for d in mf.get("dvs") or [] if d["path"] not in to_dv_paths]
    if gone_dv and both:
        marks = (
            spark.read.parquet(*[d["path"] for d in gone_dv])
            .select(
                F.col("file_path").alias("_dv_fp"),
                F.col("row_index").alias("_dv_ri"),
            )
            .dropDuplicates(["_dv_fp", "_dv_ri"])
        )
        b_scan = _read_files(spark, both)
        keyed = b_scan.withColumn("_fp", F.col("_metadata.file_path")).withColumn(
            "_ri", F.col("_metadata.row_index")
        )
        dv_added = keyed.join(
            marks,
            (keyed["_fp"] == marks["_dv_fp"]) & (keyed["_ri"] == marks["_dv_ri"]),
        ).select(*b_scan.columns)
        added = added.unionByName(dv_added, allowMissingColumns=True)

    # Align the two sides to the UNION schema (null-filling missing
    # columns) before exceptAll: across a schema-evolution boundary the
    # sides differ in width, and exceptAll compares positionally — an
    # unaligned diff either throws or cancels rows that actually differ
    # in the evolved column (missed updates in the CDF).
    union_cols: dict[str, str] = {}
    for df in (added, removed):
        for name, typ in df.dtypes:
            union_cols.setdefault(name, typ)
    order = [c for c, _ in added.dtypes] + [
        c for c, _ in removed.dtypes if c not in added.columns
    ]

    def _align(df):
        out = df
        for name, typ in union_cols.items():
            if name not in out.columns:
                out = out.withColumn(name, F.lit(None).cast(typ))
        return out.select(*order)

    added, removed = _align(added), _align(removed)
    plus = added.exceptAll(removed).select(F.lit("+").alias("op"), "*")
    minus = removed.exceptAll(added).select(F.lit("-").alias("op"), "*")
    # emit under v_to's LOGICAL names (column map / drops applied)
    return _apply_column_map(plus.unionByName(minus), mt)


def committed_tags(spark: SparkSession, root: str) -> set:
    """Idempotence tags of every committed version — audit/debug view
    (O(versions) manifest reads; the streaming hot path uses the O(1)
    cumulative ``txns`` watermark in the latest manifest instead)."""
    tags = set()
    for v in range(1, latest_version(spark, root) + 1):
        tag = _read_manifest(spark, root, v).get("tag")
        if tag is not None:
            tags.add(tag)
    return tags


@_retry_on_conflict
def lake_stream_append(
    spark: SparkSession,
    root: str,
    df: DataFrame,
    batch_id: int,
    key: str,
    app: str = "stream-append",
) -> int | None:
    """Exactly-once streaming ingest under foreachBatch's
    at-least-once contract (the Delta `txnAppId`/`txnVersion` idea):
    every manifest carries a cumulative ``txns`` map of
    {app: highest committed batch id}, propagated through ALL commit
    ops, so the replay check is ONE read of the latest manifest —
    O(1) per micro-batch, not O(versions) (a 10k-batch stream stays at
    10k manifest reads total, never ~50M). Batch ids are monotonic
    under Structured Streaming's contract, so ``batch_id <= watermark``
    detects any re-delivery. First batch bootstraps the table.
    Returns the committed version, or None for a skip."""
    tag = f"{app}:{batch_id}"
    fs, jvm = _fs(spark, root)
    exists = fs.exists(jvm.org.apache.hadoop.fs.Path(root, _MANIFEST_DIR))
    if not exists:
        v = 1
        files = _commit_data(spark, root, v, df, key)
        _write_manifest(
            spark,
            root,
            {"version": 1, "parent": 0, "op": "create", "key": key, "files": files,
             "tag": tag, "txns": {app: batch_id}},
        )
        return v
    parent = latest_version(spark, root)
    m = _read_manifest(spark, root, parent)
    last = m.get("txns", {}).get(app)
    if last is None and "txns" not in m:
        # pre-txns table (older layout): one-time full tag scan
        if tag in committed_tags(spark, root):
            return None
    elif last is not None and batch_id <= last:
        return None
    v = parent + 1
    if m.get("constraints"):
        # streaming ingest quarantines rather than raising: one poison
        # batch must not kill the query; the diverted rows are auditable
        df, _ = _enforce_constraints(spark, root, df, m["constraints"], "quarantine")
    df = _guard_dropped(_to_physical(df, m), m)
    new_files = _commit_data(spark, root, v, df, m["key"], m.get("stat_cols"))
    txns = {**m.get("txns", {}), app: batch_id}
    manifest = {"version": v, "parent": parent, "op": "append", "key": m["key"],
                "files": m["files"] + new_files, "tag": tag, "txns": txns}
    # route through _with_txns so dvs/stat_cols/constraints all carry —
    # a streaming micro-batch must not silently drop the table's CHECK
    # constraints or per-file stats (ADVICE r9 high); the manifest's own
    # txns (merged watermark) wins under the not-in-manifest guard
    _write_manifest(spark, root, _with_txns(m, manifest))
    return v


def lake_shallow_clone(
    spark: SparkSession, src_root: str, dst_root: str, version: int | None = None
) -> int:
    """Zero-copy SHALLOW CLONE (Delta's CLONE): the new table's v1
    manifest REFERENCES the source snapshot's data files and deletion
    vectors by absolute path — no byte is copied, clone cost is one
    manifest write at any table size. The clone then evolves
    independently (its appends/deletes/compactions land under its own
    root and never touch source bytes — immutability test-pinned).
    The honest caveat every shallow-clone implementation carries:
    VACUUMING THE SOURCE can delete files a clone still references
    (the clone's manifests are invisible to the source's reachability
    walk) — promote to a deep clone (rewrite via lake_create on a
    clone read) before vacuuming a cloned-from table, exactly as the
    Delta docs prescribe."""
    v = latest_version(spark, src_root) if version is None else version
    m = _read_manifest(spark, src_root, v)
    manifest = {
        "version": 1,
        "parent": 0,
        "op": f"clone:{src_root}@{v}",
        "key": m["key"],
        "files": m["files"],
    }
    if m.get("dvs"):
        manifest["dvs"] = m["dvs"]
    if m.get("stat_cols"):
        manifest["stat_cols"] = m["stat_cols"]
    if m.get("constraints"):
        # clones keep enforcing the source's CHECK invariants, matching
        # lake_deep_clone (ADVICE r9: the two paths were inconsistent)
        manifest["constraints"] = m["constraints"]
    _write_manifest(spark, dst_root, manifest)
    return 1


def lake_deep_clone(
    spark: SparkSession, src_root: str, dst_root: str, version: int | None = None
) -> int:
    """Promote to a DEEP clone: materialize the source snapshot's LIVE
    rows (vectors applied) into the clone's own data files — after
    this, vacuuming the source can never strand the clone (the shallow
    clone's documented hazard). Costs one full read+write of the
    snapshot, which is exactly the price of independence; constraints
    and stat columns carry so the clone keeps enforcing and pruning."""
    v = latest_version(spark, src_root) if version is None else version
    m = _read_manifest(spark, src_root, v)
    return lake_create(
        spark,
        dst_root,
        lake_read(spark, src_root, v),
        m["key"],
        stat_cols=m.get("stat_cols"),
        constraints=m.get("constraints"),
    )


@_retry_on_conflict
def lake_rollback(spark: SparkSession, root: str, to_version: int) -> int:
    """Roll the table back by COMMITTING FORWARD: the new version's
    file list is the target version's, and the bad intermediate
    versions remain in history for audit — nothing is deleted."""
    parent = latest_version(spark, root)
    target = _read_manifest(spark, root, to_version)
    v = parent + 1
    # txns come from the PARENT (latest), not the rollback target:
    # rolling back data must not forget which stream batches committed,
    # or a replay after rollback would double-append. DVs come from the
    # TARGET — they are part of the data state being restored (files
    # and their deletion vectors travel together).
    _write_manifest(
        spark,
        root,
        _with_txns(
            _read_manifest(spark, root, parent),
            {
                "version": v,
                "parent": parent,
                "op": f"rollback:{to_version}",
                "key": target["key"],
                "files": target["files"],
                "dvs": target.get("dvs") or [],
            },
        ),
    )
    return v


@_retry_on_conflict
def lake_compact(
    spark: SparkSession, root: str, small_rows: int, target_partitions: int = 1
) -> int:
    """OPTIMIZE/bin-packing: coalesce files below ``small_rows`` into
    ``target_partitions`` larger ones in a new metadata commit — the
    logical state is IDENTICAL (read-before ≡ read-after, test-pinned)
    and files at or above the threshold carry by reference, so the
    cost tracks the small-file debt, not the table. The maintenance
    commit streaming ingest needs: appends land batch-sized files,
    compaction periodically folds them, and time travel still reads
    the pre-compaction layout from the old manifests."""
    parent = latest_version(spark, root)
    m = _read_manifest(spark, root, parent)
    v = parent + 1
    small = [f for f in m["files"] if f["rows"] < small_rows]
    carried = [f for f in m["files"] if f["rows"] >= small_rows]
    new_files: list[dict] = []
    if len(small) > 1:
        # fingerprint-gated union-schema read: the small-file set may
        # straddle an additive evolution; the rewrite carries the union.
        # DVs applied before packing (a DV'd small file must not
        # resurrect its deleted rows in the packed file).
        sscan = _read_files(spark, small)
        packed = _apply_dvs(sscan, _dv_frame(spark, m), sscan.columns).coalesce(
            target_partitions
        )
        new_files = _commit_data(spark, root, v, packed, m["key"], m.get("stat_cols"))
    else:
        carried = m["files"]  # nothing worth packing: metadata-only commit
    _write_manifest(
        spark,
        root,
        _with_txns(
            m,
            {
                "version": v,
                "parent": parent,
                "op": "compact",
                "key": m["key"],
                "files": carried + new_files,
            },
        ),
    )
    return v


def lake_fsck(spark: SparkSession, root: str, version: int | None = None) -> DataFrame:
    """Integrity audit (fsck) of a snapshot: re-count every manifest
    file's ACTUAL parquet rows against the recorded stats, and split
    the deletion vectors into live rows (referencing current files)
    vs inert rows (referencing files that later rewrites dropped —
    harmless by design, but a monotonically growing inert share is
    the signal to run lake_compact_dvs). One distributed count per
    audit (the scan is the cost — this is the weekly maintenance
    report, not a hot-path op); emits a single summary row so the
    audit itself is cheap to store per table per day."""
    v = latest_version(spark, root) if version is None else version
    m = _read_manifest(spark, root, v)
    manifest_rows = sum(f["rows"] for f in m["files"])
    actual = {}
    if m["files"]:
        actual = {
            r["path"]: r["n"]
            for r in spark.read.parquet(*[f["path"] for f in m["files"]])
            .groupBy(F.col("_metadata.file_path").alias("path"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()  # bounded: one row per data file
        }
    mismatched = sum(
        1 for f in m["files"] if actual.get(f["path"], 0) != f["rows"]
    )
    dv_live = dv_inert = 0
    dv = _dv_frame(spark, m)
    if dv is not None:
        paths = {f["path"] for f in m["files"]}
        by_file = dv.groupBy("_dv_fp").agg(F.count(F.lit(1)).alias("n")).collect()
        for r in by_file:  # bounded: one row per DV'd file
            if r["_dv_fp"] in paths:
                dv_live += r["n"]
            else:
                dv_inert += r["n"]
    return spark.createDataFrame(
        [
            (
                v,
                len(m["files"]),
                manifest_rows,
                sum(actual.values()),
                mismatched,
                dv_live,
                dv_inert,
            )
        ],
        "version long, n_files long, manifest_rows long, actual_rows long, "
        "n_mismatched_files long, dv_live_rows long, dv_inert_rows long",
    )


def lake_history(spark: SparkSession, root: str) -> list[dict]:
    """Commit log: (version, parent, op, n_files, n_rows) per version,
    newest last — metadata only."""
    out = []
    for v in range(1, latest_version(spark, root) + 1):
        m = _read_manifest(spark, root, v)
        out.append(
            {
                "version": m["version"],
                "parent": m["parent"],
                "op": m["op"],
                "n_files": len(m["files"]),
                "n_rows": sum(f["rows"] for f in m["files"]),
                "n_dv_rows": sum(d["rows"] for d in m.get("dvs") or []),
            }
        )
    return out


def lake_vacuum(spark: SparkSession, root: str, retain_last: int = 1) -> dict:
    """Delete data files unreachable from the newest ``retain_last``
    manifests, and drop the manifests below that horizon. This is the
    explicit space-for-time-travel trade; reads of vacuumed versions
    fail loudly afterwards (no manifest). Driver work is file-count
    bounded."""
    if retain_last < 1:
        raise ValueError("retain_last must be >= 1")
    fs, jvm = _fs(spark, root)
    latest = latest_version(spark, root)
    horizon = max(1, latest - retain_last + 1)
    keep: set[str] = set()
    keep_dv: set[str] = set()
    for v in range(horizon, latest + 1):
        mv = _read_manifest(spark, root, v)
        keep.update(f["path"] for f in mv["files"])
        # dv dirs are reachable state exactly like data files: a swept
        # vector would silently RESURRECT its deleted rows
        keep_dv.update(d["path"].rstrip("/").rsplit("/", 1)[-1] for d in mv.get("dvs") or [])

    removed_files = 0
    data_dir = jvm.org.apache.hadoop.fs.Path(root, "data")
    if fs.exists(data_dir):
        for cdir in fs.listStatus(data_dir):
            kept_any = False
            for st in fs.listStatus(cdir.getPath()):
                path_str = st.getPath().toString()
                # manifests store fully-qualified paths from _metadata
                if st.getPath().getName().startswith("_"):
                    continue
                if not any(k.endswith(path_str.split("/data/", 1)[-1]) for k in keep):
                    fs.delete(st.getPath(), False)
                    removed_files += 1
                else:
                    kept_any = True
            # a fully-swept attempt dir (crashed or race-losing writer)
            # is dead weight in future listings — remove it
            if not kept_any:
                fs.delete(cdir.getPath(), True)
    removed_dv_dirs = 0
    dv_dir = jvm.org.apache.hadoop.fs.Path(root, "dv")
    if fs.exists(dv_dir):
        for st in fs.listStatus(dv_dir):
            if st.getPath().getName() not in keep_dv:
                fs.delete(st.getPath(), True)
                removed_dv_dirs += 1
    removed_manifests = 0
    for v in range(1, horizon):
        p = _manifest_path(jvm, root, v)
        if fs.exists(p):
            fs.delete(p, False)
            removed_manifests += 1
    return {
        "removed_files": removed_files,
        "removed_manifests": removed_manifests,
        "removed_dv_dirs": removed_dv_dirs,
    }
