"""Declarative MERGE-style upsert against a partitioned parquet target.

The reference's migrate-into-existing-destination story (upstream
ETLAlchemySource.py ≈L700 send_data append mode + ETLAlchemyTarget
orchestration) re-expressed as the lakehouse primitive it becomes at
scale: ``MERGE INTO target USING changes`` with
matched-update / matched-delete / not-matched-insert arms, rewritten as
one full-outer equi-join — no per-row lookups, no driver loop.

Scale design (the part that matters at 100 TB):

- Only partitions PRESENT in the change set are read (``part_col IN
  (...)`` reaches the parquet scan as partition pruning) and only those
  are rewritten (``partitionOverwriteMode=dynamic``). A merge touching
  2 of 10,000 date partitions reads and writes 2 — untouched partition
  files are left byte-identical on disk (test-pinned in
  tests/test_merge.py).
- The touched-partition list is the ONE driver-side collect, bounded by
  the partition count of the change set — partition KEYS, never data.
- The join shuffles only the touched slice of the target + the change
  set, hashed on the merge key.
- The merged slice is materialized (localCheckpoint) before the write
  because the write overwrites directories the plan reads from; a real
  deployment writing snapshots (or a table format with a commit
  protocol) skips that cut.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _touched_partition_filter(part_col: str, touched: list) -> Column:
    """Null-safe membership test for the touched-partition pruning
    read. ``isin(touched)`` alone evaluates to NULL for NULL partition
    values, so when the change set touches the NULL partition
    (``None in touched``) the target's NULL-partition rows would never
    be loaded into the join — and then either get classified as
    "emptied" (merge_upsert deleting __HIVE_DEFAULT_PARTITION__ with
    live rows in it) or get clobbered by a dynamic overwrite that
    rewrites the partition from change rows alone (upsert_latest).
    NULL partition membership must be tested with ``isNull()``
    (ADVICE r7, high)."""
    non_null = [v for v in touched if v is not None]
    cond = F.col(part_col).isin(non_null) if non_null else F.lit(False)
    if any(v is None for v in touched):
        cond = cond | F.col(part_col).isNull()
    return cond


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    changes: DataFrame,
    key: str,
    part_col: str,
) -> None:
    """Apply ``changes`` (target's columns + ``op`` in {'U','D','I'})
    to the parquet directory at ``target_path`` partitioned by
    ``part_col``. Semantics are ANSI MERGE with three WHEN arms:

    - matched  + op='U' → update (source row wins)
    - matched  + op='D' → delete
    - matched  + op='I' → no-op (insert-on-conflict keeps the target)
    - unmatched + op='I' → insert
    - unmatched + op='U'/'D' → no-op (nothing to update/delete)

    NULL-key change rows are dropped (no identity to merge on);
    NULL-key target rows are PRESERVED untouched — side membership is
    tracked with presence markers, not key nullity, so a NULL target
    key can never be mistaken for an unmatched change row. A delete arm
    that empties a touched partition removes that partition's directory
    explicitly (dynamic overwrite only rewrites partitions present in
    the output, so an all-deleted partition would otherwise survive on
    disk and its rows reappear on readback). Assumed: one change row
    per key, and updates never MOVE a row across partitions
    (``part_col`` is part of row identity — the standard dynamic-
    overwrite constraint; a partition-moving update would need its OLD
    partition in the change set to retire the stale copy)."""
    target = spark.read.parquet(target_path)
    cols = target.columns
    missing = [c for c in cols + ["op"] if c not in changes.columns]
    if missing:
        raise ValueError(f"changes missing columns: {missing}")

    # Bounded collect: distinct partition KEYS of the change set (the
    # partition-pruning list) — at most the table's partition count.
    touched = [r[0] for r in changes.select(part_col).distinct().collect()]

    # Presence markers, NOT key nullity, decide side membership: a
    # target row with a NULL key must read as "matched nothing" (kept
    # as-is), never as a change-side-only row (ADVICE r6).
    t = target.where(_touched_partition_filter(part_col, touched)).select(
        F.lit(True).alias("t_present"),
        *[F.col(c).alias(f"t_{c}") for c in cols],
    )
    c = changes.where(F.col(key).isNotNull()).select(
        F.lit(True).alias("c_present"),
        *[F.col(x).alias(f"c_{x}") for x in cols],
        "op",
    )
    j = t.join(c, t[f"t_{key}"] == c[f"c_{key}"], "full_outer")
    matched = F.col("t_present").isNotNull() & F.col("c_present").isNotNull()
    src_only = F.col("t_present").isNull()
    merged = (
        j.where(~(matched & (F.col("op") == "D")))  # matched-delete arm
        .where(~(src_only & (F.col("op") != "I")))  # U/D with no match: no-op
        .select(
            *[
                F.when(matched & (F.col("op") == "U"), F.col(f"c_{x}"))
                .when(src_only, F.col(f"c_{x}"))
                .otherwise(F.col(f"t_{x}"))
                .alias(x)
                for x in cols
            ]
        )
    )
    # Materialize before overwriting directories the plan reads from.
    merged = merged.localCheckpoint(eager=True)
    # Bounded collect #2 (≤ len(touched) keys): partitions whose every
    # row the delete arm removed. Dynamic overwrite only rewrites
    # partitions PRESENT in the output, so an emptied partition's old
    # files would survive and its "deleted" rows reappear on readback
    # — delete those directories explicitly after the write.
    remaining = {r[0] for r in merged.select(part_col).distinct().collect()}
    emptied = [v for v in touched if v not in remaining]
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy(part_col).parquet(target_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    _delete_partition_dirs(spark, target_path, part_col, emptied)


def _delete_partition_dirs(spark, target_path, part_col, values) -> None:
    """Remove ``part_col=<value>`` directories via the Hadoop FileSystem
    API (works on any Spark-supported FS, not just local disk), using
    Spark's own partition-path escaping so the paths match what the
    writer produced."""
    if not values:
        return
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    esc = jvm.org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    for v in values:
        name = (
            "__HIVE_DEFAULT_PARTITION__" if v is None else esc.escapePathName(str(v))
        )
        p = jvm.org.apache.hadoop.fs.Path(target_path, f"{part_col}={name}")
        p.getFileSystem(hconf).delete(p, True)


def upsert_latest(
    spark: SparkSession,
    target_path: str,
    changes: DataFrame,
    key: str,
    part_col: str,
    seq_col: str,
) -> None:
    """Sequence-guarded upsert — the CDC-apply merge arm: for each key
    the row with the HIGHER ``seq_col`` wins (target wins ties), and
    absent keys insert. No physical delete arm: CDC tombstones ride as
    a flag column and downstream reads filter them, which is what makes
    replay DETERMINISTIC under out-of-order and re-delivered changes —
    a stale or duplicated change row can never overwrite newer state,
    so the final table equals the global max-seq snapshot no matter how
    the change stream was batched (property-tested in
    tests/test_merge.py; the streaming sink in queries/streaming.py
    builds on exactly this invariant).

    Same scale shape as merge_upsert: touched-partition pruning on the
    bounded key list, dynamic partition overwrite, one full-outer
    equi-join per applied batch. ``changes`` must be pre-reduced to one
    row per key (the caller's in-batch max-seq reduce). Bootstrap: an
    empty or not-yet-existing target (no parquet files to infer a
    schema from) merges as if empty — the first batch simply writes."""
    from pyspark.errors.exceptions.captured import AnalysisException

    try:
        target = spark.read.parquet(target_path)
    except AnalysisException:
        target = spark.createDataFrame([], changes.select(*changes.columns).schema)
    cols = target.columns
    missing = [c for c in cols if c not in changes.columns]
    if missing:
        raise ValueError(f"changes missing columns: {missing}")
    touched = [r[0] for r in changes.select(part_col).distinct().collect()]
    if not touched:
        return
    t = target.where(_touched_partition_filter(part_col, touched)).select(
        *[F.col(c).alias(f"t_{c}") for c in cols]
    )
    c = changes.where(F.col(key).isNotNull()).select(
        *[F.col(x).alias(f"c_{x}") for x in cols]
    )
    j = t.join(c, t[f"t_{key}"] == c[f"c_{key}"], "full_outer")
    src_wins = F.col(f"c_{key}").isNotNull() & (
        F.col(f"t_{key}").isNull() | (F.col(f"c_{seq_col}") > F.col(f"t_{seq_col}"))
    )
    merged = j.select(
        *[
            F.when(src_wins, F.col(f"c_{x}")).otherwise(F.col(f"t_{x}")).alias(x)
            for x in cols
        ]
    )
    merged = merged.localCheckpoint(eager=True)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy(part_col).parquet(target_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
