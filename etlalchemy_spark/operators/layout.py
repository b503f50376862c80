"""Data-layout operators: z-order clustering for lake writes.

The reference re-creates secondary indexes after load (SURVEY.md Table
A, op M1). Data lakes have no indexes; the moral equivalent is LAYOUT —
write files so that min/max footer stats prune scans on multiple
columns at once. Z-ordering interleaves the bits of two key columns so
range-partitioning on the composite value co-locates rows that are
close in EITHER dimension; a scan filtered on either column then skips
most files on footer stats alone.

The interleave is a pure bit expression (whole-stage codegen, no UDF),
and the clustered write is repartitionByRange + sortWithinPartitions —
one shuffle, the same cost as any sorted write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton interleave of the low ``bits`` of two non-negative int
    columns: z = ... y1 x1 y0 x0. Unrolled literal shifts — stays in
    codegen, portable to any SQL engine."""
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x.cast("bigint"), i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(
                F.shiftright(y.cast("bigint"), i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int = 8,
    bits: int = 16,
    fmt: str = "parquet",
) -> None:
    """Cluster ``df`` by z-order of (x_col, y_col) into ``n_files``
    range-partitioned, internally sorted files. Footer min/max on BOTH
    columns become selective → multi-column scan pruning without an
    index."""
    z = zorder_value(F.col(x_col), F.col(y_col), bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .format(fmt)
        .save(path)
    )


def compact_small_files(
    spark,
    src_path: str,
    dst_path: str,
    target_bytes: int = 128 * 1024 * 1024,
    order_col: str | None = None,
) -> int:
    """Small-file compaction — the lake-maintenance half of the layout
    story (zorder_write is the clustering half). A streaming/CDC sink
    leaves thousands of KB-sized files; scans then pay per-file open +
    footer + scheduling overhead instead of sequential column reads.
    Compaction sizes the output from the OBSERVED byte total:
    ``n = ceil(total_bytes / target_bytes)`` files (the driver reads
    only directory metadata to decide), rewritten in one distributed
    pass — ``repartitionByRange(order_col)`` when an ordering column is
    given (keeps min/max footer pruning selective after compaction),
    plain round-robin ``repartition`` otherwise. Returns n. At 100 TB
    this runs per-partition-directory on a schedule, never over the
    whole table at once."""
    import math
    import os

    total = sum(
        e.stat().st_size
        for e in os.scandir(src_path)
        if e.name.endswith(".parquet") and e.is_file()
    )
    n = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(src_path)
    if order_col is not None:
        out = df.repartitionByRange(n, order_col).sortWithinPartitions(order_col)
    else:
        out = df.repartition(n)
    out.write.mode("overwrite").parquet(dst_path)
    return n


def swap_directory(spark, live_path: str, tmp_path: str) -> None:
    """Crash-safe(ish) directory replacement shared by the store
    compaction ops (r8 review): the old delete-then-rename order could
    crash between the two calls and leave NO store — readers silently
    saw an empty/partial store and produced wrong results with no
    error. Protocol here:

    1. rename live → live__precompact   (one atomic FS rename)
    2. rename tmp  → live               (one atomic FS rename; on
       failure, roll 1 back and raise)
    3. delete live__precompact

    Every Hadoop ``FileSystem.rename`` result is CHECKED (it reports
    most failures by returning false, not raising). A crash between 1
    and 2 leaves the store absent at ``live_path`` but fully intact at
    ``live_path__precompact`` — readers fail LOUDLY on the missing
    path instead of silently reading truncated data, and recovery is
    one rename back. True multi-object atomicity needs a table format
    with a commit protocol (README "Honest boundaries"); this is the
    strongest ordering plain directories support."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    Path = jvm.org.apache.hadoop.fs.Path
    live, tmp = Path(live_path), Path(tmp_path)
    aside = Path(live_path.rstrip("/") + "__precompact")
    fs = live.getFileSystem(hconf)
    if fs.exists(aside):
        raise ValueError(
            f"{aside} already exists — a previous compaction crashed "
            "mid-swap; recover (rename it back or delete it) first"
        )
    if not fs.rename(live, aside):
        raise IOError(f"could not rename {live} aside to {aside}")
    if not fs.rename(tmp, live):
        fs.rename(aside, live)  # roll back; best effort
        raise IOError(f"could not rename {tmp} into place at {live}")
    fs.delete(aside, True)
