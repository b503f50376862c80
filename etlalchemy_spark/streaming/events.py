"""Streaming readers and windowed aggregations over the events fixture.

The parquet fixture drives a real ``readStream`` (file source) whose
results are drained synchronously into a memory sink — the documented
local-smoke pattern; on a cluster the same plans attach to Kafka/files
with checkpointing and triggers.

``ts`` normalizes to session-UTC TIMESTAMP whatever the fixture's
physical type (nanos-as-long → µs floor-divide; micros NTZ → cast),
identical to the batch catalog.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etlalchemy_spark.catalog import normalize_event_time, table_path


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet with the batch schema. The
    fixture may be a single file (stream the parent dir with a glob
    pinned to the leaf name) or a Spark-written DIRECTORY of part
    files (stream the directory itself — pathGlobFilter matches leaf
    FILE names, so the single-file glob would silently match nothing
    and every query would drain 0 rows)."""
    path = table_path(sf_dir, "events")
    batch_schema = spark.read.parquet(path).schema
    if os.path.isdir(path):
        raw = spark.readStream.schema(batch_schema).parquet(path)
    else:
        raw = (
            spark.readStream.schema(batch_schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    # the catalog's event-time physical-type guard, shared verbatim
    return normalize_event_time(raw, "events")


def drain_to_memory(
    stream_df: DataFrame, output_mode: str, state_partitions: int = 8
) -> DataFrame:
    """Run the streaming query to completion against the (already
    complete) file source and return the materialized result.

    ``state_partitions`` pins ``spark.sql.shuffle.partitions`` for the
    query's lifetime (streaming state partitioning is frozen at query
    START from that conf, one state-store instance per partition per
    micro-batch): the drained aggregates here hold at most a few
    thousand state rows, so the batch default of 32 paid 32 store
    open/commit/maintenance cycles per trigger for no parallelism win
    — size state partitioning to STATE VOLUME, not to the batch
    shuffle width (on a cluster the same knob is set per-query before
    ``start()``; results are partition-count-invariant). The conf is
    restored after the drain so batch plans are untouched.

    The memory-sink table is materialized (eager localCheckpoint) and
    its temp view dropped before returning: memory-sink tables are
    driver-pinned for the session's lifetime with no reclaim path, so
    the old keep-the-view approach leaked one full result copy per
    drain; checkpointed RDD blocks are reclaimed by the ContextCleaner
    when the returned DataFrame is garbage-collected."""
    spark = stream_df.sparkSession
    name = f"mem_{uuid.uuid4().hex[:12]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            stream_df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    out = spark.table(name).localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    return out


def tumbling_counts(events: DataFrame) -> DataFrame:
    """1-hour tumbling windows with a 1-hour watermark: late events
    beyond the watermark would be dropped; on the complete fixture every
    event lands in exactly one window."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("decimal(38,4)")
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_counts(events: DataFrame) -> DataFrame:
    """1-hour windows sliding every 15 minutes (each event in 4)."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n",
        )
    )


def session_windows(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user session windows (gap-based), the streaming-native form
    of the gaps-and-islands batch sessionization."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_within_watermark(events: DataFrame) -> DataFrame:
    """Streaming exact dedup on event_id bounded by the watermark —
    state stays finite at unbounded input (the scale-correct streaming
    dedup; plain dropDuplicates would grow state forever)."""
    return events.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def drain_foreach_batch(stream_df: DataFrame, sink_path: str) -> None:
    """foreachBatch sink: each micro-batch lands as its own parquet
    subdirectory (append-only upsert pattern). On a cluster this is the
    bridge to any batch-only writer — JDBC MERGE, Delta upsert, a
    dialect bulk loader — with exactly-once per batch via the
    (batch_id, checkpoint) pair — PROVIDED the caller supplies a
    checkpointLocation and an idempotent-per-batch writer; this local
    demo runs checkpoint-less and append-only (at-least-once)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(sink_path)
        )

    q = stream_df.writeStream.foreachBatch(write_batch).outputMode("update").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def stream_stream_join(left: DataFrame, right: DataFrame) -> DataFrame:
    """Watermarked stream-stream inner join: each 'click' matches
    'view' events by the same user within the following hour. Both
    sides carry watermarks + the time-range predicate, so state for
    expired rows is dropped — bounded memory at unbounded input."""
    clicks = (
        left.where(F.col("event_type") == "click")
        .withWatermark("ts", "1 hour")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("c_event"),
        )
    )
    views = (
        right.where(F.col("event_type") == "view")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
            F.col("event_id").alias("v_event"),
        )
    )
    return clicks.join(
        views,
        (F.col("c_user") == F.col("v_user"))
        & (F.col("v_ts") >= F.col("c_ts"))
        & (F.col("v_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
    )


def static_enrich_counts(events: DataFrame, customer: DataFrame, nation: DataFrame) -> DataFrame:
    """Stream-static enrichment: join the (unbounded) event stream with
    bounded dimension tables — the static side broadcasts per
    micro-batch, no stream-side state. Aggregates to (nation,
    event_type) counts under a watermark."""
    dim = customer.join(
        nation, customer.c_nationkey == nation.n_nationkey
    ).select(F.col("c_custkey").alias("user_id"), F.col("n_name").alias("nation"))
    return (
        events.withWatermark("ts", "1 hour")
        .join(F.broadcast(dim), "user_id")
        .groupBy("nation", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
