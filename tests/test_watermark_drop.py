"""Watermark late-data semantics, proven against REAL multi-batch
arrival: every committed streaming query in the suite drains its
complete file source where nothing is ever late, so nothing exercised
the drop path. This test feeds three files in forced mtime order —
fresh rows (hour 10), a flush row (hour 13) that advances the
watermark to 12:00, then a file of hour-0 stragglers — and pins the
measured Spark 4.1 semantics:

- the stragglers' window (end 01:00 << watermark 12:00) is filtered at
  the pre-shuffle partial aggregate; `numRowsDroppedByWatermark`
  counts the dropped STATE ROW (the window group), not input rows;
- the hour-0 window never reaches the append output;
- the finalized hour-10 window emits once the watermark passes its
  end.

(Measured boundary, also pinned: a late row whose window was never
evicted in an earlier batch can still be aggregated-then-finalized in
the same batch — so correctness reasoning must use windows, not raw
row timestamps. The scenario here is the unambiguous one.)"""

import datetime
import glob
import os
import shutil
import time

from pyspark.sql import functions as F


def test_late_window_dropped_and_counted(spark, tmp_path):
    base = datetime.datetime(2024, 3, 1, 0, 0, tzinfo=datetime.timezone.utc)
    fresh = [(i, base + datetime.timedelta(hours=10, minutes=i), "a") for i in range(20)]
    flush = [(200, base + datetime.timedelta(hours=13), "a")]
    late = [(100 + i, base + datetime.timedelta(minutes=i), "a") for i in range(5)]
    schema = "event_id long, ts timestamp, event_type string"

    ingest = str(tmp_path / "ingest")
    os.makedirs(ingest)
    now = time.time()
    for i, rows in enumerate((fresh, flush, late)):
        d = str(tmp_path / f"f{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(d)
        p = os.path.join(ingest, f"batch{i}.parquet")
        shutil.copy(glob.glob(os.path.join(d, "part-*.parquet"))[0], p)
        # file-source ordering is (mtime, path): force strict arrival order
        os.utime(p, (now - 100 + i * 50, now - 100 + i * 50))

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(ingest)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_drop_test")
        .start()
    )
    try:
        q.processAllAvailable()
        progresses = list(q.recentProgress)
    finally:
        q.stop()
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in progresses
        for op in p["stateOperators"]
    )
    got = sorted(
        (r["w"]["start"].hour, r["n"]) for r in spark.table("wm_drop_test").collect()
    )
    spark.catalog.dropTempView("wm_drop_test")
    assert dropped >= 1, f"late window not counted as dropped: {dropped}"
    assert all(h != 0 for h, _ in got), f"late window leaked into output: {got}"
    assert (10, 20) in got, got
