"""The Spark 4 Python Data Source (sources/pydatasource.py): lossless
dialect-CSV parsing, partition-per-file planning, and filter pushdown
equivalence (pushed vs Spark-evaluated results must be identical)."""

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThan,
    In,
    IsNull,
    Not,
    StringStartsWith,
)
from pyspark.sql.types import StructType

from etlalchemy_spark.sources.files import write_csv_for_bulk_load
from etlalchemy_spark.sources.pydatasource import (
    DialectCsvReader,
    register_dialect_csv,
)

from conftest import SF_DIR

TRICKY = [
    Row(id=1, s="plain", v=1.5),
    Row(id=2, s=None, v=None),  # NULL
    Row(id=3, s="", v=0.0),  # empty string — must NOT collapse to NULL
    Row(id=4, s='has "quotes" and, commas', v=-2.25),
    Row(id=5, s="embedded\nnewline\tand tab", v=3.0),
    Row(id=6, s="  padded  ", v=4.0),
    Row(id=7, s="\\N", v=5.0),  # literal backslash-N is DATA here
]
SCHEMA = "id bigint, s string, v double"


def _write(spark, df, tmp_path, name):
    path = os.path.join(str(tmp_path), name)
    write_csv_for_bulk_load(df, path, dialect="duckdb")
    return path


def test_lossless_roundtrip_null_vs_empty(spark, tmp_path):
    register_dialect_csv(spark)
    df = spark.createDataFrame(TRICKY)
    path = _write(spark, df, tmp_path, "tricky")
    back = spark.read.format("dialect_csv").schema(SCHEMA).load(path)
    got = {r.id: (r.s, r.v) for r in back.collect()}
    want = {r.id: (r.s, r.v) for r in df.collect()}
    assert got == want  # incl. None vs '' vs '\\N' all distinct


def test_partition_per_file(spark, tmp_path):
    register_dialect_csv(spark)
    df = spark.range(100).withColumn("s", F.lit("x")).withColumn("v", F.lit(1.0)).repartition(4)
    path = _write(spark, df.select(F.col("id"), "s", "v"), tmp_path, "parts")
    n_files = len([f for f in os.listdir(path) if f.startswith("part-") and f.endswith(".csv")])
    assert n_files == 4
    back = spark.read.format("dialect_csv").schema(SCHEMA).load(path)
    assert back.rdd.getNumPartitions() == n_files
    assert back.count() == 100


def test_push_filters_partitions_and_residuals(spark, tmp_path):
    register_dialect_csv(spark)
    df = spark.createDataFrame(TRICKY)
    path = _write(spark, df, tmp_path, "push")
    schema = StructType.fromDDL(SCHEMA)
    reader = DialectCsvReader(schema, {"path": path})
    supported = GreaterThan(attribute=("id",), value=2)
    nested_not = Not(EqualTo(attribute=("s",), value="plain"))
    unsupported = StringStartsWith(attribute=("s",), value="pl")
    unknown_col = EqualTo(attribute=("nope",), value=1)
    residual = list(reader.pushFilters([supported, nested_not, unsupported, unknown_col]))
    # returned BY REFERENCE, only the ones we can't evaluate
    assert residual == [unsupported, unknown_col]
    rows = [
        r
        for part in reader.partitions()
        for batch in reader.read(part)
        for r in batch.to_pylist()
    ]
    ids = sorted(r["id"] for r in rows)
    # id > 2 AND NOT s='plain' AND (s NULL rows drop under NOT — SQL semantics)
    assert ids == [3, 4, 5, 6, 7]


def test_is_null_and_in_pushdown(spark, tmp_path):
    register_dialect_csv(spark)
    df = spark.createDataFrame(TRICKY)
    path = _write(spark, df, tmp_path, "nullin")
    schema = StructType.fromDDL(SCHEMA)
    reader = DialectCsvReader(schema, {"path": path})
    assert list(reader.pushFilters([IsNull(attribute=("s",))])) == []
    rows = [
        r for p in reader.partitions() for b in reader.read(p) for r in b.to_pylist()
    ]
    assert [r["id"] for r in rows] == [2]
    reader2 = DialectCsvReader(schema, {"path": path})
    assert list(reader2.pushFilters([In(attribute=("id",), value=(1, 5))])) == []
    rows2 = [
        r for p in reader2.partitions() for b in reader2.read(p) for r in b.to_pylist()
    ]
    assert sorted(r["id"] for r in rows2) == [1, 5]


def test_pushed_read_matches_native_loader_semantics(spark, tmp_path):
    # The pushed dialect_csv scan must read the dump exactly as the
    # native duckdb loader leg does (allow_quoted_nulls=false — the
    # lossless NULL-vs-'' convention; Spark's own CSV reader cannot
    # make that distinction, which is why the custom source exists).
    # Note: a reader implementing pushFilters REQUIRES the pushdown
    # conf on — Spark 4.1 raises DATA_SOURCE_PUSHDOWN_DISABLED rather
    # than silently skipping it, so there is no unpushed fallback.
    import duckdb

    register_dialect_csv(spark)
    df = spark.createDataFrame(TRICKY)
    path = _write(spark, df, tmp_path, "onoff")
    cond = (F.col("id") > 1) & F.col("s").isNotNull()
    back = spark.read.format("dialect_csv").schema(SCHEMA).load(path)
    with_push = sorted((r.id, r.s, r.v) for r in back.where(cond).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE tt (id BIGINT, s VARCHAR, v DOUBLE)")
    for f in sorted(os.listdir(path)):
        # zero-byte files (empty partitions) are skipped, as the real
        # loader leg does (sources/bulkload.py csv_part_files)
        if (
            f.startswith("part-")
            and f.endswith(".csv")
            and os.path.getsize(os.path.join(path, f)) > 0
        ):
            con.execute(
                f"COPY tt FROM '{os.path.join(path, f)}' "
                "(FORMAT CSV, HEADER FALSE, DELIMITER ',', QUOTE '\"', "
                "ESCAPE '\"', NULLSTR '', ALLOW_QUOTED_NULLS FALSE)"
            )
    loader = con.execute("SELECT * FROM tt WHERE id > 1 AND s IS NOT NULL").fetchall()
    assert with_push == sorted(loader)
    assert [r[0] for r in with_push] == [3, 4, 5, 6, 7]


def test_schema_required(spark):
    register_dialect_csv(spark)
    with pytest.raises(Exception, match="schema"):
        spark.read.format("dialect_csv").load("/nonexistent").collect()


def test_empty_table_roundtrip(spark, tmp_path):
    register_dialect_csv(spark)
    df = spark.createDataFrame([], SCHEMA)
    path = _write(spark, df, tmp_path, "empty")
    back = spark.read.format("dialect_csv").schema(SCHEMA).load(path)
    assert back.count() == 0
    assert back.schema == StructType.fromDDL(SCHEMA)


def test_not_in_pushdown_drops_nulls_sql_semantics(spark, tmp_path):
    # `col NOT IN (...)` is NULL (row dropped) when col is NULL under
    # SQL three-valued logic; pc.is_in returns false (not null) there,
    # so a bare invert would KEEP null rows. The mask ANDs with
    # is_valid — pushed result must equal Spark's own evaluation.
    register_dialect_csv(spark)
    df = spark.createDataFrame(TRICKY)
    path = _write(spark, df, tmp_path, "notin")
    schema = StructType.fromDDL(SCHEMA)
    reader = DialectCsvReader(schema, {"path": path})
    assert list(reader.pushFilters([Not(In(attribute=("s",), value=("plain",)))])) == []
    rows = [
        r for p in reader.partitions() for b in reader.read(p) for r in b.to_pylist()
    ]
    # id=2 (s NULL) must DROP; id=3 (s='') must stay
    assert sorted(r["id"] for r in rows) == [3, 4, 5, 6, 7]
    # end-to-end: the planned pushed scan equals a non-pushed Spark filter
    back = spark.read.format("dialect_csv").schema(SCHEMA).load(path)
    got = sorted(r.id for r in back.where(~F.col("s").isin("plain")).collect())
    assert got == [3, 4, 5, 6, 7]


def test_temporal_filter_pushdown_instant_correct(spark, tmp_path):
    # Pushed timestamp comparisons must select the same INSTANTS as
    # Spark's own evaluation. PySpark hands the reader tz-naive
    # local-wall-clock literals; _normalize_temporal re-attaches the
    # local offset at push time (driver/planner process) so the Arrow
    # scalar is exact on any executor.
    import datetime

    register_dialect_csv(spark)
    rows = [
        Row(id=i, ts=datetime.datetime(2024, 3, 1, h, 30, tzinfo=datetime.timezone.utc))
        for i, h in enumerate([1, 5, 9, 13, 17])
    ]
    df = spark.createDataFrame(rows)
    path = _write(spark, df, tmp_path, "temporal")
    schema = "id bigint, ts timestamp"
    back = spark.read.format("dialect_csv").schema(schema).load(path)
    cutoff = datetime.datetime(2024, 3, 1, 9, 0)
    got = sorted(r.id for r in back.where(F.col("ts") > F.lit(cutoff)).collect())
    want = sorted(r.id for r in df.where(F.col("ts") > F.lit(cutoff)).collect())
    assert got == want == [2, 3, 4]


def test_temporal_normalization_uses_process_local_zone():
    # The naive→aware rewrite must interpret the literal in THIS
    # process's local zone (the exact inverse of how fromInternal
    # produced it) — simulated by flipping TZ around the call. It must
    # apply ONLY to TimestampType columns: a timestamp_ntz literal is a
    # wall-clock value and stays naive (ADVICE r6 — attaching the local
    # offset would shift which rows match off-UTC drivers).
    import datetime
    import os
    import time

    from pyspark.sql.datasource import GreaterThan as GT

    reader = DialectCsvReader(
        StructType.fromDDL("ts timestamp, wall timestamp_ntz"), {"path": "/dev/null"}
    )
    naive = datetime.datetime(2024, 3, 1, 12, 0)
    old = os.environ.get("TZ")
    os.environ["TZ"] = "America/New_York"
    time.tzset()
    try:
        out = reader._normalize_temporal(GT(attribute=("ts",), value=naive))
        assert out.value.utcoffset() == datetime.timedelta(hours=-5)
        assert out.value.replace(tzinfo=None) == naive
        wrapped = reader._normalize_temporal(Not(GT(attribute=("ts",), value=naive)))
        assert wrapped.child.value.utcoffset() == datetime.timedelta(hours=-5)
        # NTZ column: literal must come back untouched (still naive)
        ntz = reader._normalize_temporal(GT(attribute=("wall",), value=naive))
        assert ntz.value.tzinfo is None and ntz.value == naive
        ntz_wrapped = reader._normalize_temporal(Not(GT(attribute=("wall",), value=naive)))
        assert ntz_wrapped.child.value.tzinfo is None
    finally:
        if old is None:
            del os.environ["TZ"]
        else:
            os.environ["TZ"] = old
        time.tzset()


def test_ntz_filter_pushdown_non_utc_driver(spark, tmp_path):
    # End-to-end NTZ pushdown: with the driver in a non-UTC zone, a
    # pushed `wall > <naive literal>` over a timestamp_ntz column must
    # select the same wall-clock rows as Spark's own evaluation.
    import datetime

    register_dialect_csv(spark)
    rows = [
        Row(id=i, wall=datetime.datetime(2024, 3, 1, h, 30))
        for i, h in enumerate([1, 5, 9, 13, 17])
    ]
    schema = StructType.fromDDL("id bigint, wall timestamp_ntz")
    df = spark.createDataFrame(rows, schema)
    path = _write(spark, df, tmp_path, "ntz")
    import os
    import time

    old = os.environ.get("TZ")
    os.environ["TZ"] = "America/New_York"
    time.tzset()
    try:
        back = spark.read.format("dialect_csv").schema(schema).load(path)
        # build the NTZ literal from a STRING: a bare F.lit(datetime) is
        # TimestampType (an instant) and would coerce the comparison
        # through the session zone instead of comparing wall clocks
        cutoff = F.lit("2024-03-01 09:00:00").cast("timestamp_ntz")
        got = sorted(r.id for r in back.where(F.col("wall") > cutoff).collect())
        want = sorted(r.id for r in df.where(F.col("wall") > cutoff).collect())
        assert got == want == [2, 3, 4]
    finally:
        if old is None:
            del os.environ["TZ"]
        else:
            os.environ["TZ"] = old
        time.tzset()


def test_double_negated_in_mask_null_propagation(spark, tmp_path):
    # Not(Not(In)) must behave exactly like In under SQL 3VL: NULL rows
    # drop at any nesting depth because the In mask now propagates NULL
    # instead of special-casing one Not level (ADVICE r6).
    register_dialect_csv(spark)
    df = spark.createDataFrame(TRICKY)
    path = _write(spark, df, tmp_path, "notnotin")
    schema = StructType.fromDDL(SCHEMA)
    reader = DialectCsvReader(schema, {"path": path})
    inner = In(attribute=("s",), value=("plain",))
    assert list(reader.pushFilters([Not(Not(inner))])) == []
    rows = [
        r for p in reader.partitions() for b in reader.read(p) for r in b.to_pylist()
    ]
    # only id=1 (s='plain') matches; NULL s (id=2) must NOT reappear
    assert sorted(r["id"] for r in rows) == [1]
    # single Not still drops NULLs too (regression for the removed
    # special case)
    reader2 = DialectCsvReader(schema, {"path": path})
    assert list(reader2.pushFilters([Not(In(attribute=("s",), value=("plain",)))])) == []
    rows2 = [
        r for p in reader2.partitions() for b in reader2.read(p) for r in b.to_pylist()
    ]
    assert sorted(r["id"] for r in rows2) == [3, 4, 5, 6, 7]


def test_registration_is_per_session_boundary_pinned(spark, tmp_path):
    # Registration scoping, pinned empirically (Spark 4.1 local):
    # (a) re-registering in the SAME session is a cheap idempotent
    #     replace (the register_* helpers call it unconditionally —
    #     the old applicationId-keyed dedup cache was wrong either
    #     way), and
    # (b) a spark.newSession() can NEITHER resolve the source
    #     (DATA_SOURCE_NOT_FOUND: resolution is session-scoped) NOR
    #     re-register it (DATA_SOURCE_ALREADY_EXISTS: the exists-check
    #     consults an application-shared registry) — an upstream
    #     inconsistency, so Python data sources are single-session in
    #     this build. If a Spark upgrade fixes either leg, this test
    #     flags the boundary doc as stale.
    register_dialect_csv(spark)
    register_dialect_csv(spark)  # same-session re-register: no error
    df = spark.createDataFrame(TRICKY)
    path = _write(spark, df, tmp_path, "newsess")
    back = spark.read.format("dialect_csv").schema(SCHEMA).load(path)
    assert back.count() == len(TRICKY)
    s2 = spark.newSession()
    s2.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    with pytest.raises(Exception, match="DATA_SOURCE_NOT_FOUND"):
        s2.read.format("dialect_csv").schema(SCHEMA).load(path).count()
    with pytest.raises(Exception, match="DATA_SOURCE_ALREADY_EXISTS"):
        s2.dataSource.register(
            __import__(
                "etlalchemy_spark.sources.pydatasource", fromlist=["DialectCsvDataSource"]
            ).DialectCsvDataSource
        )


# -- streaming leg (events_replay) ----------------------------------------


def test_replay_stream_equals_batch_twin_across_batch_sizes(spark):
    # The tumbling aggregate must be independent of how the replay
    # source slices rows into micro-batches: tiny triggers (many
    # batches, 2 tasks each) and one-shot (single batch) both equal
    # the oracle-exact batch twin.
    from etlalchemy_spark.catalog import table_path
    from etlalchemy_spark.registry import all_queries
    from etlalchemy_spark.sources.pydatasource import register_events_replay
    from etlalchemy_spark.streaming.events import drain_to_memory, tumbling_counts

    register_events_replay(spark)
    twin = sorted(
        map(tuple, all_queries()["events_tumbling_1h"].fn(spark, SF_DIR).collect())
    )
    for rows_per_batch in (300, 10**9):
        ev = (
            spark.readStream.format("events_replay")
            .option("rowsperbatch", rows_per_batch)
            .option("tasksperbatch", 2)
            .load(table_path(SF_DIR, "events"))
        )
        got = sorted(map(tuple, drain_to_memory(tumbling_counts(ev), "complete").collect()))
        assert got == twin, f"rowsperbatch={rows_per_batch}"


def test_replay_offsets_partitions_cover_exactly_once(spark):
    # Offset/partition arithmetic: consecutive [start, end) ranges tile
    # the row space with no overlap and no gap, split into at most
    # tasksPerBatch non-empty sub-ranges. (spark fixture: fromDDL needs
    # an active session.)
    from etlalchemy_spark.catalog import table_path
    from etlalchemy_spark.sources.pydatasource import EventsReplayStreamReader
    from pyspark.sql.types import StructType

    schema = StructType.fromDDL("event_id bigint")
    reader = EventsReplayStreamReader(
        schema,
        {"path": table_path(SF_DIR, "events"), "rowsperbatch": 333, "tasksperbatch": 3},
    )
    assert reader.initialOffset() == {"row": 0}
    seen = []
    prev = reader.initialOffset()
    while True:
        nxt = reader.latestOffset()
        parts = reader.partitions(prev, nxt)
        if nxt["row"] == prev["row"]:
            assert parts == []
            break
        assert 1 <= len(parts) <= 3
        for p in parts:
            assert p.start < p.end
            seen.append((p.start, p.end))
        prev = nxt
    # exactly-once tiling of [0, total), total taken from the footer
    import pyarrow.parquet as pq

    expected = pq.ParquetFile(table_path(SF_DIR, "events")).metadata.num_rows
    seen.sort()
    assert seen[0][0] == 0
    assert all(a[1] == b[0] for a, b in zip(seen, seen[1:]))
    assert seen[-1][1] == reader._total == expected


def test_replay_stream_checkpoint_restart_exactly_once(spark, tmp_path):
    # The streaming half of the resilience story (batch half:
    # tests/test_migrate.py kill-and-resume): kill a running
    # events_replay query mid-stream, restart a FRESH reader from the
    # same checkpointLocation, and require (a) the final aggregate
    # equals the oracle-exact batch twin, (b) rows processed across
    # both runs sum to the fixture's row count — exactly-once, no
    # replayed rows, no cursor-reset spin through empty batches.
    import glob
    import json
    import time

    import pyarrow.parquet as pq

    from etlalchemy_spark.catalog import table_path
    from etlalchemy_spark.registry import all_queries
    from etlalchemy_spark.sources.pydatasource import register_events_replay
    from etlalchemy_spark.streaming.events import tumbling_counts

    register_events_replay(spark)
    events_path = table_path(SF_DIR, "events")
    total = pq.ParquetFile(events_path).metadata.num_rows
    ckpt = os.path.join(str(tmp_path), "ckpt")

    # 80 rows/batch over the 1000-row fixture = 13 micro-batches at a
    # 400 ms trigger (~5 s full drain): even a multi-second poll stall
    # cannot let run 1 finish before we stop it mid-stream.
    def start(name):
        ev = (
            spark.readStream.format("events_replay")
            .option("rowsperbatch", 80)
            .option("tasksperbatch", 2)
            .load(events_path)
        )
        return (
            tumbling_counts(ev)
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="400 milliseconds")
            .start()
        )

    q1 = start("restart_run1")
    deadline = time.monotonic() + 60
    while len(q1.recentProgress) < 2 and time.monotonic() < deadline:
        time.sleep(0.05)
    q1.stop()  # kill mid-stream (10 batches needed to drain 1000 rows)
    spark.catalog.dropTempView("restart_run1")
    rows1 = sum(p["numInputRows"] for p in q1.recentProgress)
    assert 0 < rows1 < total, "run 1 must stop mid-stream for the test to bite"

    q2 = start("restart_run2")
    q2.processAllAvailable()
    rows2 = sum(p["numInputRows"] for p in q2.recentProgress)
    empty = sum(1 for p in q2.recentProgress if p["numInputRows"] == 0)
    got = sorted(map(tuple, spark.table("restart_run2").collect()))
    q2.stop()
    spark.catalog.dropTempView("restart_run2")

    twin = sorted(
        map(tuple, all_queries()["events_tumbling_1h"].fn(spark, SF_DIR).collect())
    )
    assert got == twin
    # exactly-once across the restart: WAL-replayed rows count once
    # (rows1 includes only COMMITTED progress; the restarted query
    # re-runs at most the one in-flight WAL batch, which the progress
    # accounting attributes to exactly one of the two runs)
    assert rows1 + rows2 == total
    assert empty <= 1, f"cursor-reset spin: {empty} empty micro-batches after restart"
    # offsets in the checkpoint must be strictly increasing (no
    # backward latestOffset after the fresh reader's cursor reset)
    offs = sorted(
        glob.glob(os.path.join(ckpt, "offsets", "[0-9]*")),
        key=lambda f: int(os.path.basename(f)),
    )
    ends = []
    for f in offs:
        with open(f) as fh:
            ends.append(json.loads(fh.read().strip().splitlines()[-1])["row"])
    assert ends == sorted(ends) and len(set(ends)) == len(ends)
    assert ends[-1] == total
