"""Python Data Source API (Spark 4): the dialect-CSV dumps as a
first-class planned source.

The W1 sink (sources/files.py) writes loader-convention CSV; reading
those dumps back previously went through Spark's generic CSV reader
with hand-carried options. This module packages the convention as a
``spark.read.format("dialect_csv")`` source built on the Spark 4
``pyspark.sql.datasource`` API, proving the engine can host custom
Python sources with the two properties that matter at 100 TB:

- **Partition-per-file parallelism**: ``partitions()`` returns one
  ``InputPartition`` per part file, so a 10k-file dump scans on 10k
  tasks — the planner, not the source, decides placement.
- **Source-side filter pushdown** (``pushFilters``, Spark 4.1, gated
  by ``spark.sql.python.filterPushdown.enabled`` — required, see
  ``register_dialect_csv``): comparison / null / IN / NOT filters on
  top-level columns are applied INSIDE the Python worker against
  Arrow columns, so rejected rows never cross the Arrow→JVM boundary.
  Unsupported filters are returned to Spark (by reference, per the
  contract) and evaluated post-scan; the pushed scan is pinned equal
  to Spark's generic CSV reader in tests/test_pydatasource.py.

Reads are Arrow-native end to end: each partition parses its file with
``pyarrow.csv`` (typed via the user schema) and yields RecordBatches —
no Python row loop anywhere.

Parsing pins the duckdb/sqlite "lossless" conventions from
CSV_DIALECT_OPTIONS: RFC-4180 quote doubling, unquoted empty = NULL,
quoted "" = empty string (``quoted_strings_can_be_null=False``).

The module also carries the STREAMING leg of the same API:
``events_replay`` (``DataSourceStreamReader``) replays an events
parquet as deterministic row-range micro-batches with task-level
parallelism inside each batch — see EventsReplayStreamReader.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    Not,
)
from pyspark.sql.types import StructType

FORMAT_NAME = "dialect_csv"

# Literal types we can losslessly convert to an Arrow scalar of the
# column's type; anything else (e.g. Decimal) is left for Spark.
_PUSHABLE_VALUE_TYPES = (int, float, str, bool, bytes)


def _arrow_type(spark_type):
    """Spark SQL type → Arrow type for CSV column conversion."""
    import pyarrow as pa

    name = spark_type.typeName()
    mapping = {
        "byte": pa.int8(),
        "short": pa.int16(),
        "integer": pa.int32(),
        "long": pa.int64(),
        "float": pa.float32(),
        "double": pa.float64(),
        "string": pa.string(),
        "boolean": pa.bool_(),
        "date": pa.date32(),
        # tz-naive for CSV parsing; read() assume_timezone's to UTC
        # (the dialect dump renders session-UTC wall-clock text).
        "timestamp": pa.timestamp("us"),
        "timestamp_ntz": pa.timestamp("us"),
        "binary": pa.binary(),
    }
    if name == "decimal":
        return pa.decimal128(spark_type.precision, spark_type.scale)
    if name not in mapping:
        raise ValueError(f"dialect_csv: unsupported column type {spark_type.simpleString()}")
    return mapping[name]


@dataclass
class _FilePartition(InputPartition):
    path: str


class DialectCsvReader(DataSourceReader):
    def __init__(self, schema: StructType, options) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("dialect_csv requires a path (option or load(path))")
        self._dir = path
        self._schema = schema
        self._pushed: list[Filter] = []

    # -- planning ---------------------------------------------------------

    def pushFilters(self, filters: list[Filter]) -> list[Filter]:
        """Keep the filters we can evaluate on Arrow columns; everything
        else goes back to Spark (must be the input objects by reference).
        Partitioned EAGERLY: a lazy generator would only populate
        self._pushed as Spark drains it, racing the pickling of self
        for read() — the contract allows mutating self, so mutate it
        before returning.

        Accepted temporal literals are normalized HERE (driver/planner
        process), not at mask time: PySpark materializes TimestampType
        filter values via ``fromInternal`` as tz-NAIVE datetimes in this
        process's LOCAL time, so the instant is only recoverable in the
        same process — ``_normalize_temporal`` re-attaches the local
        offset before the filter is pickled to executors (whose local
        zone may differ)."""
        names = {f.name for f in self._schema.fields}
        residual = []
        for f in filters:
            if self._supported(f, names):
                self._pushed.append(self._normalize_temporal(f))
            else:
                residual.append(f)
        return residual

    def _normalize_temporal(self, f: Filter) -> Filter:
        """Rewrite naive-datetime comparison literals to aware (local
        offset → exact instant); non-temporal filters pass through
        unchanged. ``fromtimestamp``'s naive result is this process's
        wall clock, so ``astimezone()`` (which assumes local for naive
        input) is the exact inverse — but ONLY for TimestampType
        columns, whose literals encode an instant. A timestamp_ntz
        column's literal IS a wall-clock value and must stay naive:
        attaching the driver's local offset would shift which rows
        match whenever the driver zone isn't UTC (ADVICE r6)."""
        import dataclasses
        import datetime

        if isinstance(f, Not):
            child = self._normalize_temporal(f.child)
            return f if child is f.child else Not(child)
        v = getattr(f, "value", None)
        if isinstance(v, datetime.datetime) and v.tzinfo is None:
            attr = getattr(f, "attribute", None)
            if attr and len(attr) == 1:
                fld = next(
                    (x for x in self._schema.fields if x.name == attr[0]), None
                )
                if fld is not None and fld.dataType.typeName() != "timestamp":
                    return f  # timestamp_ntz / date-typed: wall-clock, stays naive
            return dataclasses.replace(f, value=v.astimezone())
        return f

    def _supported(self, f: Filter, names: set[str]) -> bool:
        if isinstance(f, Not):
            return self._supported(f.child, names)
        if isinstance(f, (IsNull, IsNotNull)):
            return len(f.attribute) == 1 and f.attribute[0] in names
        if isinstance(f, (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)):
            return (
                len(f.attribute) == 1
                and f.attribute[0] in names
                and isinstance(f.value, _PUSHABLE_VALUE_TYPES + (type(None),))
                or self._is_temporal_literal(f, names)
            )
        if isinstance(f, In):
            return (
                len(f.attribute) == 1
                and f.attribute[0] in names
                and all(isinstance(v, _PUSHABLE_VALUE_TYPES) for v in f.value)
            )
        return False

    @staticmethod
    def _is_temporal_literal(f, names: set[str]) -> bool:
        import datetime

        return (
            len(f.attribute) == 1
            and f.attribute[0] in names
            and isinstance(f.value, (datetime.date, datetime.datetime))
        )

    def partitions(self) -> list[_FilePartition]:
        files = sorted(
            os.path.join(self._dir, n)
            for n in os.listdir(self._dir)
            if n.startswith("part-") and n.endswith(".csv") and not n.endswith(".crc")
        )
        # Zero data files (empty source table): one empty partition so
        # read() still yields a schema-correct empty batch.
        return [_FilePartition(p) for p in files] or [_FilePartition("")]

    # -- execution (runs on executors; self must stay picklable) ----------

    def read(self, partition: _FilePartition):
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.csv as pacsv

        arrow_schema = pa.schema(
            [(f.name, _arrow_type(f.dataType)) for f in self._schema.fields]
        )
        # Spark's TimestampType is tz-aware; the dump renders session-UTC
        # wall-clock text, so parse naive then pin the zone.
        tz_fields = [
            i
            for i, f in enumerate(self._schema.fields)
            if f.dataType.typeName() == "timestamp"
        ]
        final_schema = arrow_schema
        for i in tz_fields:
            final_schema = final_schema.set(
                i, pa.field(arrow_schema.names[i], pa.timestamp("us", tz="UTC"))
            )
        if not partition.path or os.path.getsize(partition.path) == 0:
            yield pa.RecordBatch.from_pydict({n: [] for n in final_schema.names}, final_schema)
            return
        table = pacsv.read_csv(
            partition.path,
            read_options=pacsv.ReadOptions(column_names=arrow_schema.names),
            # duckdb/sqlite lossless conventions (CSV_DIALECT_OPTIONS):
            # RFC-4180 doubling, no backslash escape
            parse_options=pacsv.ParseOptions(
                delimiter=",",
                quote_char='"',
                double_quote=True,
                escape_char=False,
                newlines_in_values=True,  # quoted embedded \n is legal
            ),
            convert_options=pacsv.ConvertOptions(
                column_types={n: arrow_schema.field(n).type for n in arrow_schema.names},
                null_values=[""],
                strings_can_be_null=True,
                quoted_strings_can_be_null=False,  # quoted "" stays ''
            ),
        )
        for i in tz_fields:
            table = table.set_column(
                i,
                final_schema.field(i),
                pc.assume_timezone(table.column(i), "UTC"),
            )
        for f in self._pushed:
            mask = self._mask(table, f)
            table = table.filter(mask)  # nulls drop — SQL WHERE semantics
        yield from table.to_batches()

    def _mask(self, table, f: Filter):
        import pyarrow as pa
        import pyarrow.compute as pc

        if isinstance(f, Not):
            # Safe for any nesting depth because every child mask below
            # propagates NULL for NULL inputs (invert(null) = null), so
            # the final table.filter drops the row per SQL 3VL.
            return pc.invert(self._mask(table, f.child))
        col = table.column(f.attribute[0])
        if isinstance(f, IsNull):
            return pc.is_null(col)
        if isinstance(f, IsNotNull):
            return pc.is_valid(col)
        if isinstance(f, In):
            # pc.is_in yields non-null false for a NULL input, but SQL
            # `col IN (...)` is NULL there — re-inject the null so any
            # nesting of Not (`NOT IN`, `NOT NOT IN`, …) inverts
            # correctly instead of special-casing one level (ADVICE r6).
            member = pc.is_in(col, value_set=pa.array(list(f.value), col.type))
            return pc.if_else(pc.is_valid(col), member, pa.scalar(None, pa.bool_()))
        lit = pa.scalar(f.value, col.type)
        ops = {
            EqualTo: pc.equal,
            GreaterThan: pc.greater,
            GreaterThanOrEqual: pc.greater_equal,
            LessThan: pc.less,
            LessThanOrEqual: pc.less_equal,
        }
        return ops[type(f)](col, lit)


class DialectCsvDataSource(DataSource):
    """``spark.read.format("dialect_csv").schema(...).load(dir)`` over a
    W1 dump directory (duckdb/sqlite lossless conventions)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        raise ValueError(
            "dialect_csv has no embedded schema — pass one with .schema(...) "
            "(inference would cost a full extra pass at scale)"
        )

    def reader(self, schema: StructType) -> DialectCsvReader:
        return DialectCsvReader(schema, self.options)


def register_dialect_csv(spark) -> None:
    """Register the source with this session and enable Python-source
    filter pushdown (a runtime conf). The conf is REQUIRED, not
    advisory: Spark 4.1 refuses to plan a reader that implements
    pushFilters while it is off (DATA_SOURCE_PUSHDOWN_DISABLED) — there
    is no silent unpushed fallback, so a failed set here surfaces
    loudly at first read.

    Registration is unconditional: same-session re-registration is a
    cheap idempotent replace, so a dedup cache buys nothing and an
    applicationId-keyed one is actively wrong. Boundary (pinned in
    tests/test_pydatasource.py): in Spark 4.1 a ``spark.newSession()``
    can neither resolve a Python source (resolution is session-scoped)
    nor re-register it (the exists-check consults an application-shared
    registry) — Python data sources are single-session in this build."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(DialectCsvDataSource)


# ---------------------------------------------------------------------------
# Streaming leg: deterministic replay of an events parquet as micro-batches
# ---------------------------------------------------------------------------

STREAM_FORMAT_NAME = "events_replay"

EVENTS_DDL = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)


@dataclass
class _RowRangePartition(InputPartition):
    start: int
    end: int


class EventsReplayStreamReader(DataSourceStreamReader):
    """Partitioned streaming reader (``DataSourceStreamReader``, not the
    driver-only Simple variant): offsets are ROW positions into the
    ordered parquet file list; each trigger advances the cursor by
    ``rowsPerBatch`` rows and ``partitions(start, end)`` splits the
    range into ``tasksPerBatch`` contiguous sub-ranges — one Spark task
    each, so a micro-batch scans in parallel. Planning touches only
    footer metadata (num_rows per file); no data is read on the driver.

    At fixture scale ``read`` slices whole-file Arrow reads; at 100 TB
    the same offset model maps ranges onto file/row-group boundaries so
    each task reads only its row groups — the planner already tracks
    per-file row spans to make that split."""

    def __init__(self, schema: StructType, options) -> None:
        import pyarrow.parquet as pq

        path = options.get("path")
        if not path:
            raise ValueError("events_replay requires a path (option or load(path))")
        self._rows_per_batch = int(options.get("rowsperbatch", 4000))
        self._tasks_per_batch = max(1, int(options.get("tasksperbatch", 2)))
        if os.path.isdir(path):
            files = sorted(
                os.path.join(path, n)
                for n in os.listdir(path)
                if n.endswith(".parquet")
            )
        else:
            files = [path]
        spans = []  # (file, first_row, last_row_exclusive)
        total = 0
        for f in files:
            n = pq.ParquetFile(f).metadata.num_rows
            spans.append((f, total, total + n))
            total += n
        self._spans = spans
        self._total = total
        self._cursor = 0

    # -- offset management (driver) ---------------------------------------

    def initialOffset(self) -> dict:
        return {"row": 0}

    def latestOffset(self) -> dict:
        self._cursor = min(self._cursor + self._rows_per_batch, self._total)
        return {"row": self._cursor}

    def partitions(self, start: dict, end: dict):
        s, e = int(start["row"]), int(end["row"])
        # Checkpoint-restart resync: a fresh reader starts with
        # _cursor = 0, but Spark replans from the CHECKPOINTED offsets —
        # the first partitions()/commit() call after a restart carries
        # the committed position, so fast-forward the replay cursor to
        # it instead of spinning through already-replayed rows (the
        # in-memory cursor is pacing state, not source of truth; the
        # checkpoint is).
        self._cursor = max(self._cursor, s, e)
        if s >= e:
            return []
        n = min(self._tasks_per_batch, e - s)
        step = (e - s + n - 1) // n
        return [_RowRangePartition(i, min(i + step, e)) for i in range(s, e, step)]

    def commit(self, end: dict) -> None:
        # nothing to release (replay source) — but keep the pacing
        # cursor monotone with the committed offset (restart resync).
        self._cursor = max(self._cursor, int(end["row"]))

    # -- execution (executors) --------------------------------------------

    def read(self, partition: _RowRangePartition):
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        for f, first, last in self._spans:
            lo, hi = max(partition.start, first), min(partition.end, last)
            if lo >= hi:
                continue
            table = pq.read_table(f, memory_map=True).slice(lo - first, hi - lo)
            ts = table.column("ts")
            if pa.types.is_timestamp(ts.type) and ts.type.tz is None:
                # nanos fixtures truncate to µs (the catalog's scan-time
                # convention), then pin the UTC zone Spark expects
                ts = pc.assume_timezone(ts.cast(pa.timestamp("us")), "UTC")
                table = table.set_column(
                    table.schema.get_field_index("ts"),
                    pa.field("ts", ts.type),
                    ts,
                )
            yield from table.to_batches()


class EventsReplayDataSource(DataSource):
    """``spark.readStream.format("events_replay").load(path)`` — the
    events fixture replayed as a deterministic micro-batch stream."""

    @classmethod
    def name(cls) -> str:
        return STREAM_FORMAT_NAME

    def schema(self) -> str:
        return EVENTS_DDL

    def streamReader(self, schema: StructType) -> EventsReplayStreamReader:
        return EventsReplayStreamReader(schema, self.options)


def register_events_replay(spark) -> None:
    """Register the streaming source with this session (unconditional —
    session-scoped registry, see register_dialect_csv)."""
    spark.dataSource.register(EventsReplayDataSource)
