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
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
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

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Keep the filters we can evaluate on Arrow columns; everything
        else goes back to Spark (must be the input objects by reference)."""
        names = {f.name for f in self._schema.fields}
        for f in filters:
            if self._supported(f, names):
                self._pushed.append(f)
            else:
                yield f

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
            return pc.invert(self._mask(table, f.child))
        col = table.column(f.attribute[0])
        if isinstance(f, IsNull):
            return pc.is_null(col)
        if isinstance(f, IsNotNull):
            return pc.is_valid(col)
        if isinstance(f, In):
            return pc.is_in(col, value_set=pa.array(list(f.value), col.type))
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


_REGISTERED: set[str] = set()


def register_dialect_csv(spark) -> None:
    """Idempotently register the source with this session and enable
    Python-source filter pushdown (a runtime conf). The conf is
    REQUIRED, not advisory: Spark 4.1 refuses to plan a reader that
    implements pushFilters while it is off
    (DATA_SOURCE_PUSHDOWN_DISABLED) — there is no silent unpushed
    fallback, so a failed set here surfaces loudly at first read."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    key = spark.sparkContext.applicationId
    if key in _REGISTERED:
        return
    spark.dataSource.register(DialectCsvDataSource)
    _REGISTERED.add(key)
