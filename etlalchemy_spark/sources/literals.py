"""W2 — dialect-specific SQL-INSERT serialization of rows.

Reference parity: ``literal_value_generator.py ≈L20–250, upstream``
(``generate_literal_value``, ``dump_to_sql_file``,
``dump_to_oracle_insert_statements``) — the path etlalchemy uses when a
destination has no native bulk-CSV loader: every row becomes a SQL
literal tuple and the file of INSERT statements is replayed by the
destination CLI.

Spark-first re-expression: the entire literal rendering is a column
expression (``format_number``/``date_format``/``regexp_replace``/
``concat``) — one narrow projection, whole-stage-codegen'd, zero Python
in the row path, writable with ``df.write.text`` at any scale. Row
batching into multi-row INSERTs is deliberately NOT done here: at 100 TB
the batching that matters happens in the destination loader (JDBC
``rewriteBatchedStatements``), not in the file layout, and a
shuffle-free per-row projection keeps the sink embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_DIALECTS = ("postgresql", "mysql", "sqlite", "oracle", "mssql")


def _escaped(c: Column, dialect: str) -> Column:
    """SQL string literal: double embedded single quotes; MySQL also
    doubles backslashes (its default NO_BACKSLASH_ESCAPES=off parses
    backslash escapes — upstream strips them the same way)."""
    s = F.regexp_replace(c, "'", "''")
    if dialect == "mysql":
        s = F.regexp_replace(s, r"\\", r"\\\\")
    return F.concat(F.lit("'"), s, F.lit("'"))


def _ts_literal(c: Column, dialect: str) -> Column:
    iso = F.date_format(c, "yyyy-MM-dd HH:mm:ss")
    if dialect == "oracle":
        return F.concat(
            F.lit("TO_DATE('"), iso, F.lit("','YYYY-MM-DD HH24:MI:SS')")
        )
    if dialect == "mssql":
        return F.concat(F.lit("CONVERT(DATETIME,'"), iso, F.lit("')"))
    return F.concat(F.lit("'"), iso, F.lit("'"))


def _bool_literal(c: Column, dialect: str) -> Column:
    if dialect in ("mysql", "mssql", "sqlite", "oracle"):
        return F.when(c, F.lit("1")).otherwise(F.lit("0"))
    return F.when(c, F.lit("TRUE")).otherwise(F.lit("FALSE"))


def _bin_literal(c: Column, dialect: str) -> Column:
    hx = F.lower(F.hex(c))
    if dialect == "postgresql":
        return F.concat(F.lit("'\\x"), hx, F.lit("'"))
    if dialect in ("mysql", "mssql"):
        return F.concat(F.lit("0x"), hx)
    return F.concat(F.lit("X'"), hx, F.lit("'"))  # sqlite/oracle-ish


def literal_column(field: T.StructField, dialect: str) -> Column:
    """Render one column as its dialect SQL literal (string column).

    NULL in any type renders as the keyword ``NULL`` (upstream
    ``generate_literal_value`` with value=None).
    """
    c = F.col(field.name)
    dt = field.dataType
    if isinstance(dt, T.StringType):
        lit = _escaped(c, dialect)
    elif isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        lit = _ts_literal(c, dialect)
    elif isinstance(dt, T.DateType):
        lit = _ts_literal(c.cast("timestamp"), dialect)
    elif isinstance(dt, T.BooleanType):
        lit = _bool_literal(c, dialect)
    elif isinstance(dt, T.BinaryType):
        lit = _bin_literal(c, dialect)
    else:
        # ints/decimals render identically everywhere; doubles go
        # through a decimal rescale upstream of this sink when exact
        # text is required (engines differ in shortest-round-trip
        # float formatting).
        lit = c.cast("string")
    return F.when(c.isNull(), F.lit("NULL")).otherwise(lit)


def insert_statement(df: DataFrame, table: str, dialect: str = "postgresql") -> Column:
    """One ``INSERT INTO t (cols) VALUES (...);`` statement per row, as
    a single string column named ``stmt``."""
    if dialect not in _DIALECTS:
        raise ValueError(f"unknown dialect {dialect!r}; expected one of {_DIALECTS}")
    cols = ", ".join(f.name for f in df.schema.fields)
    # ';' terminates statements in every target CLI including sqlplus;
    # a terminator-less Oracle dump could not be replayed at all
    tail = ");"
    values = []
    for i, f in enumerate(df.schema.fields):
        if i:
            values.append(F.lit(", "))
        values.append(literal_column(f, dialect))
    return F.concat(
        F.lit(f"INSERT INTO {table} ({cols}) VALUES ("), *values, F.lit(tail)
    ).alias("stmt")


def dump_to_sql_files(
    df: DataFrame, path: str, table: str, dialect: str = "postgresql"
) -> None:
    """Write the table as partitioned ``.sql`` files of INSERT
    statements (upstream ``dump_to_sql_file``). Each Spark partition
    writes its own file — the replay side can load them in parallel."""
    df.select(insert_statement(df, table, dialect)).write.mode("overwrite").text(path)
