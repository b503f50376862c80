"""W3: native bulk-load execution — the reference's core perf idea.

Upstream ``ETLAlchemySource.send_data`` (≈L750–850, SURVEY.md §0
caveat) shells out to each DBMS's native bulk path (MySQL ``LOAD DATA
LOCAL INFILE``, Postgres ``COPY FROM``, SQL Server ``bcp``, Oracle
``sqlldr``) instead of row INSERTs — a 10–100× load speedup. The
Spark-first re-expression:

1. ``write_csv_for_bulk_load`` (sources/files.py) emits the dialect's
   CSV conventions ONE FILE PER PARTITION — at cluster scale every
   partition file feeds a parallel loader invocation instead of the
   reference's single serialized dump.
2. ``bulk_load_statements`` renders the per-file native bulk statement
   for the destination dialect (pure string generation — auditable,
   and exactly what a deployment issues through its DB connection).
3. ``bulk_load_duckdb`` EXECUTES the path end-to-end against an
   embedded DuckDB database (the only DBMS with a native ``COPY FROM``
   available in this sandbox): create table → one ``COPY table FROM
   file`` per partition file → row-count audit. Postgres/MySQL legs
   run the same two phases with their statements from (2) through any
   DBAPI/JDBC connection — only statement execution differs.

Scale note: the COPY statements per file are independent — a real
deployment fans them out (one loader session per partition file, as
``mysqlimport --use-threads`` does); the embedded executor here runs
them serially through one connection, which is the sandbox-local
equivalent, not a design limit.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame

from etlalchemy_spark.sources.files import CSV_DIALECT_OPTIONS, write_csv_for_bulk_load

# Spark simpleString → destination column type for CREATE TABLE before
# bulk load (schema fidelity beyond this — downsized ints, VARCHAR(n) —
# comes from operators/ddl.create_table_ddl when standardizer decisions
# are available).
_BULK_DDL_TYPES: dict[str, dict[str, str]] = {
    "duckdb": {
        "tinyint": "TINYINT",
        "smallint": "SMALLINT",
        "int": "INTEGER",
        "bigint": "BIGINT",
        "boolean": "BOOLEAN",
        "float": "REAL",
        "double": "DOUBLE",
        "string": "VARCHAR",
        "timestamp": "TIMESTAMP",
        "timestamp_ntz": "TIMESTAMP",
        "date": "DATE",
        "binary": "BLOB",
    },
    "postgresql": {
        "tinyint": "SMALLINT",
        "smallint": "SMALLINT",
        "int": "INTEGER",
        "bigint": "BIGINT",
        "boolean": "BOOLEAN",
        "float": "REAL",
        "double": "DOUBLE PRECISION",
        "string": "TEXT",
        "timestamp": "TIMESTAMP",
        "timestamp_ntz": "TIMESTAMP",
        "date": "DATE",
        "binary": "BYTEA",
    },
    "mysql": {
        "tinyint": "TINYINT",
        "smallint": "SMALLINT",
        "int": "INT",
        "bigint": "BIGINT",
        "boolean": "TINYINT(1)",
        "float": "FLOAT",
        "double": "DOUBLE",
        "string": "TEXT",
        "timestamp": "DATETIME(6)",
        "timestamp_ntz": "DATETIME(6)",
        "date": "DATE",
        "binary": "BLOB",
    },
    "mssql": {
        "tinyint": "TINYINT",
        "smallint": "SMALLINT",
        "int": "INT",
        "bigint": "BIGINT",
        "boolean": "BIT",
        "float": "REAL",
        "double": "FLOAT",
        "string": "NVARCHAR(MAX)",
        "timestamp": "DATETIME2(6)",
        "timestamp_ntz": "DATETIME2(6)",
        "date": "DATE",
        "binary": "VARBINARY(MAX)",
    },
    "oracle": {
        "tinyint": "NUMBER(3)",
        "smallint": "NUMBER(5)",
        "int": "NUMBER(10)",
        "bigint": "NUMBER(19)",
        "boolean": "NUMBER(1)",
        "float": "BINARY_FLOAT",
        "double": "BINARY_DOUBLE",
        "string": "CLOB",
        "timestamp": "TIMESTAMP(6)",
        "timestamp_ntz": "TIMESTAMP(6)",
        "date": "DATE",
        "binary": "BLOB",
    },
    # SQLite columns are affinity-typed; timestamps/dates/decimals are
    # stored as TEXT (ISO-8601 / decimal strings) and re-typed on
    # export — the lossless choice, since NUMERIC affinity would
    # coerce them through float.
    "sqlite": {
        "tinyint": "INTEGER",
        "smallint": "INTEGER",
        "int": "INTEGER",
        "bigint": "INTEGER",
        "boolean": "INTEGER",
        "float": "REAL",
        "double": "REAL",
        "string": "TEXT",
        "timestamp": "TEXT",
        "timestamp_ntz": "TEXT",
        "date": "TEXT",
        "binary": "BLOB",
    },
}


def _quote_ident(name: str, dialect: str) -> str:
    # double any embedded quote char: an identifier containing the
    # quote must not break (or inject into) the generated statement
    if dialect == "mysql":
        return "`" + name.replace("`", "``") + "`"
    return '"' + name.replace('"', '""') + '"'


def _sql_path(path: str) -> str:
    """File path as a SQL single-quoted literal body (quotes doubled)."""
    return path.replace("'", "''")


def schema_ddl(df: DataFrame, table: str, dialect: str = "duckdb") -> str:
    """``CREATE TABLE`` straight from the DataFrame schema (the
    pre-load half of upstream ``Table.create``, W4)."""
    tmap = _BULK_DDL_TYPES[dialect]
    cols = []
    for f in df.schema.fields:
        s = f.dataType.simpleString()
        if s.startswith("decimal"):
            # sqlite NUMERIC affinity coerces through float — keep
            # decimals as TEXT there (re-typed on export)
            ddl_t = "TEXT" if dialect == "sqlite" else "DECIMAL" + s[len("decimal"):]
        else:
            ddl_t = tmap.get(s, "VARCHAR" if dialect == "duckdb" else "TEXT")
        cols.append(f"{_quote_ident(f.name, dialect)} {ddl_t}")
    return f"CREATE TABLE {_quote_ident(table, dialect)} ({', '.join(cols)})"


def partition_files(csv_dir: str) -> list[str]:
    """The partition files Spark wrote (sorted for determinism).
    Zero-byte files (empty partitions) are skipped — loaders have
    nothing to do with them and DuckDB's sniffer rejects them."""
    return sorted(
        f
        for f in glob.glob(os.path.join(csv_dir, "part-*"))
        if os.path.getsize(f) > 0
    )


# sqlldr field spec per Spark type: how the ctl file tells the loader
# to parse each delimited text field. Formats match the _TS_US writer
# conventions in sources/files.py.
_SQLLDR_FIELD_TYPES: dict[str, str] = {
    "tinyint": "INTEGER EXTERNAL",
    "smallint": "INTEGER EXTERNAL",
    "int": "INTEGER EXTERNAL",
    "bigint": "INTEGER EXTERNAL",
    "boolean": "CHAR(5)",
    "float": "FLOAT EXTERNAL",
    "double": "FLOAT EXTERNAL",
    "string": "CHAR(32767)",
    "timestamp": 'TIMESTAMP "YYYY-MM-DD HH24:MI:SS.FF6"',
    "timestamp_ntz": 'TIMESTAMP "YYYY-MM-DD HH24:MI:SS.FF6"',
    "date": 'DATE "YYYY-MM-DD"',
}


def sqlldr_control_file(df: DataFrame, table: str) -> str:
    """Oracle ``sqlldr`` control file for the dialect CSV conventions
    (upstream send_data's Oracle leg, ≈L750–850). One shared ctl file
    serves every partition file: each loader invocation overrides the
    data file with ``data=`` on the command line — N parallel sqlldr
    sessions, one per partition, instead of one monolithic load.
    Empty fields load as NULL (the 'oracle' nullValue convention)."""
    opts = CSV_DIALECT_OPTIONS["oracle"]
    delim = opts.get("delimiter", ",")
    fields = []
    for f in df.schema.fields:
        s = f.dataType.simpleString()
        if s.startswith("decimal"):
            ftype = "DECIMAL EXTERNAL"
        else:
            ftype = _SQLLDR_FIELD_TYPES.get(s, "CHAR(32767)")
        fields.append(f"  {_quote_ident(f.name, 'oracle')} {ftype}")
    body = ",\n".join(fields)
    return (
        "LOAD DATA\n"
        "CHARACTERSET UTF8\n"
        f"APPEND INTO TABLE {_quote_ident(table, 'oracle')}\n"
        f"FIELDS TERMINATED BY '{delim}' OPTIONALLY ENCLOSED BY '\"'\n"
        "TRAILING NULLCOLS\n"
        f"(\n{body}\n)\n"
    )


def bcp_format_file(df: DataFrame) -> str:
    """SQL Server ``bcp`` non-XML format file for the tab-delimited
    character-mode CSV the 'mssql' conventions emit (upstream
    send_data's SQL Server leg). Character mode (SQLCHAR, prefix 0,
    max length 0 = delimiter-bounded) with the final field terminated
    by the row terminator; string columns carry the server's default
    collation marker, non-char columns an empty collation."""
    n = len(df.schema.fields)
    lines = ["14.0", str(n)]
    for i, f in enumerate(df.schema.fields, start=1):
        term = r"\t" if i < n else r"\n"
        is_char = f.dataType.simpleString() == "string"
        collation = "SQL_Latin1_General_CP1_CI_AS" if is_char else '""'
        lines.append(
            f'{i}  SQLCHAR  0  0  "{term}"  {i}  {f.name}  {collation}'
        )
    return "\n".join(lines) + "\n"


def write_loader_artifacts(
    df: DataFrame, table: str, csv_dir: str, dialect: str
) -> dict[str, str]:
    """Write the per-table loader sidecar files next to the partition
    CSVs and return {kind: path}: the bcp format file ('mssql') or the
    sqlldr control file ('oracle'). Other dialects need none."""
    out: dict[str, str] = {}
    if dialect == "mssql":
        p = os.path.join(csv_dir, f"{table}.bcp.fmt")
        with open(p, "w") as fh:
            fh.write(bcp_format_file(df))
        out["format_file"] = p
    elif dialect == "oracle":
        p = os.path.join(csv_dir, f"{table}.ctl")
        with open(p, "w") as fh:
            fh.write(sqlldr_control_file(df, table))
        out["control_file"] = p
    return out


def bulk_load_statements(
    table: str, csv_dir: str, dialect: str = "postgresql", columns: list[str] | None = None
) -> list[str]:
    """One native bulk-load statement (or loader command line) per
    partition file, matching the CSV conventions
    ``write_csv_for_bulk_load`` used for ``dialect``. Parity: upstream
    ``send_data`` ≈L750–850 — same loaders, but per-partition-file
    (parallelizable) instead of one monolithic dump. The mssql/oracle
    command lines reference the sidecar files from
    ``write_loader_artifacts`` and leave connection flags
    (-S/-U/-P, userid=) to the deployment environment.

    ``columns`` names the staged files' column ORDER explicitly (the
    COPY/LOAD column list) — how an append maps by NAME into an
    existing table whose physical order differs. Only duckdb/postgres/
    mysql statements can express a column list; passing ``columns``
    for the others raises instead of silently loading positionally
    (for oracle the by-name mapping belongs in the ctl file —
    regenerate it from the reordered DataFrame via
    write_loader_artifacts and sqlldr maps fields to the named
    columns; bcp format files and sqlite ``.import`` are positional
    by design)."""
    if columns and dialect not in ("duckdb", "postgresql", "mysql"):
        raise ValueError(
            f"bulk_load_statements: the {dialect} loader command cannot "
            "express a column list — a by-name append is not "
            "representable here (for oracle, regenerate the ctl file "
            "from the reordered DataFrame instead)"
        )
    opts = CSV_DIALECT_OPTIONS.get(dialect, CSV_DIALECT_OPTIONS["postgresql"])
    delim = opts.get("delimiter", ",")
    nullv = opts.get("nullValue", "")
    q = _quote_ident(table, dialect)
    collist = (
        " (" + ", ".join(_quote_ident(c, dialect) for c in columns) + ")"
        if columns
        else ""
    )
    stmts: list[str] = []
    for f in partition_files(csv_dir):
        if dialect == "mysql":
            stmts.append(
                f"LOAD DATA LOCAL INFILE '{_sql_path(f)}' INTO TABLE {q} "
                f"FIELDS TERMINATED BY '{delim}' OPTIONALLY ENCLOSED BY '\"' "
                f"ESCAPED BY '\\\\'"
                + collist
            )
        elif dialect == "duckdb":
            # quote-doubling escape + quoted-null rejection: the exact
            # mirror of the "duckdb" writer conventions (lossless for
            # NULL vs '' vs a literal nullstr-lookalike)
            stmts.append(
                f"COPY {q}{collist} FROM '{_sql_path(f)}' "
                f"(FORMAT CSV, HEADER FALSE, DELIMITER '{delim}', "
                f"QUOTE '\"', ESCAPE '\"', NULLSTR '{nullv}', "
                f"ALLOW_QUOTED_NULLS FALSE)"
            )
        elif dialect == "postgresql":
            stmts.append(
                f"COPY {q}{collist} FROM '{_sql_path(f)}' WITH "
                f"(FORMAT csv, HEADER false, DELIMITER '{delim}', "
                f"QUOTE '\"', ESCAPE '\\', NULL '{nullv}')"
            )
        elif dialect == "sqlite":
            # the sqlite3 CLI has no SQL-level bulk statement; the
            # reference drives `.import` — emit the CLI command line
            # (bulk_load_sqlite below EXECUTES the equivalent through
            # the stdlib driver)
            stmts.append(f'.import --csv "{f}" {table}')
        elif dialect == "mssql":
            # -f carries character mode + terminators inside the format
            # file; combining it with -c/-t is a bcp switch conflict
            fmt = os.path.join(csv_dir, f"{table}.bcp.fmt")
            stmts.append(
                f'bcp {table} in "{f}" -f "{fmt}" -e "{f}.err" -b 10000'
            )
        elif dialect == "oracle":
            ctl = os.path.join(csv_dir, f"{table}.ctl")
            stmts.append(
                f"sqlldr control='{ctl}' data='{f}' log='{f}.log' "
                f"bad='{f}.bad' errors=0 direct=true"
            )
        else:
            raise ValueError(f"no bulk-load statement template for {dialect}")
    return stmts


def bulk_load_duckdb(
    df: DataFrame,
    db_path: str,
    table: str,
    csv_dir: str,
    mode: str = "overwrite",
) -> int:
    """Execute the W3 path end-to-end into an embedded DuckDB database:
    dialect CSV per partition → ``CREATE TABLE`` → native ``COPY FROM``
    per file → loaded row count. ``mode``: overwrite (drop+create),
    append (create if absent; existing column names must match the
    DataFrame's, checked BEFORE any file lands), error (fail if table
    exists). Mode/existence checks run before the CSV stage is written
    so a doomed load fails before the expensive work."""
    import duckdb

    con = duckdb.connect(db_path)
    try:
        exists = bool(
            con.execute(
                "SELECT 1 FROM information_schema.tables WHERE table_name = ?",
                [table],
            ).fetchall()
        )
        want = [f.name for f in df.schema.fields]
        columns: list[str] | None = None
        if exists and mode == "error":
            raise ValueError(f"table {table} already exists (mode=error)")
        if exists and mode == "append":
            have = [
                r[0]
                for r in con.execute(
                    "SELECT column_name FROM information_schema.columns "
                    "WHERE table_name = ? ORDER BY ordinal_position",
                    [table],
                ).fetchall()
            ]
            if sorted(have) != sorted(want):
                raise ValueError(
                    f"append into {table}: existing columns {sorted(have)} "
                    f"!= DataFrame columns {sorted(want)} — the names must "
                    "match as a set"
                )
            if have != want:
                # same names, different physical order: map BY NAME via
                # an explicit COPY column list instead of refusing
                columns = want
        write_csv_for_bulk_load(df, csv_dir, dialect="duckdb")
        if mode == "overwrite":
            con.execute(f"DROP TABLE IF EXISTS {_quote_ident(table, 'duckdb')}")
            exists = False
        if not exists:
            con.execute(schema_ddl(df, table, "duckdb"))
        for stmt in bulk_load_statements(table, csv_dir, "duckdb", columns=columns):
            con.execute(stmt)
        return con.execute(
            f"SELECT COUNT(*) FROM {_quote_ident(table, 'duckdb')}"
        ).fetchall()[0][0]
    finally:
        con.close()


def export_duckdb_table(db_path: str, table: str, parquet_path: str) -> None:
    """Read-back half of the roundtrip proof: the destination engine
    exports what it loaded (native ``COPY TO``), and Spark re-reads it
    for the hash comparison against the source."""
    import duckdb

    con = duckdb.connect(db_path)
    try:
        con.execute(
            f"COPY {_quote_ident(table, 'duckdb')} TO "
            f"'{_sql_path(parquet_path)}' (FORMAT PARQUET)"
        )
    finally:
        con.close()


# --- executed sqlite leg ----------------------------------------------------
#
# Python's stdlib sqlite3 is the second destination engine available in
# this sandbox, so W3 gets a second EXECUTED leg: the .import-equivalent
# (CREATE TABLE + batched positional INSERTs fed from the dialect CSV
# files) driven through the DBAPI connection. NULL convention: the
# staged files distinguish NULL (unquoted empty field) from the empty
# string (quoted '""') — same lossless set as the duckdb leg — and the
# parser below preserves that distinction, which csv.reader cannot (it
# collapses both to '').


def _parse_record(text: str, delimiter: str = ","):
    """Parse ONE complete RFC-4180 record (no trailing terminator) into
    a list of ``(value, was_quoted)``. ``was_quoted`` is what
    csv.reader throws away — and the only way to tell a quoted empty
    string from the unquoted-empty NULL marker. Records without any
    quote character (the overwhelmingly common case) take a fast
    ``str.split`` path."""
    if '"' not in text:
        return [(v, False) for v in text.split(delimiter)]
    rec: list = []
    buf: list = []
    quoted = in_q = False
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if in_q:
            if ch == '"':
                if i + 1 < n and text[i + 1] == '"':
                    buf.append('"')
                    i += 2
                    continue
                in_q = False
                i += 1
                continue
            buf.append(ch)
            i += 1
            continue
        if ch == '"' and not buf and not quoted:
            in_q = quoted = True
            i += 1
            continue
        if ch == delimiter:
            rec.append(("".join(buf), quoted))
            buf, quoted = [], False
            i += 1
            continue
        buf.append(ch)
        i += 1
    if in_q:
        raise ValueError("unterminated quoted field in staged CSV")
    rec.append(("".join(buf), quoted))
    return rec


def _advance_quote_state(
    line: str, in_q: bool, field_has_data: bool, delimiter: str
) -> tuple[bool, bool]:
    """Advance the (inside-quoted-field, current-field-has-data) state
    across one physical line, using the SAME transition rules as
    ``_parse_record`` (a quote only OPENS a quoted field at field
    start; a bare quote mid-field is literal data; doubling stays
    inside). Counting raw quote parity instead would merge two records
    whenever an unquoted field carries a lone quote character."""
    i, n = 0, len(line)
    while i < n:
        ch = line[i]
        if in_q:
            if ch == '"':
                if i + 1 < n and line[i + 1] == '"':
                    i += 2
                    continue
                in_q = False
                field_has_data = True  # a closed quote means the field had content
            i += 1
            continue
        if ch == '"' and not field_has_data:
            in_q = True
        elif ch == delimiter:
            field_has_data = False
        else:
            field_has_data = True
        i += 1
    return in_q, field_has_data


def _parse_rfc4180(fh, delimiter: str = ","):
    """Stream records as lists of ``(value, was_quoted)`` from an
    RFC-4180 file object (quote doubling, embedded delimiters/newlines
    inside quoted fields) WITHOUT slurping the file: lines are
    accumulated only while a quoted field spans the newline (tracked
    by the real field-state machine, not raw quote parity), then one
    record is parsed and released. Memory tracks the largest record,
    not the partition file. Driver-side Python by design: this leg
    feeds sqlite through DBAPI ``executemany``, which is Python-bound
    anyway."""
    pending: list[str] = []
    in_q = False
    field_has_data = False
    for line in fh:
        pending.append(line)
        if in_q or '"' in line:
            # state-scan the line minus its record terminator (the
            # terminator never toggles state; mid-field \r IS data)
            scan = line[:-1] if line.endswith("\n") else line
            if scan.endswith("\r"):
                scan = scan[:-1]
            in_q, field_has_data = _advance_quote_state(
                scan, in_q, field_has_data, delimiter
            )
        else:
            field_has_data = False  # quote-free line: record completes below
        if in_q:
            continue  # record continues past this newline
        field_has_data = False  # next record starts fresh
        text = "".join(pending)
        pending = []
        if text.endswith("\r\n"):
            text = text[:-2]
        elif text.endswith("\n"):
            text = text[:-1]
        # an empty line is still a record: a single-column NULL row
        # stages as a bare terminator
        yield _parse_record(text, delimiter)
    if in_q:
        raise ValueError("unterminated quoted field in staged CSV")
    # the loop yields (and clears pending) on every record boundary,
    # including a final line with no trailing newline — leftover lines
    # without an open quote cannot occur
    assert not pending


def _sqlite_converters(df: DataFrame):
    """Per-column text→python converters for the typed INSERT (sqlite
    is affinity-typed; feeding ints/floats as python objects preserves
    them exactly, and '' means NULL per the dialect convention)."""
    convs = []
    for f in df.schema.fields:
        s = f.dataType.simpleString()
        if s in ("tinyint", "smallint", "int", "bigint"):
            fn = int
        elif s in ("float", "double"):
            fn = float
        elif s == "boolean":
            fn = lambda v: 1 if v == "true" else 0  # noqa: E731
        elif s == "binary":
            raise ValueError("binary columns are not supported on the sqlite CSV leg")
        else:  # string / timestamp / date / decimal ride as TEXT
            fn = str
        convs.append(fn)
    return convs


def bulk_load_sqlite(
    df: DataFrame,
    db_path: str,
    table: str,
    csv_dir: str,
    mode: str = "overwrite",
    batch_rows: int = 10_000,
) -> int:
    """Execute the sqlite leg of W3 end-to-end: dialect CSV per
    partition → CREATE TABLE → ``executemany`` batches per file (the
    driver-level equivalent of the CLI ``.import`` the statement
    generator emits). Same mode semantics and pre-flight ordering as
    ``bulk_load_duckdb``, and the same losslessness: NULL is the
    UNQUOTED empty field, the quoted '""' is the empty string — the
    quote-aware parser preserves what csv.reader would collapse."""
    import sqlite3

    con = sqlite3.connect(db_path)
    try:
        exists = bool(
            con.execute(
                "SELECT 1 FROM sqlite_master WHERE type='table' AND name=?", [table]
            ).fetchall()
        )
        want = [f.name for f in df.schema.fields]
        collist = ""
        if exists and mode == "error":
            raise ValueError(f"table {table} already exists (mode=error)")
        if exists and mode == "append":
            have = [r[1] for r in con.execute(f"PRAGMA table_info({_quote_ident(table, 'sqlite')})")]
            if sorted(have) != sorted(want):
                raise ValueError(
                    f"append into {table}: existing columns {sorted(have)} "
                    f"!= DataFrame columns {sorted(want)} — the names must "
                    "match as a set"
                )
            if have != want:
                # same names, different physical order: name the INSERT
                # columns so values map BY NAME
                collist = (
                    " (" + ", ".join(_quote_ident(c, "sqlite") for c in want) + ")"
                )
        write_csv_for_bulk_load(df, csv_dir, dialect="sqlite")
        if mode == "overwrite":
            con.execute(f"DROP TABLE IF EXISTS {_quote_ident(table, 'sqlite')}")
            exists = False
        if not exists:
            con.execute(schema_ddl(df, table, "sqlite"))
        convs = _sqlite_converters(df)
        placeholders = ", ".join("?" for _ in convs)
        ins = (
            f"INSERT INTO {_quote_ident(table, 'sqlite')}{collist} "
            f"VALUES ({placeholders})"
        )
        for path in partition_files(csv_dir):
            with open(path, newline="") as fh:
                batch = []
                for row in _parse_rfc4180(fh):
                    batch.append(
                        tuple(
                            None if (v == "" and not was_quoted) else fn(v)
                            for fn, (v, was_quoted) in zip(convs, row)
                        )
                    )
                    if len(batch) >= batch_rows:
                        con.executemany(ins, batch)
                        batch = []
                if batch:
                    con.executemany(ins, batch)
        con.commit()
        return con.execute(
            f"SELECT COUNT(*) FROM {_quote_ident(table, 'sqlite')}"
        ).fetchall()[0][0]
    finally:
        con.close()


def export_sqlite_table(
    db_path: str, table: str, parquet_path: str, df_schema
) -> None:
    """Read-back half of the sqlite roundtrip: export what the
    destination loaded to parquet with the source's logical types
    (timestamps/dates/decimals were stored as TEXT) so Spark re-reads
    it for the hash comparison."""
    import sqlite3
    from datetime import date, datetime
    from decimal import Decimal

    import pyarrow as pa
    import pyarrow.parquet as pq

    _PA = {
        "tinyint": pa.int8(),
        "smallint": pa.int16(),
        "int": pa.int32(),
        "bigint": pa.int64(),
        "boolean": pa.bool_(),
        "float": pa.float32(),
        "double": pa.float64(),
        "string": pa.string(),
        "timestamp": pa.timestamp("us"),
        "timestamp_ntz": pa.timestamp("us"),
        "date": pa.date32(),
    }

    def back(s: str, v):
        if v is None:
            return None
        if s in ("timestamp", "timestamp_ntz"):
            return datetime.strptime(v, "%Y-%m-%d %H:%M:%S.%f")
        if s == "date":
            return date.fromisoformat(v)
        if s == "boolean":
            return bool(v)
        if s.startswith("decimal"):
            return Decimal(v)
        return v

    con = sqlite3.connect(db_path)
    try:
        rows = con.execute(
            f"SELECT * FROM {_quote_ident(table, 'sqlite')}"
        ).fetchall()
    finally:
        con.close()
    fields, arrays = [], []
    for i, f in enumerate(df_schema.fields):
        s = f.dataType.simpleString()
        if s.startswith("decimal"):
            p, sc = s[len("decimal("):-1].split(",")
            typ = pa.decimal128(int(p), int(sc))
        else:
            typ = _PA.get(s, pa.string())
        fields.append(pa.field(f.name, typ))
        arrays.append(pa.array([back(s, r[i]) for r in rows], type=typ))
    pq.write_table(pa.table(arrays, schema=pa.schema(fields)), parquet_path)
