"""W3 native bulk-load path: dialect CSV → CREATE TABLE → COPY per
partition file → lossless round-trip (upstream send_data ≈L750–850)."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from etlalchemy_spark.sources.bulkload import (
    bulk_load_duckdb,
    bulk_load_statements,
    export_duckdb_table,
    schema_ddl,
)
from etlalchemy_spark.sources.files import write_csv_for_bulk_load


@pytest.fixture()
def tricky(spark):
    # delimiter/quote/escape/NULL torture: commas, quotes, backslashes,
    # the literal NULL marker as data, negative and fractional doubles
    rows = [
        (1, "plain", 1.5),
        (2, "comma, inside", -2.25),
        (3, 'quote " inside', 0.1),
        (4, "back\\slash", 1e300),
        (5, None, None),
        (6, r"\N", 42.0),  # literal backslash-N string, not NULL
        (7, "", 0.0),  # empty string, not NULL
    ]
    return spark.createDataFrame(rows, "id int, s string, v double")


def test_schema_ddl_types(spark):
    df = spark.createDataFrame([(1, "x", 1.0)], "id bigint, s string, v double")
    ddl = schema_ddl(df, "t", "duckdb")
    assert ddl == 'CREATE TABLE "t" ("id" BIGINT, "s" VARCHAR, "v" DOUBLE)'
    assert "TEXT" in schema_ddl(df, "postgresql", "postgresql") or True
    pg = schema_ddl(df, "t", "postgresql")
    assert "DOUBLE PRECISION" in pg and "TEXT" in pg


def test_statements_per_partition_file(spark, tmp_path):
    df = spark.range(100).repartition(4)
    d = str(tmp_path / "csv")
    write_csv_for_bulk_load(df, d, dialect="postgresql")
    stmts = bulk_load_statements("t", d, "postgresql")
    assert len(stmts) == 4
    assert all(s.startswith('COPY "t" FROM') for s in stmts)
    my = bulk_load_statements("t", d, "mysql")
    assert all("LOAD DATA LOCAL INFILE" in s for s in my)


def test_duckdb_roundtrip_lossless(spark, tricky, tmp_path):
    db = str(tmp_path / "dest.duckdb")
    n = bulk_load_duckdb(tricky, db, "tricky", str(tmp_path / "csv"))
    assert n == 7
    con = duckdb.connect(db)
    got = {
        r[0]: (r[1], r[2])
        for r in con.execute("SELECT id, s, v FROM tricky ORDER BY id").fetchall()
    }
    con.close()
    want = {
        r["id"]: (r["s"], r["v"])
        for r in tricky.collect()
    }
    assert got == want


def test_duckdb_roundtrip_doubles_bit_exact(spark, tmp_path):
    # CSV is a TEXT format: shortest-round-trip double rendering must
    # reparse to the identical bits
    df = spark.range(1000).select(
        F.col("id").cast("int").alias("id"),
        (F.col("id") / 7.0 * 1.000000001).alias("v"),
    )
    db = str(tmp_path / "d2.duckdb")
    bulk_load_duckdb(df, db, "doubles", str(tmp_path / "csv2"))
    out = str(tmp_path / "back.parquet")
    export_duckdb_table(db, "doubles", out)
    back = spark.read.parquet(out)
    src = {r["id"]: r["v"] for r in df.collect()}
    got = {r["id"]: r["v"] for r in back.collect()}
    assert got == src


def test_mode_semantics(spark, tmp_path):
    df = spark.createDataFrame([(1,)], "id int")
    db = str(tmp_path / "m.duckdb")
    d = str(tmp_path / "csvm")
    assert bulk_load_duckdb(df, db, "t", d, mode="overwrite") == 1
    assert bulk_load_duckdb(df, db, "t", d, mode="append") == 2
    assert bulk_load_duckdb(df, db, "t", d, mode="overwrite") == 1
    with pytest.raises(ValueError, match="mode=error"):
        bulk_load_duckdb(df, db, "t", d, mode="error")
