"""W2 literal serializer: dialect-specific escaping/NULL/type rendering
(literal_value_generator parity — upstream ≈L20–250)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from etlalchemy_spark.sources.literals import insert_statement


def _df(spark):
    return spark.createDataFrame(
        [
            (1, "plain", True, bytearray(b"\x01\xff"), datetime.datetime(1996, 3, 1, 12, 30, 5)),
            (2, "it's quoted", False, None, None),
            (3, "back\\slash", None, bytearray(b""), datetime.datetime(2000, 1, 1)),
            (4, None, True, None, None),
        ],
        "id int, name string, flag boolean, payload binary, ts timestamp",
    )


def _stmts(spark, dialect):
    df = _df(spark)
    return [r.stmt for r in df.select(insert_statement(df, "t", dialect)).orderBy("stmt").collect()]


def test_postgres_quoting_null_bool(spark):
    stmts = {s.split("VALUES (")[1][0]: s for s in _stmts(spark, "postgresql")}
    assert "'it''s quoted'" in stmts["2"]
    assert stmts["2"].endswith("NULL, NULL);")
    assert "TRUE" in stmts["1"] and "FALSE" in stmts["2"]
    assert "'\\x01ff'" in stmts["1"]
    assert "'1996-03-01 12:30:05'" in stmts["1"]
    assert "NULL, TRUE, NULL, NULL" in stmts["4"]  # NULL string, non-null bool


def test_mysql_backslash_and_bits(spark):
    stmts = {s.split("VALUES (")[1][0]: s for s in _stmts(spark, "mysql")}
    assert "'back\\\\slash'" in stmts["3"]
    assert ", 1, 0x01ff," in stmts["1"]  # bool → 1, binary → 0x hex
    assert ", 0, NULL," in stmts["2"]


def test_oracle_todate_terminated(spark):
    stmts = _stmts(spark, "oracle")
    assert all(s.endswith(";") for s in stmts)  # replayable by sqlplus
    assert any("TO_DATE('1996-03-01 12:30:05','YYYY-MM-DD HH24:MI:SS')" in s for s in stmts)


def test_unknown_dialect_rejected(spark):
    df = _df(spark)
    try:
        insert_statement(df, "t", "db2")
    except ValueError as e:
        assert "db2" in str(e)
    else:
        raise AssertionError("expected ValueError")
