"""Unit tests for the CSV rule compiler (X1–X4, T9–T10)."""

import pytest

from etlalchemy_spark.operators.rules import (
    SchemaRules,
    parse_column_rules,
    parse_table_rules,
)

TABLE_CSV = """Table Name, New Table Name, Delete
customer, clients,
orders, , true
"""

COLUMN_CSV = """Table Name, Column Name, New Column Name, New Column Type, Delete
customer, c_name, full_name, ,
customer, c_nationkey, , BigInteger,
customer, c_mktsegment, , , true
*, shared_col, renamed_everywhere, ,
"""


def test_parse_table_rules():
    rules = parse_table_rules(TABLE_CSV)
    assert rules[0].table == "customer" and rules[0].new_name == "clients"
    assert rules[1].table == "orders" and rules[1].delete


def test_parse_column_rules():
    rules = parse_column_rules(COLUMN_CSV)
    assert rules[0].new_name == "full_name"
    assert rules[1].new_type == "bigint"
    assert rules[2].delete
    assert rules[3].table == "*"


def test_unknown_type_raises():
    with pytest.raises(ValueError, match="unknown rule type"):
        parse_column_rules(
            "Table Name, Column Name, New Column Name, New Column Type, Delete\n"
            "t, c, , NotAType,\n"
        )


def test_transform_table_name():
    r = SchemaRules.from_csv(table_csv=TABLE_CSV)
    assert r.transform_table_name("customer") == "clients"
    assert r.transform_table_name("orders") is None  # X2 delete
    assert r.transform_table_name("nation") == "nation"  # untouched


def test_transform_columns(spark):
    r = SchemaRules.from_csv(column_csv=COLUMN_CSV)
    df = spark.createDataFrame(
        [(1, "alice", 3, "SEG", "x")],
        "c_custkey long, c_name string, c_nationkey int, c_mktsegment string, shared_col string",
    )
    out = r.transform("customer", df)
    assert out.columns == ["c_custkey", "full_name", "c_nationkey", "renamed_everywhere"]
    assert dict(out.dtypes)["c_nationkey"] == "bigint"


def test_wildcard_rule_applies_to_other_tables(spark):
    r = SchemaRules.from_csv(column_csv=COLUMN_CSV)
    df = spark.createDataFrame([("v",)], "shared_col string")
    assert r.transform("whatever", df).columns == ["renamed_everywhere"]


def test_suffix_rename_and_ignore(spark):
    r = SchemaRules.from_csv(
        ignored_col_suffixes=["_tmp"],
        renamed_col_suffixes={"_tmstmp": "_dt"},
    )
    df = spark.createDataFrame([(1, 2, 3)], "created_tmstmp long, junk_tmp long, id long")
    out = r.transform("t", df)
    assert out.columns == ["created_dt", "id"]


def test_expectations_null_counts_as_failure(spark):
    """An expectation evaluating to NULL routes the row to quarantine —
    unknown data is what quarantine is FOR — and the passed side drops
    the bookkeeping column."""
    from pyspark.sql import functions as F

    from etlalchemy_spark.operators.expectations import (
        expectation_report,
        split_quarantine,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, -5.0)], "id long, price double"
    )
    rules = [("price_pos", F.col("price") > 0)]
    passed, quarantined = split_quarantine(df, rules)
    assert [r.id for r in passed.collect()] == [1]
    assert "_failed_rules" not in passed.columns
    got = sorted((r.id, list(r._failed_rules)) for r in quarantined.collect())
    assert got == [(2, ["price_pos"]), (3, ["price_pos"])]

    rep = expectation_report(df, rules).collect()[0]
    assert (rep.rule, rep.n_violations, rep.n_rows) == ("price_pos", 2, 3)


def test_expectation_report_is_single_scan(spark):
    """N rules must not become N scans: exactly one aggregate over one
    relation in the physical plan."""
    from pyspark.sql import functions as F

    from etlalchemy_spark.operators.expectations import expectation_report

    df = spark.range(100).select(F.col("id"), (F.col("id") % 7).alias("m"))
    rep = expectation_report(
        df, [("a", F.col("m") < 5), ("b", F.col("m") != 0), ("c", F.col("id") < 90)]
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") <= 2  # one partial + one final
