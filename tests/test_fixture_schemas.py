"""Fixture-drift guard (r3 VERDICT ask): the driver regenerates
/root/testdata each round, and physical parquet types have flipped
twice already (ms → ns → µs timestamps). Every query assumes the
LOGICAL schema below *after* catalog normalization (load_table), so
this test fails loudly — with the exact diff — the moment a
regeneration changes what queries see, before any query breaks
downstream.

Timestamp-like columns accept either timestamp flavor: TIMESTAMP_NTZ
(µs parquet, inferTimestampNTZ) and session-UTC TIMESTAMP (the
normalized nanos path) carry identical UTC wall-clock values under the
pinned UTC session zone.
"""

import os

import pytest

from etlalchemy_spark.catalog import TABLE_NAMES, load_table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

_TS = ("timestamp", "timestamp_ntz")  # either flavor is acceptable

EXPECTED: dict[str, dict[str, tuple[str, ...]]] = {
    "region": {"r_regionkey": ("int",), "r_name": ("string",)},
    "nation": {
        "n_nationkey": ("int",),
        "n_name": ("string",),
        "n_regionkey": ("int",),
    },
    "customer": {
        "c_custkey": ("bigint",),
        "c_name": ("string",),
        "c_nationkey": ("int",),
        "c_acctbal": ("double",),
        "c_mktsegment": ("string",),
    },
    "supplier": {
        "s_suppkey": ("bigint",),
        "s_name": ("string",),
        "s_nationkey": ("int",),
        "s_acctbal": ("double",),
    },
    "part": {
        "p_partkey": ("bigint",),
        "p_name": ("string",),
        "p_brand": ("string",),
        "p_type": ("string",),
        "p_size": ("int",),
        "p_retailprice": ("double",),
    },
    "orders": {
        "o_orderkey": ("bigint",),
        "o_custkey": ("bigint",),
        "o_orderstatus": ("string",),
        "o_totalprice": ("double",),
        "o_orderdate": _TS,
        "o_orderpriority": ("string",),
    },
    "lineitem": {
        "l_orderkey": ("bigint",),
        "l_partkey": ("bigint",),
        "l_suppkey": ("bigint",),
        "l_linenumber": ("int",),
        "l_quantity": ("double",),
        "l_extendedprice": ("double",),
        "l_discount": ("double",),
        "l_tax": ("double",),
        "l_returnflag": ("string",),
        "l_linestatus": ("string",),
        "l_shipdate": _TS,
    },
    "events": {
        "event_id": ("bigint",),
        # events.ts is the column whose physical type drifts; the
        # catalog must ALWAYS normalize it to a timestamp flavor
        "ts": _TS,
        "user_id": ("bigint",),
        "event_type": ("string",),
        "value": ("double",),
        "props": ("string",),
    },
    "documents": {
        "doc_id": ("bigint",),
        "text": ("string",),
        "lang": ("string",),
        "source": ("string",),
        "n_chars": ("bigint",),
    },
    "embeddings": {
        "vec_id": ("bigint",),
        "embedding": ("array<float>",),
        "label": ("int",),
    },
}


def test_expected_covers_all_catalog_tables():
    assert sorted(EXPECTED) == sorted(TABLE_NAMES)


@pytest.mark.parametrize("name", TABLE_NAMES)
def test_fixture_schema_matches_contract(spark, name):
    df = load_table(spark, SF_DIR, name)
    got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    want = EXPECTED[name]
    problems = []
    for col, accepted in want.items():
        if col not in got:
            problems.append(f"  MISSING column {col} (want {'/'.join(accepted)})")
        elif got[col] not in accepted:
            problems.append(
                f"  TYPE DRIFT {col}: fixture reads as {got[col]}, "
                f"queries expect {'/'.join(accepted)}"
            )
    for col in got:
        if col not in want:
            problems.append(f"  UNEXPECTED column {col}: {got[col]}")
    if list(got) != list(want):
        problems.append(
            f"  ORDER: fixture {list(got)} != contract {list(want)}"
        )
    assert not problems, (
        f"\nfixture drift in {SF_DIR}/{name}.parquet — the driver "
        "regenerated testdata with a different schema; fix the catalog "
        "normalization (etlalchemy_spark/catalog.py NANOS_TS_COLS) or "
        "update FIXTURES.md + this contract:\n" + "\n".join(problems)
    )
