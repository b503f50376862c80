"""Table catalog: named DataFrames over the fixture parquet files.

The reference models a database as a set of named SQLAlchemy Tables
reflected from the source catalog (SURVEY.md §1.1, op S1). Here a
"database" is a dict of named DataFrames, each also registered as a
temp view so the SQL API works over the same logical plans.

``SMALL_DIM_TABLES`` marks the tables an engine at 100 TB would still
broadcast (region/nation/supplier stay tiny at any TPC-H scale factor;
customer/part grow with SF but remain orders of magnitude under the
fact tables — callers broadcast those explicitly per query instead).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Bounded-size dims at ANY scale factor — always safe to broadcast.
SMALL_DIM_TABLES = {"region", "nation"}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Parquet scan → columnar vectorized read,
    predicate pushdown and column pruning come free from Catalyst."""
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(
    spark: SparkSession,
    sf_dir: str = DEFAULT_SF_DIR,
    names: list[str] | None = None,
    register_views: bool = True,
) -> dict[str, DataFrame]:
    """Load the fixture star schema as named DataFrames (+ temp views)."""
    out: dict[str, DataFrame] = {}
    for name in names or TABLE_NAMES:
        path = table_path(sf_dir, name)
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
