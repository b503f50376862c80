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
from pyspark.sql import functions as F

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


# Columns stored as parquet TIMESTAMP(NANOS): Spark reads them as long
# (see session.py nanosAsLong) and we floor-divide to microseconds here.
NANOS_TS_COLS: dict[str, list[str]] = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Parquet scan → columnar vectorized read,
    predicate pushdown and column pruning come free from Catalyst."""
    df = spark.read.parquet(table_path(sf_dir, name))
    for c in NANOS_TS_COLS.get(name, []):
        if c in df.columns and df.schema[c].dataType.simpleString() == "bigint":
            # integer division: ns epoch (~1.7e18) overflows double, so
            # never divide in float here
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
    return df


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
        df = load_table(spark, sf_dir, name)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view so ``spark.sql``
    works against the same names the DuckDB oracle uses — the SQL API
    entry point (portable SQL runs verbatim on both engines).
    Delegates to ``load_tables`` (which skips missing files)."""
    load_tables(spark, sf_dir, register_views=True)
