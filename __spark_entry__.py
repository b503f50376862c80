"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``etlalchemy_spark`` package; this module
only adapts its registry to the driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etlalchemy_spark.registry import all_queries  # noqa: E402
from etlalchemy_spark.session import ensure_session_confs  # noqa: E402


def _wrap(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    """The driver supplies ITS OWN SparkSession; apply the engine's
    correctness-critical runtime confs (UTC, parquet-nanos handling)
    before building any plan on it."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(ensure_session_confs(spark), sf_dir)

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 analogue) on /root/testdata/sf0.001."""
    q = all_queries()["q1_pricing_summary"]
    return _wrap(q.fn)(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _wrap(q.fn) for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
