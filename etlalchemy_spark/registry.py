"""Central query registry.

Every implemented operator from SURVEY.md §2 registers a named query
here: a Spark builder ``fn(spark, sf_dir) -> DataFrame`` plus (when the
semantics are SQL-expressible) an equivalent DuckDB oracle SQL string.
``__spark_entry__.py`` exposes this registry to the driver; ``bench.py``
and the pytest suite iterate it.

Determinism contract (SURVEY.md §5.2): the driver hash-compares values
order-insensitively but EXACTLY, so every floating-point aggregate must
be formulated to produce bit-identical results in Spark and DuckDB
regardless of row order. The house style:

- ``SUM(double)`` is order-dependent → cast to DECIMAL before summing
  (exact, associative), then cast the sum back to DOUBLE:
  ``CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)``.
- ``AVG`` → decimal-sum divided by count in pure double arithmetic.
- Per-row double arithmetic (e.g. price * (1 - discount)) is identical
  IEEE 754 in both engines and safe; only *reductions* need decimals.
- Every computed column is aliased identically in both formulations.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None  # DuckDB SQL; None → rows-only check
    tags: tuple[str, ...] = ()
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, tags=tags, doc=fn.__doc__ or "")
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    """Import every query module (side effect: registration) and return the registry."""
    _load_all()
    return dict(_REGISTRY)


_LOADED = False


def _load_all() -> None:
    global _LOADED
    if _LOADED:
        return
    # Import for registration side effects.
    from etlalchemy_spark.queries import (  # noqa: F401
        tpch,
        tpch_more,
        tpch_rest,
        interval,
        formats,
        joins,
        aggregates,
        windows,
        setops,
        scalars,
        etl,
        dedup,
        similarity,
        text,
        events,
        streaming,
        multimodal,
        sketches,
        udtfs,
        pandas_grouped,
        sampling,
        graph,
        lake,
        geo,
    )

    _LOADED = True
