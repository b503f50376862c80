"""Streaming ⇔ batch twin equivalence (the strongest streaming check:
the memory-sink result of each streaming query must equal its
oracle-checked batch twin on the same fixture)."""

import pytest

from etlalchemy_spark.queries.events import events_session_window, events_tumbling_1h
from etlalchemy_spark.queries.streaming import (
    stream_session_window,
    stream_stateful_user_counts,
    stream_tumbling_counts,
)
from etlalchemy_spark.catalog import load_table

from conftest import SF_DIR


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_stream_tumbling_equals_batch(spark):
    stream = stream_tumbling_counts(spark, SF_DIR)
    batch = events_tumbling_1h(spark, SF_DIR)
    cols = ["window_start", "window_end", "event_type", "n", "total_value"]
    assert _rows(stream, cols) == _rows(batch, cols)


def test_stream_session_equals_batch(spark):
    stream = stream_session_window(spark, SF_DIR)
    batch = events_session_window(spark, SF_DIR)
    cols = ["user_id", "session_start", "session_end", "n_events"]
    assert _rows(stream, cols) == _rows(batch, cols)


def test_stateful_counts_equal_groupby(spark):
    from pyspark.sql import functions as F

    stream = stream_stateful_user_counts(spark, SF_DIR)
    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    cols = ["user_id", "n_events"]
    assert _rows(stream, cols) == _rows(batch, cols)
