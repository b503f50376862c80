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


# --- the remaining streaming queries' twin equivalence (r5 review) ----------
#
# Rows-only gate entries prove the query RUNS; only these comparisons
# prove the streaming result EQUALS the oracle-checked batch twin.

from pyspark.sql import functions as F

from etlalchemy_spark.queries.events import (
    events_click_view_attrib,
    events_sliding_1h_15m,
    events_user_enrich,
)
from etlalchemy_spark.queries.streaming import (
    stream_dedup_watermark,
    stream_foreach_batch_sink,
    stream_static_enrich,
    stream_stream_join_q,
    stream_sliding_counts,
    stream_tws_running_totals,
)


def test_stream_sliding_equals_batch(spark):
    stream = stream_sliding_counts(spark, SF_DIR)
    batch = events_sliding_1h_15m(spark, SF_DIR)
    cols = ["window_start", "window_end", "n"]
    assert _rows(stream, cols) == _rows(batch, cols)


def test_stream_dedup_equals_batch_distinct(spark):
    stream = stream_dedup_watermark(spark, SF_DIR)
    ev = load_table(spark, SF_DIR, "events")
    # fixture event_ids are unique, so the dedup must be the identity
    assert stream.count() == ev.count()
    assert stream.select("event_id").distinct().count() == ev.count()


def test_stream_stream_join_equals_batch_attrib(spark):
    stream = stream_stream_join_q(spark, SF_DIR)
    batch = events_click_view_attrib(spark, SF_DIR)
    s = sorted((r["c_event"], r["v_event"]) for r in stream.collect())
    b = sorted((r["c_event"], r["v_event"]) for r in batch.collect())
    assert s == b


def test_stream_static_enrich_equals_batch(spark):
    stream = stream_static_enrich(spark, SF_DIR)
    batch = events_user_enrich(spark, SF_DIR)
    cols = ["nation", "event_type", "n"]
    assert _rows(stream, cols) == _rows(batch, cols)


def test_stream_tws_totals_equal_groupby(spark):
    stream = stream_tws_running_totals(spark, SF_DIR)
    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
    )
    s = {r["user_id"]: (r["n_events"], round(r["total_value"], 6)) for r in stream.collect()}
    b = {r["user_id"]: (r["n_events"], round(r["total_value"], 6)) for r in batch.collect()}
    assert s.keys() == b.keys()
    for k in b:
        assert s[k][0] == b[k][0]
        assert abs(s[k][1] - b[k][1]) < 1e-6  # float accumulation order differs


def test_foreach_batch_sink_loses_nothing(spark):
    landed = stream_foreach_batch_sink(spark, SF_DIR)
    ev = load_table(spark, SF_DIR, "events")
    assert landed.count() == ev.count()  # the docstring's claim, enforced
    assert landed.select("event_id").distinct().count() == ev.count()


def test_stream_decontam_equals_batch(spark):
    """The streaming scrub's per-doc contamination counts must equal
    the batch twin's n_contaminated exactly (same split, same shingle
    semantics, integer counts — no float slack)."""
    from etlalchemy_spark.registry import all_queries

    qs = all_queries()
    s = {
        r["doc_id"]: r["n_contaminated"]
        for r in qs["stream_decontam_scrub"].fn(spark, SF_DIR).collect()
    }
    b = {
        r["doc_id"]: r["n_contaminated"]
        for r in qs["text_decontamination"].fn(spark, SF_DIR).collect()
    }
    assert s == b


def test_stream_incremental_dedup_equals_one_shot(spark):
    """The streaming foreachBatch dedup sink must converge to exactly
    the one-shot full-corpus pair set — the replay invariance of
    incremental_dedup_step carried through real trigger/checkpoint
    machinery (file-per-batch ingest, persisted band store)."""
    from etlalchemy_spark.registry import all_queries

    from conftest import SF_DIR

    qs = all_queries()
    stream = {
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in qs["stream_incremental_dedup"].fn(spark, SF_DIR).collect()
    }
    one_shot = {
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in qs["dedup_minhash_lsh_exact"].fn(spark, SF_DIR).collect()
    }
    assert stream == one_shot
    assert one_shot, "fixture must contain at least one near-dup pair"


def test_stream_ann_index_append_equals_one_shot(spark):
    """Streaming index maintenance must converge to the one-shot
    whole-corpus search: probe of the stream-appended bucket store ==
    the oracle-exact batch query over the same corpus."""
    from etlalchemy_spark.registry import all_queries

    from conftest import SF_DIR

    qs = all_queries()
    stream = [
        (r.vec_id, round(r.cosine, 9), r["rank"])
        for r in qs["stream_incremental_ann_index"].fn(spark, SF_DIR).collect()
    ]
    batch = [
        (r.vec_id, round(r.cosine, 9), r["rank"])
        for r in qs["sim_incremental_index_topk"].fn(spark, SF_DIR).collect()
    ]
    assert sorted(stream) == sorted(batch)
    assert stream, "probe returned no rows"
