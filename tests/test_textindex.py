"""Persisted inverted-index disciplines (operators/textindex.py):
version sidecar, corpus-independent disjointness guard, crash-atomic
single-rename commit, exactly-once (app, batch_id) replay skipping,
partition pruning, compaction. The RESULT correctness (probe ==
full-scan BM25, bit for bit) is gated cross-engine by
text_index_bm25_probe / text_index_compaction; these tests pin the
store mechanics that the gate can't see."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etlalchemy_spark.operators.textindex import (
    _batch_summary,
    _list_batches,
    _overlap_candidates,
    _read_stats,
    append_text_index,
    compact_text_index,
    probe_text_index,
    text_index_version,
)

DOCS = [
    (1, "vector stream window filter merge"),
    (2, "the quick brown fox jumps over the lazy dog"),
    (3, "stream stream stream window"),
    (4, "merge filter vector"),
    (5, "completely unrelated words only here"),
    (6, "window merge window merge window"),
]


def _docs(spark, rows=DOCS):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_append_probe_matches_inline_bm25(spark, tmp_path):
    # two disjoint appends; probe == the same BM25 computed inline
    store = os.path.join(str(tmp_path), "store")
    d = _docs(spark)
    r1 = append_text_index(store, d.where(F.col("doc_id") % 2 == 0), "doc_id", "text")
    r2 = append_text_index(store, d.where(F.col("doc_id") % 2 == 1), "doc_id", "text")
    assert (r1["committed"], r1["batch_seq"]) == (True, 0)
    assert (r2["committed"], r2["batch_seq"]) == (True, 1)
    got = {
        r.doc_id: r.score
        for r in probe_text_index(spark, store, ["stream", "window"], k=10).collect()
    }
    assert set(got) == {1, 3, 6}  # docs containing either term
    assert got[3] > got[1]  # tf=3 'stream' beats tf=1 each


def test_probe_prunes_to_query_term_buckets(spark, tmp_path):
    store = os.path.join(str(tmp_path), "store")
    append_text_index(store, _docs(spark), "doc_id", "text")
    probe = probe_text_index(spark, store, ["stream"], k=5)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    scan_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("bucket" in ln for ln in scan_lines), plan[:2000]


def test_append_rejects_overlapping_batch(spark, tmp_path):
    store = os.path.join(str(tmp_path), "store")
    d = _docs(spark)
    append_text_index(store, d, "doc_id", "text")
    with pytest.raises(ValueError, match="overlaps the store"):
        append_text_index(store, d.where(F.col("doc_id") == 1), "doc_id", "text")


def test_disjoint_guard_never_reads_postings(spark, tmp_path):
    """The r12 weakness, pinned shut: screening a DISJOINT batch must
    read only the _stats ledger (O(batches) rows) + the batch itself —
    never a bucket=... postings file, however many batches the store
    holds."""
    store = os.path.join(str(tmp_path), "store")
    d = _docs(spark)
    for r in range(3):
        append_text_index(store, d.where(F.col("doc_id") % 3 == r), "doc_id", "text")
    new = spark.createDataFrame([(100, "fresh words")], "doc_id long, text string")
    stats = _read_stats(spark, store, _list_batches(spark, store))
    summary = _batch_summary(new, "doc_id", "text")
    cand = _overlap_candidates(
        spark, stats, new.select(F.col("doc_id").alias("doc_id")), summary
    )
    files = cand.inputFiles()
    assert files, "guard plan should read the stats sidecars"
    assert all("bucket=" not in f for f in files), files
    assert all("/_stats/" in f or "_staging" not in f for f in files)
    # and the guard finds nothing for a disjoint batch
    assert cand.limit(1).collect() == []


def test_crash_before_rename_is_invisible_and_retry_heals(spark, tmp_path, monkeypatch):
    """Kill-mid-append: staging written, commit rename never happens.
    The store must answer probes exactly as before the append, and a
    retried append must succeed (self-healing the staging leftovers)."""
    import etlalchemy_spark.operators.textindex as ti

    store = os.path.join(str(tmp_path), "store")
    d = _docs(spark)
    append_text_index(store, d.where(F.col("doc_id") <= 3), "doc_id", "text")
    before = probe_text_index(spark, store, ["merge", "window"], k=10).collect()

    real = ti._fs_path
    calls = {"n": 0}

    def crashing_fs_path(spark_, path):
        fs, p = real(spark_, path)
        if "batch=1" in path:
            calls["n"] += 1
            raise RuntimeError("simulated crash before commit rename")
        return fs, p

    monkeypatch.setattr(ti, "_fs_path", crashing_fs_path)
    with pytest.raises(RuntimeError, match="simulated crash"):
        append_text_index(store, d.where(F.col("doc_id") > 3), "doc_id", "text")
    monkeypatch.setattr(ti, "_fs_path", real)
    assert calls["n"] == 1
    # staging exists on disk but is underscore-hidden from every reader
    assert os.path.isdir(os.path.join(store, "_staging-1"))
    assert _list_batches(spark, store) == [0]
    mid = probe_text_index(spark, store, ["merge", "window"], k=10).collect()
    assert mid == before
    # retry overwrites the leftover staging and commits normally
    r = append_text_index(store, d.where(F.col("doc_id") > 3), "doc_id", "text")
    assert r["committed"] and r["batch_seq"] == 1
    assert not os.path.isdir(os.path.join(store, "_staging-1"))
    after = {
        r.doc_id
        for r in probe_text_index(spark, store, ["merge", "window"], k=10).collect()
    }
    assert after == {1, 3, 4, 6}  # merge: 1,4,6; window: 1,3,6


def test_replay_with_app_batch_id_is_skipped_exactly_once(spark, tmp_path):
    store = os.path.join(str(tmp_path), "store")
    d = _docs(spark)
    r1 = append_text_index(
        store, d.where(F.col("doc_id") <= 3), "doc_id", "text", app="s", batch_id=0
    )
    one_shot = probe_text_index(spark, store, ["stream", "window"], k=10).collect()
    # at-least-once replay of the SAME micro-batch: skipped, not failed
    r2 = append_text_index(
        store, d.where(F.col("doc_id") <= 3), "doc_id", "text", app="s", batch_id=0
    )
    assert r1["committed"] is True
    assert r2["committed"] is False and r2["batch_seq"] == r1["batch_seq"]
    replayed = probe_text_index(spark, store, ["stream", "window"], k=10).collect()
    assert replayed == one_shot
    # a DIFFERENT batch_id from the same app still commits
    r3 = append_text_index(
        store, d.where(F.col("doc_id") > 3), "doc_id", "text", app="s", batch_id=1
    )
    assert r3["committed"] is True


def test_empty_batch_is_a_noop(spark, tmp_path):
    store = os.path.join(str(tmp_path), "store")
    d = _docs(spark)
    append_text_index(store, d, "doc_id", "text")
    r = append_text_index(
        store, d.where(F.col("doc_id") > 999), "doc_id", "text"
    )
    assert r["committed"] is False and r["n_docs"] == 0
    assert _list_batches(spark, store) == [0]


def test_version_guards_fail_loudly(spark, tmp_path):
    store = os.path.join(str(tmp_path), "store")
    append_text_index(store, _docs(spark), "doc_id", "text", n_buckets=64)
    # probing with a different bucket count is a different version
    with pytest.raises(ValueError, match="version"):
        probe_text_index(spark, store, ["stream"], n_buckets=32)
    # appending with a different bucket count refuses too
    with pytest.raises(ValueError, match="refusing to append"):
        append_text_index(
            store,
            spark.createDataFrame([(99, "new doc")], "doc_id long, text string"),
            "doc_id",
            "text",
            n_buckets=32,
        )


def test_compaction_keeps_results_and_shrinks_files(spark, tmp_path):
    store = os.path.join(str(tmp_path), "store")
    d = _docs(spark)
    for r in range(3):
        append_text_index(store, d.where(F.col("doc_id") % 3 == r), "doc_id", "text")
    before = probe_text_index(spark, store, ["merge", "window"], k=10).collect()

    def n_files():
        return sum(
            len([f for f in files if f.endswith(".parquet")])
            for root, _, files in os.walk(store)
            if "_stats" not in root
        )

    nb = n_files()
    out = compact_text_index(spark, store)
    assert out["batches_merged"] == 3
    assert n_files() < nb
    assert _list_batches(spark, store) == [0]
    after = probe_text_index(spark, store, ["merge", "window"], k=10).collect()
    assert before == after
    # version tag survives the swap
    assert text_index_version(64) is not None
    probe_text_index(spark, store, ["merge"], k=3)  # no version error


def test_guard_and_ledger_survive_compaction(spark, tmp_path):
    """Compaction carries the stats ledger over unchanged: the
    disjointness guard still rejects an overlap, and an (app,
    batch_id) replay is still skipped, after the store is rewritten
    as one batch."""
    store = os.path.join(str(tmp_path), "store")
    d = _docs(spark)
    append_text_index(
        store, d.where(F.col("doc_id") <= 3), "doc_id", "text", app="s", batch_id=7
    )
    append_text_index(store, d.where(F.col("doc_id") > 3), "doc_id", "text")
    compact_text_index(spark, store)
    with pytest.raises(ValueError, match="overlaps the store"):
        append_text_index(store, d.where(F.col("doc_id") == 2), "doc_id", "text")
    r = append_text_index(
        store, d.where(F.col("doc_id") <= 3), "doc_id", "text", app="s", batch_id=7
    )
    assert r["committed"] is False


def test_fused_summary_bloom_equals_direct(spark):
    """The one-pass summary+bloom (r13 optimization) is bit-identical
    to the two separate passes it replaced: same summary dict, and the
    max-size-then-fold Bloom equals a direct mod-target build for
    every legal target size."""
    from etlalchemy_spark.operators.textindex import (
        _batch_bloom,
        _batch_summary_and_bloom,
        _bloom_words_for,
        _fold_bloom,
    )

    docs = _docs(spark)
    summary, words_max = _batch_summary_and_bloom(docs, "doc_id", "text")
    assert summary == _batch_summary(docs, "doc_id", "text")
    for target_words in (64, 128, _bloom_words_for(summary["n_docs"])):
        assert _fold_bloom(words_max, target_words) == _batch_bloom(
            docs, "doc_id", target_words * 60
        )
