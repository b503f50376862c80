"""Persisted inverted-index disciplines (operators/textindex.py):
version sidecar, batch disjointness, partition pruning, compaction.
The RESULT correctness (probe == full-scan BM25, bit for bit) is gated
cross-engine by text_index_bm25_probe / text_index_compaction; these
tests pin the store mechanics that the gate can't see."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etlalchemy_spark.operators.textindex import (
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
    append_text_index(store, d.where(F.col("doc_id") % 2 == 0), "doc_id", "text")
    append_text_index(store, d.where(F.col("doc_id") % 2 == 1), "doc_id", "text")
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
    compact_text_index(spark, store)
    assert n_files() < nb
    after = probe_text_index(spark, store, ["merge", "window"], k=10).collect()
    assert before == after
    # version tag survives the swap
    assert text_index_version(64) is not None
    probe_text_index(spark, store, ["merge"], k=3)  # no version error
