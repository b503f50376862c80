"""Invariant tests on crafted mini-fixtures: chunk coverage (every word
lands in >= 1 chunk — the bug class where stride arithmetic silently
drops document tails) and graph ground truths (K4 has exactly 4
triangles)."""

import os

import pytest
from pyspark.sql import functions as F

from etlalchemy_spark.registry import all_queries

from conftest import SF_DIR  # noqa: F401  (spark fixture import side)


def _q(name):
    return all_queries()[name]


@pytest.fixture(scope="module")
def chunk_fixture(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("chunkfix")
    rows = []
    for i, n in enumerate([1, 5, 19, 20, 21, 25, 30, 31, 47, 100]):
        rows.append((i, " ".join(f"w{j}" for j in range(1, n + 1)), "en", "src", n))
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(os.path.join(str(d), "documents.parquet"))
    return str(d)


def test_chunks_cover_every_word(spark, chunk_fixture):
    out = _q("text_chunk_sliding_window").fn(spark, chunk_fixture).collect()
    docs = {}
    for r in out:
        docs.setdefault(r["doc_id"], []).append(r)
    # doc i has n words (see fixture); every word index must be covered
    lens = [1, 5, 19, 20, 21, 25, 30, 31, 47, 100]
    for i, n in enumerate(lens):
        chunks = docs[i]
        covered = set()
        for c in chunks:
            covered.update(range(c["start"], c["start"] + c["n_tokens"]))
        assert covered == set(range(1, n + 1)), f"doc {i} (n={n}) misses words"
        # ords contiguous from 0, and no empty chunks
        assert sorted(c["chunk_ord"] for c in chunks) == list(range(len(chunks)))
        assert all(c["n_tokens"] >= 1 for c in chunks)
        # last chunk reaches the last word exactly
        assert max(c["start"] + c["n_tokens"] - 1 for c in chunks) == n


@pytest.fixture(scope="module")
def k4_fixture(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("graphfix")
    # one order containing 4 parts -> complete graph K4
    rows = [(1, p) for p in [10, 20, 30, 40]]
    spark.createDataFrame(rows, "l_orderkey bigint, l_partkey bigint").write.mode(
        "overwrite"
    ).parquet(os.path.join(str(d), "lineitem.parquet"))
    return str(d)


def test_triangle_count_k4(spark, k4_fixture):
    out = _q("graph_triangle_count").fn(spark, k4_fixture).collect()
    assert out[0]["n_triangles"] == 4  # C(4,3)


def test_degree_distribution_k4(spark, k4_fixture):
    out = _q("graph_degree_distribution").fn(spark, k4_fixture).collect()
    assert len(out) == 1 and out[0]["degree"] == 3 and out[0]["n_nodes"] == 4
