"""PageRank determinism/semantics and prefix-filter Jaccard losslessness."""

from __future__ import annotations

from pyspark.sql import functions as F

from etlalchemy_spark.operators.dedup import prefix_filter_jaccard_pairs
from etlalchemy_spark.operators.graph import pagerank_exact

from conftest import SF_DIR


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string, w long")


def test_pagerank_sums_to_one_ish(spark):
    e = _edges(spark, [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)])
    r = {x["node"]: x["pagerank"] for x in pagerank_exact(e, iters=10).collect()}
    # symmetric cycle -> uniform ranks
    assert len(r) == 3
    for v in r.values():
        assert abs(v - 1 / 3) < 1e-6
    assert abs(sum(r.values()) - 1.0) < 1e-6


def test_pagerank_hub_ranks_highest(spark):
    # everything points at 'hub'
    # hub<->a mass oscillates with period 2, so run to near-convergence
    e = _edges(spark, [("a", "hub", 1), ("b", "hub", 1), ("c", "hub", 1), ("hub", "a", 1)])
    r = {x["node"]: x["pagerank"] for x in pagerank_exact(e, iters=25).collect()}
    assert r["hub"] == max(r.values())
    assert r["hub"] > r["b"] and r["hub"] > r["c"]


def test_pagerank_deterministic_across_partitionings(spark):
    rows = [(f"n{i}", f"n{(i * 7) % 23}", 1 + i % 3) for i in range(100)]
    e1 = _edges(spark, rows).repartition(1)
    e2 = _edges(spark, rows).repartition(16)
    r1 = sorted(map(tuple, pagerank_exact(e1, iters=4).collect()))
    r2 = sorted(map(tuple, pagerank_exact(e2, iters=4).collect()))
    assert r1 == r2  # quantized sums: bit-identical under any partitioning


def test_prefix_filter_equals_exhaustive(spark):
    docs = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy cat today"),
        (3, "completely different words appear in this document here now"),
        (4, "the quick brown fox jumps over the lazy dog today"),
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    got = prefix_filter_jaccard_pairs(d, "doc_id", "text", k=3).collect()
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in got}
    assert (1, 4) in pairs and pairs[(1, 4)] == 1.0  # identical docs
    assert (1, 2) in pairs  # one-word swap passes 0.6
    assert not any(3 in p for p in pairs)  # unrelated doc excluded
