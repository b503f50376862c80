"""Incremental SemDeDup (operators/similarity.py semantic_dedup_step):
replay ≡ one-shot under ANY batch arrival order, store version guard,
and the streaming leg's equality with the batch pipeline."""

import itertools

import pytest
from pyspark.sql import functions as F

from etlalchemy_spark.operators.similarity import (
    semantic_cell_version,
    semantic_centroid_count,
    semantic_dedup_keep_first,
    semantic_dedup_step,
)

SF = "/root/testdata/sf0.001"
TH = 0.3


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _cents(spark, emb):
    k = semantic_centroid_count(emb.count())
    return emb.orderBy("vec_id").limit(k).select(
        F.col("vec_id").alias("_cid"), F.col("embedding").alias("_cvec")
    )


def _one_shot(spark, emb):
    return sorted(
        (r.vec_id, r.dup_of, r.n_dups)
        for r in semantic_dedup_keep_first(emb, "vec_id", "embedding", TH).collect()
    )


def _replay(spark, emb, cents, tag, order):
    """Run the step over 3 id-range slices in the given arrival order,
    store kept as in-memory union (same math as the parquet store)."""
    lo, hi = emb.agg(F.min("vec_id"), F.max("vec_id")).head()
    c1, c2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    slices = [
        emb.where(F.col("vec_id") <= c1),
        emb.where((F.col("vec_id") > c1) & (F.col("vec_id") <= c2)),
        emb.where(F.col("vec_id") > c2),
    ]
    store = None
    partials = []
    for i in order:
        drops, rows = semantic_dedup_step(
            store, slices[i], "vec_id", "embedding", cents, TH, tag
        )
        partials.append(drops)
        store = rows if store is None else store.unionByName(rows)
    allp = partials[0]
    for p in partials[1:]:
        allp = allp.unionByName(p)
    final = allp.groupBy("vec_id").agg(
        F.min("dup_of").alias("dup_of"), F.sum("n_dups").alias("n_dups")
    )
    return sorted((r.vec_id, r.dup_of, r.n_dups) for r in final.collect())


def test_replay_equals_one_shot_in_any_arrival_order(spark):
    emb = _emb(spark)
    cents = _cents(spark, emb)
    tag = semantic_cell_version(
        [r["_cid"] for r in cents.select("_cid").collect()], TH
    )
    expected = _one_shot(spark, emb)
    assert expected, "fixture produced no drops — test would be vacuous"
    for order in itertools.permutations(range(3)):
        got = _replay(spark, emb, cents, tag, list(order))
        assert got == expected, f"arrival order {order} diverged from one-shot"


def test_store_version_guard_fails_loudly(spark):
    emb = _emb(spark)
    cents = _cents(spark, emb)
    tag = semantic_cell_version([1, 2, 3], TH)
    _, rows = semantic_dedup_step(
        None, emb.limit(20), "vec_id", "embedding", cents, TH, tag
    )
    with pytest.raises(ValueError, match="version"):
        semantic_dedup_step(
            rows, emb.limit(5), "vec_id", "embedding", cents, TH, "semcells:other"
        )
    with pytest.raises(ValueError, match="unversioned"):
        semantic_dedup_step(
            rows.drop("cell_version"),
            emb.limit(5), "vec_id", "embedding", cents, TH, tag,
        )


def test_streaming_leg_equals_one_shot(spark):
    from etlalchemy_spark.registry import all_queries

    qs = all_queries()
    stream = sorted(
        (r.vec_id, r.dup_of, r.n_dups)
        for r in qs["stream_semantic_incremental"].fn(spark, SF).collect()
    )
    assert stream == _one_shot(spark, _emb(spark))
