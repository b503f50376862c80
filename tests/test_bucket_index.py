"""Persisted ANN bucket index (operators/similarity.py): bucket-
partitioned layout, sidecar version guard, compaction invariants
(r8 — verdict #3/#7 + ADVICE null-safe version check)."""

import os

import pytest
from pyspark.sql import functions as F

from etlalchemy_spark.operators.similarity import (
    append_bucket_index,
    bucket_index_version,
    compact_bucket_index,
    cosine_topk_lsh_exact,
    probe_bucket_index,
    read_index_version,
)

DIM = 8


def _corpus(spark, n=48):
    # deterministic pseudo-vectors, unit-free (cosine normalizes)
    rows = [
        (i, [float(((i * 37 + j * 11 + (i * j) % 13) % 19) - 9) for j in range(DIM)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, f"vec_id long, embedding array<double>")


def _qvec(df):
    return [float(x) for x in df.where(F.col("vec_id") == 0).collect()[0]["embedding"]]


def _res(df):
    return [(r.vec_id, r.rank) for r in df.orderBy("rank").collect()]


def test_append_probe_equals_one_shot_and_compaction_invariant(spark, tmp_path):
    emb = _corpus(spark)
    q = _qvec(emb)
    store = os.path.join(str(tmp_path), "store")

    append_bucket_index(store, emb.where(F.col("vec_id") % 2 == 0), "vec_id", "embedding", dim=DIM)
    append_bucket_index(store, emb.where(F.col("vec_id") % 2 == 1), "vec_id", "embedding", dim=DIM)
    one_shot = _res(cosine_topk_lsh_exact(emb, "vec_id", "embedding", 0, q, k=5))
    before = _res(probe_bucket_index(spark, store, emb, "vec_id", "embedding", q, k=5))
    assert before == one_shot, "append-built probe != built-at-once search"

    # replay a batch: probe unchanged (left-semi ignores dup rows)
    append_bucket_index(store, emb.where(F.col("vec_id") % 2 == 0), "vec_id", "embedding", dim=DIM)
    assert _res(probe_bucket_index(spark, store, emb, "vec_id", "embedding", q, k=5)) == one_shot

    stats = compact_bucket_index(spark, store, "vec_id")
    assert stats["rows_after"] == emb.count() < stats["rows_before"], stats
    after = _res(probe_bucket_index(spark, store, emb, "vec_id", "embedding", q, k=5))
    assert after == one_shot, "compaction changed the probe result"
    assert read_index_version(spark, store) == bucket_index_version(DIM, 6, 42)
    # layout: rows live under bucket=<b> partition directories
    assert any(d.startswith("bucket=") for d in os.listdir(store))


def test_probe_prunes_to_one_bucket_partition(spark, tmp_path):
    emb = _corpus(spark)
    q = _qvec(emb)
    store = os.path.join(str(tmp_path), "store")
    append_bucket_index(store, emb, "vec_id", "embedding", dim=DIM)

    probe = probe_bucket_index(spark, store, emb, "vec_id", "embedding", q, k=5)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "bucket" in plan, plan
    # the store scan must carry the bucket equality as a PARTITION
    # filter (directory pruning), not a post-scan row filter
    scan_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("bucket" in ln and "=" in ln for ln in scan_lines), scan_lines


def test_probe_works_for_unindexed_query_vector(spark, tmp_path):
    # the query no longer needs to be IN the store: its bucket is
    # computed decimal-exactly from the literal vector
    emb = _corpus(spark)
    store = os.path.join(str(tmp_path), "store")
    append_bucket_index(store, emb.where(F.col("vec_id") > 0), "vec_id", "embedding", dim=DIM)
    q = _qvec(emb)  # vec 0 is NOT indexed
    got = probe_bucket_index(
        spark, store, emb.where(F.col("vec_id") > 0), "vec_id", "embedding", q, k=5
    )
    assert got.count() >= 1


def test_version_guards_fail_loudly(spark, tmp_path):
    emb = _corpus(spark)
    q = _qvec(emb)
    store = os.path.join(str(tmp_path), "store")
    append_bucket_index(store, emb, "vec_id", "embedding", dim=DIM, seed=42)

    # append with different planes: refused at APPEND time
    with pytest.raises(ValueError, match="refusing to append"):
        append_bucket_index(store, emb, "vec_id", "embedding", dim=DIM, seed=99)

    # probe with different planes: sidecar mismatch, no data scan needed
    with pytest.raises(ValueError, match="expected"):
        probe_bucket_index(
            spark, store, emb, "vec_id", "embedding", q, k=5, seed=99
        )

    # unversioned store (sidecar removed): refused, not silently probed
    os.remove(os.path.join(store, "_INDEX_VERSION"))
    crc = os.path.join(store, "._INDEX_VERSION.crc")
    if os.path.exists(crc):
        os.remove(crc)
    with pytest.raises(ValueError, match="None"):
        probe_bucket_index(spark, store, emb, "vec_id", "embedding", q, k=5)
    with pytest.raises(ValueError, match="no version sidecar"):
        compact_bucket_index(spark, store, "vec_id")

    # tampered sidecar: mismatch
    with open(os.path.join(store, "_INDEX_VERSION"), "w") as fh:
        fh.write("hp:8:6:7:v1\n")
    with pytest.raises(ValueError, match="carries version"):
        probe_bucket_index(spark, store, emb, "vec_id", "embedding", q, k=5)


def test_compaction_rejects_null_version_rows(spark, tmp_path):
    # ADVICE r7 (low): a NULL idx_version must FAIL the audit — the old
    # `!= tag` filter dropped NULLs and waved corrupted stores through.
    emb = _corpus(spark)
    store = os.path.join(str(tmp_path), "store")
    append_bucket_index(store, emb, "vec_id", "embedding", dim=DIM)
    # inject a NULL-version row into an existing bucket directory
    bucket_dir = next(
        os.path.join(store, d) for d in os.listdir(store) if d.startswith("bucket=")
    )
    spark.createDataFrame([(999999, None)], "vec_id long, idx_version string").write.mode(
        "append"
    ).parquet(bucket_dir)
    with pytest.raises(ValueError, match="None"):
        compact_bucket_index(spark, store, "vec_id")


def test_swap_refuses_when_prior_crash_left_aside_dir(spark, tmp_path):
    # swap_directory must refuse to run over the debris of a crashed
    # compaction (the aside dir IS the recovery copy — clobbering it
    # would destroy the only intact store).
    emb = _corpus(spark)
    store = os.path.join(str(tmp_path), "store")
    append_bucket_index(store, emb, "vec_id", "embedding", dim=DIM)
    os.makedirs(store + "__precompact")
    with pytest.raises(ValueError, match="crashed mid-swap"):
        compact_bucket_index(spark, store, "vec_id")
    # live store untouched and still probeable after the refusal
    q = _qvec(emb)
    assert probe_bucket_index(spark, store, emb, "vec_id", "embedding", q, k=5).count() >= 1
