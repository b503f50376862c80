"""MERGE upsert (operators/merge.py): semantics of the three WHEN arms
and the scale contract — untouched partitions are neither read nor
rewritten (their files stay byte-identical on disk)."""

import hashlib
import os

from pyspark.sql import functions as F

from etlalchemy_spark.operators.merge import merge_upsert


def _files(root):
    out = {}
    for dirpath, _dirs, names in os.walk(root):
        for n in names:
            if n.endswith(".parquet"):
                p = os.path.join(dirpath, n)
                with open(p, "rb") as fh:
                    out[os.path.relpath(p, root)] = hashlib.md5(fh.read()).hexdigest()
    return out


def _base(spark):
    rows = [(k, f"v{k}", k % 3) for k in range(30)]  # partitions p=0,1,2
    return spark.createDataFrame(rows, "k long, val string, p int")


def test_merge_arms_and_untouched_partitions_byte_identical(spark, tmp_path):
    target = os.path.join(str(tmp_path), "tgt")
    _base(spark).write.partitionBy("p").parquet(target)
    before = _files(target)

    # changes confined to partition 1: update k=1, delete k=4,
    # insert k=100, conflicting insert k=7 (must keep target),
    # update for absent k=103 (must no-op)
    changes = spark.createDataFrame(
        [
            (1, "updated", 1, "U"),
            (4, "whatever", 1, "D"),
            (100, "fresh", 1, "I"),
            (7, "conflict", 1, "I"),
            (103, "ghost", 1, "U"),
        ],
        "k long, val string, p int, op string",
    )
    merge_upsert(spark, target, changes, key="k", part_col="p")

    after = _files(target)
    untouched_before = {f: h for f, h in before.items() if "p=1" not in f}
    untouched_after = {f: h for f, h in after.items() if "p=1" not in f}
    assert untouched_before == untouched_after, "untouched partitions were rewritten"
    assert {f for f in before if "p=1" in f} != {f for f in after if "p=1" in f} or any(
        before[f] != after.get(f) for f in before if "p=1" in f
    ), "touched partition should have new files"

    got = {r.k: r.val for r in spark.read.parquet(target).collect()}
    want = {k: f"v{k}" for k in range(30) if k != 4}  # delete applied
    want[1] = "updated"
    want[100] = "fresh"  # insert applied; k=7 conflict kept target v7
    assert got == want
    # partition column survives the dynamic overwrite correctly
    p_of = {r.k: r.p for r in spark.read.parquet(target).collect()}
    assert p_of[100] == 1 and p_of[1] == 1 and p_of[0] == 0


def test_merge_only_touched_partitions_scanned(spark, tmp_path):
    # The target scan must carry the partition-pruning IN filter —
    # partitions outside the change set never enter the join. Pinned
    # via the pre-write logical plan built the same way merge_upsert
    # builds it (the operator writes eagerly, so we reconstruct the
    # pruned read and check the filter reaches the scan).
    target = os.path.join(str(tmp_path), "tgt2")
    _base(spark).write.partitionBy("p").parquet(target)
    pruned = spark.read.parquet(target).where(F.col("p").isin([1]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "p#" in plan
    # count proves pruning semantics: only partition-1 rows
    assert pruned.count() == 10


def test_merge_validates_change_columns(spark, tmp_path):
    import pytest

    target = os.path.join(str(tmp_path), "tgt3")
    _base(spark).write.partitionBy("p").parquet(target)
    bad = spark.createDataFrame([(1, 1)], "k long, p int")  # no val/op
    with pytest.raises(ValueError, match="missing columns"):
        merge_upsert(spark, target, bad, key="k", part_col="p")


def test_upsert_latest_batch_order_invariant(spark, tmp_path):
    """The seq guard makes replay deterministic: applying change
    batches in ANY order (even fully reversed, with re-delivered
    rows) must converge to the global max-seq snapshot."""
    import itertools

    from etlalchemy_spark.operators.merge import upsert_latest

    # 6 keys, 3 changes each, seq unique; 'deleted' tombstones ride along
    changes = [
        (k, seq, f"v{k}_{seq}", seq % 4 == 3, k % 2)
        for k in range(6)
        for seq in (k, k + 10, k + 20)
    ]
    schema = "k long, seq long, val string, deleted boolean, p int"
    want = {k: (k + 20, f"v{k}_{k + 20}") for k in range(6)}  # max seq wins

    batches = [changes[0::3], changes[1::3], changes[2::3]]
    for perm_i, perm in enumerate(itertools.permutations(range(3))):
        target = os.path.join(str(tmp_path), f"t{perm_i}")
        for bi in perm:
            # re-deliver one batch to prove idempotence under retries
            rows = batches[bi] + (batches[bi][:2] if bi == 0 else [])
            df = (
                spark.createDataFrame(rows, schema)
                .groupBy("k")
                .agg(F.max(F.struct("seq", "val", "deleted", "p")).alias("m"))
                .select("k", "m.seq", "m.val", "m.deleted", "m.p")
            )
            upsert_latest(spark, target, df, key="k", part_col="p", seq_col="seq")
        got = {r.k: (r.seq, r.val) for r in spark.read.parquet(target).collect()}
        assert got == want, f"permutation {perm} diverged"


def test_merge_delete_empties_partition_directory(spark, tmp_path):
    # ADVICE r6 (medium): with partitionOverwriteMode=dynamic the write
    # only rewrites partitions present in the merged OUTPUT — a delete
    # arm that removes every row of a partition would leave the old
    # files on disk and the rows reappear. merge_upsert must remove the
    # emptied partition directory explicitly.
    target = os.path.join(str(tmp_path), "tgt_empty")
    # partition 5 holds exactly two rows; partition 6 holds two more
    rows = [(1, "a", 5), (2, "b", 5), (3, "c", 6), (4, "d", 6)]
    spark.createDataFrame(rows, "k long, val string, p int").write.partitionBy(
        "p"
    ).parquet(target)

    changes = spark.createDataFrame(
        [(1, "x", 5, "D"), (2, "x", 5, "D"), (3, "updated", 6, "U")],
        "k long, val string, p int, op string",
    )
    merge_upsert(spark, target, changes, key="k", part_col="p")

    back = spark.read.parquet(target)
    got = {(r.k, r.val, r.p) for r in back.collect()}
    assert got == {(3, "updated", 6), (4, "d", 6)}, "deleted rows reappeared"
    assert not os.path.exists(os.path.join(target, "p=5")), (
        "emptied partition directory must be removed"
    )
    assert os.path.exists(os.path.join(target, "p=6"))


def test_merge_null_partition_rows_survive_partial_change(spark, tmp_path):
    # ADVICE r7 (high): isin(touched) evaluates NULL for NULL partition
    # values, so target rows in the NULL partition were never loaded
    # into the join — and when the change set touched that partition
    # without re-emitting them, the partition read as "emptied" and
    # _delete_partition_dirs removed __HIVE_DEFAULT_PARTITION__ with
    # live rows inside. The null-safe touched filter must load them.
    target = os.path.join(str(tmp_path), "tgt_nullpart")
    rows = [(10, "keep", None), (11, "other", None), (1, "a", 0)]
    spark.createDataFrame(rows, "k long, val string, p int").write.partitionBy(
        "p"
    ).parquet(target)

    changes = spark.createDataFrame(
        [(10, "x", None, "D"), (1, "updated", 0, "U")],
        "k long, val string, p int, op string",
    )
    merge_upsert(spark, target, changes, key="k", part_col="p")

    got = {(r.k, r.val, r.p) for r in spark.read.parquet(target).collect()}
    assert got == {(11, "other", None), (1, "updated", 0)}, (
        "NULL-partition target row not re-emitted by the change set was lost"
    )
    assert os.path.exists(os.path.join(target, "p=__HIVE_DEFAULT_PARTITION__"))


def test_merge_null_partition_genuinely_emptied_is_deleted(spark, tmp_path):
    # The converse must still hold: when the delete arm removes EVERY
    # NULL-partition row, the __HIVE_DEFAULT_PARTITION__ directory is
    # cleaned up like any other emptied partition.
    target = os.path.join(str(tmp_path), "tgt_nullpart2")
    rows = [(10, "a", None), (11, "b", None), (1, "a", 0)]
    spark.createDataFrame(rows, "k long, val string, p int").write.partitionBy(
        "p"
    ).parquet(target)

    changes = spark.createDataFrame(
        [(10, "x", None, "D"), (11, "x", None, "D")],
        "k long, val string, p int, op string",
    )
    merge_upsert(spark, target, changes, key="k", part_col="p")

    got = {(r.k, r.val, r.p) for r in spark.read.parquet(target).collect()}
    assert got == {(1, "a", 0)}
    assert not os.path.exists(os.path.join(target, "p=__HIVE_DEFAULT_PARTITION__"))


def test_merge_preserves_null_key_target_rows(spark, tmp_path):
    # ADVICE r6: a NULL-key target row must ride through the merge
    # untouched — side membership is decided by presence markers, so a
    # NULL target key can never be classified as an unmatched change
    # row (which the op-is-NULL arithmetic silently deleted before).
    target = os.path.join(str(tmp_path), "tgt_nullkey")
    rows = [(1, "a", 0), (None, "nullkey", 0), (2, "b", 0)]
    spark.createDataFrame(rows, "k long, val string, p int").write.partitionBy(
        "p"
    ).parquet(target)

    changes = spark.createDataFrame(
        [(1, "updated", 0, "U"), (None, "ghost", 0, "I")],
        "k long, val string, p int, op string",
    )
    merge_upsert(spark, target, changes, key="k", part_col="p")

    got = {(r.k, r.val) for r in spark.read.parquet(target).collect()}
    # NULL-key change row dropped (no identity); NULL-key target row kept
    assert got == {(1, "updated"), (None, "nullkey"), (2, "b")}
