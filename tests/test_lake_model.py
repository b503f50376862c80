"""Model-based lake-table test: a seeded random sequence of commits
(append / quarantine-gated dirty append / COW upsert incl. violating
changes / COW delete / DV delete / keyed DV delete / small-file
compaction / DV compaction / shallow clone / rollback) runs against
BOTH the real lake table and a trivial in-memory dict model; after
every commit the table read must equal the model, at the end every
historical version must still time-travel to its recorded state, and
every shallow clone taken along the way must still read its snapshot
(source commits never disturb a clone until vacuum). The table is
born with CHECK constraints so every writer's gate is exercised under
random interleaving, not just example-pinned (VERDICT r9 #7)."""

import random

import pytest
from pyspark.sql import functions as F

from etlalchemy_spark.operators.lake import (
    lake_append,
    lake_compact,
    lake_compact_dvs,
    lake_create,
    lake_delete,
    lake_delete_dv,
    lake_delete_dv_keys,
    lake_read,
    lake_rollback,
    lake_shallow_clone,
    lake_upsert,
    latest_version,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k long, v string") if rows else None


def _state(spark, root, version=None):
    return sorted((r.k, r.v) for r in lake_read(spark, root, version).collect())


@pytest.mark.parametrize("seed", [7, 23])
def test_lake_random_ops_match_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    root = str(tmp_path / f"tbl{seed}")
    next_key = 100
    model: dict[int, str] = {i: f"v{i}" for i in range(8)}
    lake_create(
        spark, root, spark.createDataFrame(sorted(model.items()), "k long, v string"),
        "k", constraints=["v IS NOT NULL", "k >= 0"],
    )
    history = {1: sorted(model.items())}
    clones: list[tuple[str, list]] = []

    def fresh_rows(n):
        nonlocal next_key
        rows = [(next_key + i, f"n{next_key + i}") for i in range(n)]
        next_key += n
        return rows

    for step in range(24):
        op = rng.choice(
            ["append", "append_dirty", "upsert", "upsert_dirty", "delete",
             "delete_dv", "delete_dv_keys", "compact", "compact_dvs",
             "shallow_clone", "rollback"]
        )
        if op == "append":
            rows = fresh_rows(rng.randint(1, 3))
            lake_append(spark, root, _mk(spark, rows))
            model.update(rows)
        elif op == "append_dirty":
            # one violating row rides along: quarantine admits the rest
            rows = fresh_rows(rng.randint(1, 2))
            dirty = rows + [(next_key + 50_000 + step, None)]
            lake_append(spark, root, _mk(spark, dirty), on_violation="quarantine")
            model.update(rows)
        elif op == "upsert_dirty":
            # a violating CHANGE row must be quarantined by MERGE too
            # (r10: upsert joined the one constraint gate)
            updates = [
                (k, f"q{step}_{k}")
                for k in rng.sample(sorted(model), min(1, len(model)))
            ]
            dirty = updates + [(next_key + 60_000 + step, None)]
            lake_upsert(spark, root, _mk(spark, dirty), on_violation="quarantine")
            model.update(updates)
        elif op == "shallow_clone":
            dst = str(tmp_path / f"clone{seed}_{step}")
            lake_shallow_clone(spark, root, dst)
            clones.append((dst, sorted(model.items())))
        elif op == "upsert":
            updates = [
                (k, f"u{step}_{k}")
                for k in rng.sample(sorted(model), min(2, len(model)))
            ] + fresh_rows(1)
            lake_upsert(spark, root, _mk(spark, updates))
            model.update(updates)
        elif op == "delete":
            m = rng.randint(2, 5)
            lake_delete(spark, root, f"k % {m} = 1")
            model = {k: v for k, v in model.items() if not (k % m == 1)}
        elif op == "delete_dv":
            m = rng.randint(2, 5)
            lake_delete_dv(spark, root, f"k % {m} = 0")
            model = {k: v for k, v in model.items() if not (k % m == 0)}
        elif op == "delete_dv_keys":
            keys = rng.sample(sorted(model), min(2, len(model))) if model else []
            kdf = spark.createDataFrame([(k,) for k in keys] or [(-1,)], "k long")
            lake_delete_dv_keys(spark, root, kdf)
            for k in keys:
                model.pop(k, None)
        elif op == "compact":
            lake_compact(spark, root, small_rows=10**9, target_partitions=1)
        elif op == "compact_dvs":
            lake_compact_dvs(spark, root)
        elif op == "rollback":
            target = rng.choice(sorted(history))
            lake_rollback(spark, root, target)
            model = dict(history[target])
        v = latest_version(spark, root)
        history[v] = sorted(model.items())
        assert _state(spark, root) == history[v], f"step {step} op {op} v {v}"

    # every recorded version still time-travels to its exact state
    for v, expect in history.items():
        assert _state(spark, root, v) == expect, f"time travel v {v}"

    # every clone still reads the snapshot it was taken from, despite
    # all the source commits after it (zero-copy immutability), keeps
    # ENFORCING the source's constraints, and a commit to a clone
    # never leaks back into the source
    final_src = _state(spark, root)
    for i, (dst, expect) in enumerate(clones):
        assert _state(spark, dst) == expect, f"clone {dst} drifted"
        if i == 0:
            lake_append(
                spark, dst, _mk(spark, [(999_999, None)]), on_violation="quarantine"
            )
            lake_append(spark, dst, _mk(spark, [(999_998, "cl")]))
            assert (999_998, "cl") in _state(spark, dst)
            assert _state(spark, root) == final_src
