"""Property-based check of as-of join semantics vs Python brute force:
for each left row, the latest right row with right.ts <= left.ts in
the same key (inclusive at equality), NULLed when staler than the
tolerance. Random timestamps deliberately include exact left==right
ties and multi-row pileups per key. Right (key, ts) pairs are unique
by construction — the operator (like pandas merge_asof) leaves ties
among identical right timestamps unspecified."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from etlalchemy_spark.operators.asof import asof_join

_TS0 = 1_700_000_000  # epoch seconds base

_lefts = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 40)),  # (key, ts offset s)
    min_size=1,
    max_size=12,
)
_rights = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 40), st.integers(0, 999)),
    min_size=0,
    max_size=12,
    unique_by=lambda t: (t[0], t[1]),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lefts=_lefts, rights=_rights, use_tol=st.booleans())
def test_asof_join_matches_brute_force(spark, lefts, rights, use_tol):
    tol_s = 10
    left = spark.createDataFrame(
        [(i, k, _TS0 + o) for i, (k, o) in enumerate(lefts)],
        "lid int, k int, ts_s long",
    ).select("lid", "k", F.timestamp_seconds("ts_s").alias("ts"))
    right = spark.createDataFrame(
        [(k, _TS0 + o, p) for k, o, p in rights] or [],
        "k int, rts_s long, payload int",
    ).select("k", F.timestamp_seconds("rts_s").alias("rts"), "payload")

    out = asof_join(
        left,
        right,
        on="k",
        left_ts="ts",
        right_ts="rts",
        payload_cols=["payload"],
        tolerance=f"{tol_s} seconds" if use_tol else None,
    )
    got = {r["lid"]: r["asof_payload"] for r in out.collect()}

    want = {}
    for i, (k, o) in enumerate(lefts):
        cands = [(ro, p) for rk, ro, p in rights if rk == k and ro <= o]
        if not cands:
            want[i] = None
            continue
        ro, p = max(cands)  # unique (key, ts) → unambiguous latest
        if use_tol and ro < o - tol_s:
            want[i] = None
        else:
            want[i] = p
    assert got == want
