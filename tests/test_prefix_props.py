"""Property-based equivalence proof for the scalable global-order
operators (operators/prefix.py): on random adversarial data —
duplicate keys, pileups, all-equal keys, NULLs, tiny and skewed
distributions — the range-bucketed two-phase decomposition must match
the naive unpartitioned window EXACTLY. The example tests in
test_prefix.py pin known shapes; this searches for boundary bugs
(ties straddling bucket edges, empty buckets, null routing)."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Window, functions as F

from etlalchemy_spark.operators.prefix import (
    global_ranks,
    running_global_max,
    running_global_sum,
)

# few distinct key values → heavy ties; include None for NULL routing
_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(0, 6)),  # key with pileups
        st.integers(-50, 50),  # value
    ),
    min_size=1,
    max_size=40,
)


def _df(spark, rows):
    data = [(i, k, v) for i, (k, v) in enumerate(rows)]
    return spark.createDataFrame(data, "tid long, k long, v long").repartition(8)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_rows)
def test_global_ranks_match_naive_window(spark, rows):
    df = _df(spark, rows)
    got = {
        r["tid"]: (r["rn"], r["rnk"], r["drnk"])
        for r in global_ranks(df, F.col("k"), ["tid"], n_buckets=4).collect()
    }
    w_rn = Window.orderBy(F.col("k"), F.col("tid"))
    w_key = Window.orderBy(F.col("k"))
    want = {
        r["tid"]: (r["rn"], r["rnk"], r["drnk"])
        for r in df.withColumn("rn", F.row_number().over(w_rn))
        .withColumn("rnk", F.rank().over(w_key))
        .withColumn("drnk", F.dense_rank().over(w_key))
        .collect()
    }
    assert got == want


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_rows)
def test_running_global_sum_and_max_match_naive_window(spark, rows):
    df = _df(spark, [(k, v) for k, v in rows if k is not None] or [(0, 0)])
    got_sum = {
        r["tid"]: r["running"]
        for r in running_global_sum(
            df, F.col("k"), ["tid"], F.col("v").cast("decimal(18,0)"), n_buckets=4
        ).collect()
    }
    got_max = {
        r["tid"]: r["running_max"]
        for r in running_global_max(
            df, F.col("k"), ["tid"], F.col("v"), n_buckets=4
        ).collect()
    }
    w = (
        Window.orderBy(F.col("k"), F.col("tid"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    naive = (
        df.withColumn("s", F.sum(F.col("v").cast("decimal(18,0)")).over(w))
        .withColumn("m", F.max("v").over(w))
        .collect()
    )
    want_sum = {r["tid"]: r["s"] for r in naive}
    want_max = {r["tid"]: r["m"] for r in naive}
    assert {k: int(v) for k, v in got_sum.items()} == {
        k: int(v) for k, v in want_sum.items()
    }
    assert got_max == want_max
