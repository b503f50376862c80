"""Property-based round-trip checks for the type standardizer
(SURVEY.md §5.2): whatever narrowing `decide` picks, casting must lose
no value — for ANY data, including sign edges, type-boundary values,
NULLs, and all-NULL columns."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from etlalchemy_spark.operators.standardize import standardize, varchar_metadata

_EDGES = [-(2**31), -(2**31) - 1, -(2**15), -129, -128, -1, 0, 1, 127, 128, 255, 256,
          2**15 - 1, 2**15, 2**31 - 1, 2**31, 2**53]
ints = st.one_of(
    st.sampled_from(_EDGES),
    st.integers(min_value=-(2**62), max_value=2**62),
    st.none(),
)
strings = st.one_of(st.text(max_size=40), st.none())


@settings(max_examples=20, deadline=None)
@given(st.lists(st.tuples(ints, strings), min_size=1, max_size=12))
def test_downsize_roundtrip_lossless(spark, rows):
    df = spark.createDataFrame(rows, "v long, s string")
    out, decisions = standardize(df)
    before = [r.v for r in df.select("v").collect()]
    if "v" in out.columns:
        after = [r.v for r in out.select("v").collect()]
        assert sorted(x for x in before if x is not None) == sorted(
            x for x in after if x is not None
        ), f"downsize lost values (decisions={decisions})"
        assert before.count(None) == after.count(None)
    else:
        # eliminated → must have been all-NULL
        assert all(v is None for v in before)

    # VARCHAR sizing: every observed string fits the declared width
    meta = varchar_metadata(decisions)
    if "s" in meta:
        maxlen = max((len(s) for _, s in rows if s is not None), default=0)
        assert meta["s"] >= maxlen


@settings(max_examples=10, deadline=None)
@given(st.lists(st.sampled_from([0, 1, None]), min_size=1, max_size=8))
def test_boolean_inference_roundtrips(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "b long")
    out, _ = standardize(df)
    if "b" in out.columns:
        got = [None if r.b is None else int(r.b) for r in out.select("b").collect()]
        assert sorted((x for x in got if x is not None)) == sorted(
            x for x in vals if x is not None
        )
