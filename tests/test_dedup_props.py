"""Property-based recall proofs for the dedup operators that claim
COMPLETENESS (not approximation):

- prefix_filter_jaccard_pairs documents itself lossless: exactly the
  pairs an exhaustive join would return. Checked against a Python
  brute force over random small documents.
- simhash_pairs_from_sigs claims TOTAL recall for hamming <= 3 via the
  4x8-bit pigeonhole. Checked against brute-force hamming over random
  32-bit signatures.

Probabilistic operators (MinHash-LSH banding) are excluded on purpose
— their recall is tunable, not total, and their exactness is already
oracle-gated end to end."""

import itertools
import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etlalchemy_spark.operators.dedup import (
    prefix_filter_jaccard_pairs,
    simhash_pairs_from_sigs,
)

_VOCAB = [f"w{i}" for i in range(12)]  # tiny vocab forces collisions

_docs = st.lists(
    st.lists(st.sampled_from(_VOCAB), min_size=3, max_size=12).map(" ".join),
    min_size=2,
    max_size=8,
)


def _shingles(text: str, k: int) -> set:
    words = text.split()
    if len(words) <= k:
        return {" ".join(words[:k])} if words else set()
    return {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_docs)
def test_prefix_filter_is_lossless(spark, texts):
    k, num, den = 2, 3, 5
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in prefix_filter_jaccard_pairs(
            df, "doc_id", "text", k=k, theta_num=num, theta_den=den
        ).collect()
    }
    want = {}
    sh = {i: _shingles(t, k) for i, t in enumerate(texts)}
    for a, b in itertools.combinations(sorted(sh), 2):
        if not sh[a] or not sh[b]:
            continue
        inter = len(sh[a] & sh[b])
        union = len(sh[a]) + len(sh[b]) - inter
        # integer cross-multiplied threshold, same as the operator
        if den * inter >= num * union:
            want[(a, b)] = inter / union
    assert set(got) == set(want), (
        f"prefix filter lost/invented pairs: got {sorted(got)}, "
        f"want {sorted(want)}"
    )
    for pair, j in want.items():
        assert math.isclose(got[pair], j, rel_tol=1e-12)


_sigs = st.lists(
    st.integers(min_value=0, max_value=(1 << 32) - 1),
    min_size=2,
    max_size=12,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sigs=_sigs)
def test_simhash_chunk_banding_total_recall_h3(spark, sigs):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sigs)], "id int, simhash long"
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_pairs_from_sigs(df, "id", max_hamming=3).collect()
    }
    want = {}
    for a, b in itertools.combinations(range(len(sigs)), 2):
        h = bin(sigs[a] ^ sigs[b]).count("1")
        if h <= 3:
            want[(a, b)] = h
    assert got == want, (
        f"pigeonhole banding missed/invented pairs: got {got}, want {want}"
    )
