"""Unit tests for similarity operators (planted-geometry vectors)."""

import math

import pytest
from pyspark.sql import functions as F

from etlalchemy_spark.operators.similarity import (
    cosine_topk_exact,
    cosine_topk_lsh,
    embedding_near_dup_pairs,
    exact_cosine,
    hyperplanes,
    ivf_topk,
)

DIM = 8


def _vec(*xs):
    return [float(x) for x in xs] + [0.0] * (DIM - len(xs))


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (0, _vec(1, 0)),            # query-aligned
        (1, _vec(0.9, 0.1)),        # close
        (2, _vec(0, 1)),            # orthogonal
        (3, _vec(-1, 0)),           # opposite
        (4, _vec(2, 0)),            # same direction, different norm
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_exact_cosine_values(spark, vecs):
    q = _vec(1, 0)
    out = {r.vec_id: r.cosine for r in
           cosine_topk_exact(vecs, "vec_id", "embedding", q, k=5).collect()}
    assert out[0] == pytest.approx(1.0)
    assert out[4] == pytest.approx(1.0)   # norm-invariant
    assert out[2] == pytest.approx(0.0, abs=1e-12)
    assert out[3] == pytest.approx(-1.0)
    assert out[1] == pytest.approx(0.9 / math.sqrt(0.81 + 0.01), rel=1e-6)


def test_topk_order_and_rank(spark, vecs):
    q = _vec(1, 0)
    rows = cosine_topk_exact(vecs, "vec_id", "embedding", q, k=3).collect()
    assert [r.vec_id for r in rows] == [0, 4, 1]  # ties broken by id
    assert [r.rank for r in rows] == [1, 2, 3]


def test_lsh_topk_contains_aligned(spark, vecs):
    q = _vec(1, 0)
    got = [r.vec_id for r in
           cosine_topk_lsh(vecs, "vec_id", "embedding", q, k=5, n_planes=4).collect()]
    assert 0 in got  # the query-identical vector shares every plane sign


def test_hyperplanes_deterministic():
    assert hyperplanes(4, 3, seed=1) == hyperplanes(4, 3, seed=1)
    assert hyperplanes(4, 3, seed=1) != hyperplanes(4, 3, seed=2)


def test_embedding_near_dup_pairs(spark, vecs):
    pairs = {(r.id_a, r.id_b) for r in
             embedding_near_dup_pairs(vecs, "vec_id", "embedding",
                                      threshold=0.95, n_planes=3, dim=DIM).collect()}
    assert (0, 4) in pairs  # cosine 1.0, same bucket by construction


def test_ivf_topk_probes_right_cell(spark, vecs):
    q = _vec(1, 0)
    centroids = [_vec(1, 0), _vec(0, 1)]
    got = [r.vec_id for r in
           ivf_topk(vecs, "vec_id", "embedding", q, centroids, k=3, n_probe=1).collect()]
    assert got[0] in (0, 4)
    assert 2 not in got  # orthogonal vector lives in the unprobed cell


def test_multiprobe_recall_beats_single_bucket(spark):
    """Multi-probe must recall at least as much of the exact top-10 as
    single-bucket LSH, and at least half of it in absolute terms."""
    from etlalchemy_spark.registry import all_queries

    from conftest import SF_DIR

    exact = {r.vec_id for r in all_queries()["sim_cosine_topk_exact"].fn(spark, SF_DIR).collect()}
    single = {r.vec_id for r in all_queries()["sim_cosine_topk_lsh"].fn(spark, SF_DIR).collect()}
    multi = {r.vec_id for r in all_queries()["sim_cosine_topk_lsh_multiprobe"].fn(spark, SF_DIR).collect()}
    assert len(multi & exact) >= len(single & exact)
    # deterministic hashing → stable: measured 6/10 at sf0.001, 4 planes
    assert len(multi & exact) >= 5


def test_kmeans_ivf_recall(spark):
    """Trained-centroid IVF with n_probe=2 should recover most of the
    exact top-10."""
    from etlalchemy_spark.registry import all_queries

    from conftest import SF_DIR

    exact = {r.vec_id for r in all_queries()["sim_cosine_topk_exact"].fn(spark, SF_DIR).collect()}
    ivf = {r.vec_id for r in all_queries()["sim_ivf_kmeans_topk"].fn(spark, SF_DIR).collect()}
    assert len(ivf & exact) >= 5


def test_zero_norm_and_null_vectors_degrade_not_crash(spark):
    """ANSI-mode hazards (r5 review): a zero-norm vector must score
    NULL (try_divide) and be dropped from the ranking, not abort the
    query with DIVIDE_BY_ZERO; NULL-probe rows must not break the dim
    probe."""
    from etlalchemy_spark.operators.similarity import (
        cosine_topk_exact,
        embedding_near_dup_pairs,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.6, 0.8]), (4, None)],
        "vec_id int, embedding array<double>",
    )
    top = cosine_topk_exact(df.where("vec_id != 4"), "vec_id", "embedding", [1.0, 0.0], k=4)
    rows = {r["vec_id"]: r["rank"] for r in top.collect()}
    assert rows == {1: 1, 3: 2}  # zero-norm row 2 dropped, no crash
    # NULL first row must not break the dim probe
    pairs = embedding_near_dup_pairs(
        df.where("vec_id = 4").unionByName(df.where("vec_id != 4")),
        "vec_id", "embedding", threshold=0.99,
    )
    assert pairs.count() == 0  # runs; no near-dups planted


def test_dim_mismatch_degrades_not_crashes(spark):
    from etlalchemy_spark.operators.similarity import exact_cosine

    df = spark.createDataFrame([(1, [1.0, 0.0, 5.0])], "id int, v array<double>")
    out = exact_cosine(df, ["id"], F.col("v"), F.array(F.lit(1.0), F.lit(0.0))).collect()
    # third position has no partner: try_element_at -> NULL term, sum skips
    assert out[0]["cosine"] is not None


def test_int8_quantized_topk_recall_vs_float_exact(spark):
    """The quantized sweep must stay a faithful candidate generator:
    top-10 by int8 cosine overlaps the float exact top-10 by >= 0.7
    on the fixture (scalar int8 typically costs only a few points of
    recall; a broken quantizer craters this immediately)."""
    from etlalchemy_spark.registry import all_queries

    from conftest import SF_DIR

    qs = all_queries()
    exact = {r.vec_id for r in qs["sim_cosine_topk_exact"].fn(spark, SF_DIR).collect()}
    int8 = {r.vec_id for r in qs["sim_int8_quantized_topk"].fn(spark, SF_DIR).collect()}
    assert len(exact) == len(int8) == 10
    assert len(exact & int8) / 10 >= 0.7


def test_int8_quantize_py_matches_engine():
    """Driver-side quantizer must equal the engine expression bit-for-
    bit (it feeds the query vector into the integer dot products)."""
    import math

    from etlalchemy_spark.operators.similarity import int8_quantize_py

    vec = [0.5, -0.25, 0.125, -1.0, 0.0, 0.3333333333333333]
    got = int8_quantize_py(vec)
    s = 1.0
    want = [math.floor(v / s * 127 + 0.5) for v in vec]
    assert got == want
    assert int8_quantize_py([0.0, 0.0]) == [0, 0]
    assert all(-127 <= x <= 127 for x in int8_quantize_py([3.7, -9.1, 0.004]))


def test_int8_quantize_properties_and_engine_parity(spark):
    """Property sweep: for any float vector, quantized values stay in
    [-127, 127], the max-|v| element maps to ±127 exactly (floor-half-
    up of ±127.0), and the engine expression agrees with the Python
    twin bit-for-bit (hypothesis-driven vectors incl. negatives,
    zeros, denormal-ish magnitudes)."""
    from hypothesis import given, settings, strategies as st

    from etlalchemy_spark.operators.similarity import int8_quantize, int8_quantize_py

    vecs = st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=8,
    )

    collected = []

    @settings(max_examples=30, deadline=None)
    @given(vecs)
    def check_py(vec):
        q = int8_quantize_py(vec)
        assert all(-127 <= x <= 127 for x in q)
        if any(v != 0 for v in vec):
            i = max(range(len(vec)), key=lambda j: abs(vec[j]))
            assert abs(q[i]) == 127
        else:
            assert q == [0] * len(vec)
        collected.append(vec)

    check_py()

    # engine parity on the hypothesis-generated corpus, one batch
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(collected)]
    df = spark.createDataFrame(rows, "id long, vec array<double>")
    got = {
        r.id: list(r.q)
        for r in df.select("id", int8_quantize("vec").alias("q")).collect()
    }
    want = {i: int8_quantize_py(v) for i, v in rows}
    assert got == want


def test_pq_adc_recall_vs_exact(spark):
    """PQ-ADC shortlist (top-100 in code space — ~20% of the ~500
    near-random fixture vectors, sized generously because neighbor
    margins here are ~0.05 cosine) + exact re-rank must recover
    nearly all of the exact cosine top-10 — the shortlist absorbs
    PQ's score distortion, so a miss means a true neighbor fell
    outside it entirely (a broken encoder or LUT craters this
    immediately)."""
    from etlalchemy_spark.registry import all_queries

    from conftest import SF_DIR

    exact = {
        r.vec_id
        for r in all_queries()["sim_cosine_topk_exact"].fn(spark, SF_DIR).collect()
    }
    pq = {r.vec_id for r in all_queries()["sim_pq_adc_topk"].fn(spark, SF_DIR).collect()}
    assert len(pq & exact) >= 8, f"PQ recall too low: {len(pq & exact)}/10"


def test_pq_codes_anchor_vectors_encode_to_themselves(spark):
    """Structural sanity for the exact encoder: each anchor vector's
    code in every subspace is its own anchor index (distance 0), and
    every (vec, subspace) emits exactly one code in [0, 16)."""
    from etlalchemy_spark.registry import all_queries

    from conftest import SF_DIR

    out = all_queries()["sim_pq_codes_exact"].fn(spark, SF_DIR)
    rows = out.collect()
    n_vec = len({r.vec_id for r in rows})
    assert len(rows) == n_vec * 8
    assert all(0 <= r.code < 16 for r in rows)
    anchor_ids = sorted({r.vec_id for r in rows})[:16]
    for i, vid in enumerate(anchor_ids):
        own = [r.code for r in rows if r.vec_id == vid]
        assert own == [i] * 8, f"anchor {vid} must encode to itself ({i}), got {own}"


def test_pq_training_sample_rate_is_deterministic_and_usable(spark):
    """The 100 TB lever: codebooks trained on a content-hash sample
    (stable across partitionings/retries) still drive a working ADC
    search, and two identical invocations yield bit-identical books."""
    from etlalchemy_spark.operators.similarity import (
        cosine_topk_exact,
        pq_adc_topk,
        pq_train_codebooks,
    )
    from etlalchemy_spark.queries.similarity import _query_vec

    from conftest import SF_DIR

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = _query_vec(spark, SF_DIR)
    b1 = pq_train_codebooks(emb, "vec_id", "embedding", n_codes=8, iters=2, sample_rate=0.5)
    b2 = pq_train_codebooks(emb, "vec_id", "embedding", n_codes=8, iters=2, sample_rate=0.5)
    assert b1 == b2, "sampled training must be deterministic"
    shortlist = pq_adc_topk(emb, "vec_id", "embedding", q, b1, k=50)
    cands = emb.join(shortlist.select("vec_id"), "vec_id", "left_semi")
    from pyspark.sql import functions as F  # noqa: F811

    out = cosine_topk_exact(cands, "vec_id", "embedding", q, k=10).collect()
    assert len(out) == 10 and out[0].vec_id == 0  # query finds itself
