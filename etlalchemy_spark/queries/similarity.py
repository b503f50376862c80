"""Similarity-search queries over the embeddings table.

The exact brute-force cosine top-k carries a DuckDB oracle (decimal
dot products — see operators.similarity); the LSH / IVF variants are
the scale path and rows-only.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etlalchemy_spark.operators.similarity import (
    cosine_topk_exact,
    cosine_topk_lsh,
    exact_cosine,
    ivf_topk,
)
from etlalchemy_spark.registry import register
from etlalchemy_spark.queries._util import t


def _query_vec(spark, sf_dir, vec_id: int = 0) -> list[float]:
    """The query vector = embedding of vec_id (collect of ONE row —
    an aggregate-sized result, not a data pull)."""
    emb = t(spark, sf_dir, "embeddings")
    return list(emb.where(F.col("vec_id") == vec_id).head()["embedding"])


def _spread_embeddings(spark, sf_dir):
    """embeddings, round-robin repartitioned to full parallelism before
    a map-heavy exact-cosine / quantization stage: the gate-scale table
    is ONE parquet row group, so the per-vector decimal dot-product
    batteries (hundreds of exact decimal multiplies per row, more per
    candidate pair) otherwise run fused to a single scan task (the
    _spread_docs finding, r13 optimization round — measured at sf0.1:
    dedup_semantic_keep_first 17.5 s -> 8.9 s, dedup_embedding_
    cosine_exact 5.7 -> 1.6, sim_ivf_topk_exact 2.8 -> 1.3,
    sim_int8_quantized_topk 2.2 -> 1.3, sim_knn_batch_exact
    9.8 -> ~1, see its docstring). Used only by queries whose
    exact-arithmetic map stage measurably dominates — NOT the
    index-store build/compaction queries (write-dominated, measured
    neutral-to-worse). r14: routed through the footer-guarded
    catalog.load_table_spread so the exchange exists only when the
    scan is actually under-split (a well-split lake table passes
    through untouched — no second pass over the corpus)."""
    from etlalchemy_spark.catalog import load_table_spread

    return load_table_spread(spark, sf_dir, "embeddings")


_TOPK_SQL = """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
prod AS (
  SELECT e.vec_id,
         SUM(CAST(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))
             * CAST(CAST(q.qe[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))) AS dot,
         SUM(CAST(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))
             * CAST(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))) AS na,
         SUM(CAST(CAST(q.qe[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))
             * CAST(CAST(q.qe[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))) AS nb
  FROM embeddings e, q, generate_series(1, 64) AS t(i)
  GROUP BY e.vec_id
),
scored AS (
  SELECT vec_id,
         CAST(ROUND(dot, 12) AS DOUBLE) / (SQRT(CAST(ROUND(na, 12) AS DOUBLE)) * SQRT(CAST(ROUND(nb, 12) AS DOUBLE))) AS cosine
  FROM prod
)
SELECT vec_id, cosine,
       CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id) AS INT) AS rank
FROM scored
ORDER BY cosine DESC, vec_id
LIMIT 10
"""


@register("sim_cosine_topk_exact", oracle=_TOPK_SQL, tags=("similarity", "bench"))
def sim_cosine_topk_exact(spark, sf_dir):
    """Brute-force cosine top-10 for vec_id 0's embedding. Decimal dot
    products make Spark and DuckDB bit-identical; final sqrt/divide in
    double on identical operands."""
    emb = t(spark, sf_dir, "embeddings")
    return cosine_topk_exact(emb, "vec_id", "embedding", _query_vec(spark, sf_dir), k=10)


@register("sim_cosine_topk_lsh", oracle=None, tags=("similarity", "approx"))
def sim_cosine_topk_lsh(spark, sf_dir):
    """Hyperplane-LSH bucketed top-10 (approximate; bucket filter cuts
    candidates ~2^8 before exact scoring). Rows-only."""
    emb = t(spark, sf_dir, "embeddings")
    return cosine_topk_lsh(
        emb, "vec_id", "embedding", _query_vec(spark, sf_dir), k=10, n_planes=8
    )


@register("sim_ivf_topk", oracle=None, tags=("similarity", "approx"))
def sim_ivf_topk(spark, sf_dir):
    """IVF-flat top-10: centroids = first 8 embeddings (deterministic
    stand-in for a k-means fit), probe the 2 nearest cells. Rows-only."""
    emb = t(spark, sf_dir, "embeddings")
    centroids = [
        list(r["embedding"])
        for r in emb.where(F.col("vec_id") < 8).orderBy("vec_id").collect()
    ]
    return ivf_topk(
        emb, "vec_id", "embedding", _query_vec(spark, sf_dir), centroids, k=10, n_probe=2
    )


_PAIRS_SQL = """
WITH prod AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         SUM(CAST(CAST(a.embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))
             * CAST(CAST(b.embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))) AS dot,
         SUM(CAST(CAST(a.embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))
             * CAST(CAST(a.embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))) AS na,
         SUM(CAST(CAST(b.embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))
             * CAST(CAST(b.embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))) AS nb
  FROM embeddings a
  JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
  CROSS JOIN generate_series(1, 64) AS t(i)
  WHERE a.vec_id < 40 AND b.vec_id < 40
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       CAST(ROUND(dot, 12) AS DOUBLE) / (SQRT(CAST(ROUND(na, 12) AS DOUBLE)) * SQRT(CAST(ROUND(nb, 12) AS DOUBLE))) AS cosine
FROM prod
WHERE CAST(ROUND(dot, 12) AS DOUBLE) / (SQRT(CAST(ROUND(na, 12) AS DOUBLE)) * SQRT(CAST(ROUND(nb, 12) AS DOUBLE))) >= 0.2
"""


@register("sim_cosine_pairs_blocked", oracle=_PAIRS_SQL, tags=("similarity",))
def sim_cosine_pairs_blocked(spark, sf_dir):
    """Blocked exact pair similarity: candidate pairs share a label
    (the blocking key — at scale this is the LSH bucket), exact cosine
    ≥ 0.2 on a bounded id range. Oracle-exact via decimal dots."""
    emb = t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 40)
    a = emb.select(
        F.col("vec_id").alias("id_a"), F.col("label"), F.col("embedding").alias("va")
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"), F.col("label"), F.col("embedding").alias("vb")
    )
    pairs = a.join(b, "label").where(F.col("id_a") < F.col("id_b"))
    return (
        exact_cosine(pairs, ["id_a", "id_b"], F.col("va"), F.col("vb"))
        .where(F.col("cosine") >= 0.2)
        .select("id_a", "id_b", "cosine")
    )


@register("sim_ivf_kmeans_topk", oracle=None, tags=("similarity", "approx", "iterative"))
def sim_ivf_kmeans_topk(spark, sf_dir):
    """IVF with TRAINED cells: 3 Lloyd iterations of pure-DataFrame
    k-means fit the 8 centroids, then probe the 2 nearest cells.
    Rows-only (recall vs exact pinned in tests/test_similarity.py).
    The trained k×dim codebook is the production artifact — train
    once, probe many — so it caches as fixture meta under a content
    tag (VERDICT r9 #2); the probe always runs live."""
    from etlalchemy_spark.operators import similarity as _sim_mod
    from etlalchemy_spark.operators.similarity import kmeans_centroids
    from etlalchemy_spark.queries._util import (
        cached_fixture,
        commit_fixture,
        fixture_tag,
    )

    emb = t(spark, sf_dir, "embeddings")
    tag = fixture_tag(sf_dir, deps=(_sim_mod,), extra="ivf_kmeans:k8:i3")
    root, meta = cached_fixture("ivf_kmeans", sf_dir, tag)
    if meta is None:
        centroids = kmeans_centroids(emb, "embedding", k=8, iters=3, id_col="vec_id")
        commit_fixture(root, tag, meta={"centroids": centroids})
    else:
        centroids = meta["centroids"]
    return ivf_topk(
        emb, "vec_id", "embedding", _query_vec(spark, sf_dir), centroids, k=10, n_probe=2
    )


@register("sim_cosine_topk_lsh_multiprobe", oracle=None, tags=("similarity", "approx"))
def sim_cosine_topk_lsh_multiprobe(spark, sf_dir):
    """Multi-probe LSH top-10 (query bucket + all Hamming-1 buckets).
    4 planes: 5 of 16 buckets probed (~31% of rows scored) — the recall
    sweet spot for weakly-clustered embeddings; raise planes only when
    the corpus has real neighbor structure."""
    from etlalchemy_spark.operators.similarity import cosine_topk_lsh_multiprobe

    emb = t(spark, sf_dir, "embeddings")
    return cosine_topk_lsh_multiprobe(
        emb, "vec_id", "embedding", _query_vec(spark, sf_dir), k=10, n_planes=4
    )


# --- oracle-exact hyperplane LSH -------------------------------------------

from etlalchemy_spark.operators.similarity import (  # noqa: E402
    cosine_topk_lsh_exact,
    hyperplanes,
)

_LSH_N_PLANES = 6
_LSH_PLANES = hyperplanes(64, _LSH_N_PLANES, seed=42)


def _plane_lit_sql(p: list[float]) -> str:
    vals = ", ".join(repr(float(v)) for v in p)
    return f"[{vals}]"


def _lsh_exact_sql() -> str:
    """Oracle twin of cosine_topk_lsh_exact: decimal-exact plane dots →
    bucket bits → query-bucket candidates → decimal-exact cosine
    top-10. Plane literals are the same Python-generated doubles the
    Spark plan bakes in."""
    dot_aggs = ",\n         ".join(
        "SUM(CAST(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))"
        f" * CAST(CAST(({_plane_lit_sql(p)})[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))) AS d{j}"
        for j, p in enumerate(_LSH_PLANES)
    )
    bucket = " + ".join(
        f"(CASE WHEN d{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(_LSH_N_PLANES)
    )
    return f"""
WITH pd AS (
  SELECT e.vec_id,
         {dot_aggs}
  FROM embeddings e, generate_series(1, 64) AS t(i)
  GROUP BY e.vec_id
), bkt AS (
  SELECT vec_id, CAST({bucket} AS INT) AS bucket FROM pd
), qb AS (
  SELECT bucket AS qbucket FROM bkt WHERE vec_id = 0
), cand AS (
  SELECT b.vec_id FROM bkt b, qb WHERE b.bucket = qb.qbucket
), q AS (
  SELECT embedding AS qe FROM embeddings WHERE vec_id = 0
), prod AS (
  SELECT e.vec_id,
         SUM(CAST(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))
             * CAST(CAST(q.qe[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))) AS dot,
         SUM(CAST(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))
             * CAST(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))) AS na,
         SUM(CAST(CAST(q.qe[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))
             * CAST(CAST(q.qe[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))) AS nb
  FROM embeddings e JOIN cand USING (vec_id), q, generate_series(1, 64) AS t(i)
  GROUP BY e.vec_id
), scored AS (
  SELECT vec_id,
         CAST(ROUND(dot, 12) AS DOUBLE)
         / (SQRT(CAST(ROUND(na, 12) AS DOUBLE)) * SQRT(CAST(ROUND(nb, 12) AS DOUBLE))) AS cosine
  FROM prod
)
SELECT vec_id, cosine,
       CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id) AS INT) AS rank
FROM scored
ORDER BY cosine DESC, vec_id
LIMIT 10
"""


@register("sim_cosine_topk_lsh_exact", oracle=_lsh_exact_sql(), tags=("similarity", "approx"))
def sim_cosine_topk_lsh_exact(spark, sf_dir):
    """Hyperplane-LSH top-10 with EXACT oracle parity end to end:
    bucket bits from decimal dot signs (engine-portable), query bucket
    derived in-engine, candidates scored with the decimal-exact cosine.
    Same candidate-cut shape as the production double path above."""
    emb = t(spark, sf_dir, "embeddings")
    return cosine_topk_lsh_exact(
        emb,
        "vec_id",
        "embedding",
        query_id=0,
        query_vec=_query_vec(spark, sf_dir),
        k=10,
        n_planes=_LSH_N_PLANES,
    )


# --- oracle-exact IVF ------------------------------------------------------

_IVF_EXACT_SQL = """
WITH dots AS (
  SELECT e.vec_id, c.vec_id AS cid,
         SUM(CAST(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))
             * CAST(CAST(c.embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))) AS dot,
         SUM(CAST(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))
             * CAST(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))) AS na,
         SUM(CAST(CAST(c.embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))
             * CAST(CAST(c.embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))) AS nb
  FROM embeddings e
  JOIN embeddings c ON c.vec_id < 8
  CROSS JOIN generate_series(1, 64) AS t(i)
  GROUP BY e.vec_id, c.vec_id
), cscore AS (
  SELECT vec_id, cid,
         CAST(ROUND(dot, 12) AS DOUBLE)
         / (SQRT(CAST(ROUND(na, 12) AS DOUBLE)) * SQRT(CAST(ROUND(nb, 12) AS DOUBLE))) AS cosine
  FROM dots
), ranked AS (
  SELECT vec_id, cid,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cosine DESC, cid) AS crank
  FROM cscore
), cells AS (
  SELECT vec_id, cid AS cell FROM ranked WHERE crank = 1
), probe AS (
  SELECT cid AS cell FROM ranked WHERE vec_id = 0 AND crank <= 2
), cand AS (
  SELECT cells.vec_id FROM cells JOIN probe USING (cell)
), q AS (
  SELECT embedding AS qe FROM embeddings WHERE vec_id = 0
), prod AS (
  SELECT e.vec_id,
         SUM(CAST(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))
             * CAST(CAST(q.qe[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))) AS dot,
         SUM(CAST(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))
             * CAST(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))) AS na,
         SUM(CAST(CAST(q.qe[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))
             * CAST(CAST(q.qe[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))) AS nb
  FROM embeddings e JOIN cand USING (vec_id), q, generate_series(1, 64) AS t(i)
  GROUP BY e.vec_id
), scored AS (
  SELECT vec_id,
         CAST(ROUND(dot, 12) AS DOUBLE)
         / (SQRT(CAST(ROUND(na, 12) AS DOUBLE)) * SQRT(CAST(ROUND(nb, 12) AS DOUBLE))) AS cosine
  FROM prod
)
SELECT vec_id, cosine,
       CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id) AS INT) AS rank
FROM scored
ORDER BY cosine DESC, vec_id
LIMIT 10
"""


@register("sim_ivf_topk_exact", oracle=_IVF_EXACT_SQL, tags=("similarity", "approx"))
def sim_ivf_topk_exact(spark, sf_dir):
    """IVF-flat top-10 with exact oracle parity: centroid rows vec_id
    0..7, decimal-exact cosine assignment (ties to lowest centroid),
    2-cell probe derived in-engine from the query's own assignment —
    no driver-side float math, reproducible in any engine."""
    from etlalchemy_spark.operators.similarity import ivf_topk_exact

    emb = _spread_embeddings(spark, sf_dir)  # map-bound exact-cosine stage
    return ivf_topk_exact(
        emb,
        "vec_id",
        "embedding",
        query_id=0,
        query_vec=_query_vec(spark, sf_dir),
        centroid_ids=list(range(8)),
        k=10,
        n_probe=2,
    )


_LSH_MP_PROBES = ", ".join(f"xor(qb.qbucket, {1 << i})" for i in range(_LSH_N_PLANES))

_LSH_MP_EXACT_SQL = f"""
WITH pd AS (
  SELECT e.vec_id,
         {", ".join(
            "SUM(CAST(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))"
            f" * CAST(CAST(({_plane_lit_sql(p)})[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))) AS d{j}"
            for j, p in enumerate(_LSH_PLANES)
         )}
  FROM embeddings e, generate_series(1, 64) AS t(i)
  GROUP BY e.vec_id
), bkt AS (
  SELECT vec_id, CAST({" + ".join(f"(CASE WHEN d{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(_LSH_N_PLANES))} AS INT) AS bucket FROM pd
), qb AS (
  SELECT bucket AS qbucket FROM bkt WHERE vec_id = 0
), cand AS (
  SELECT b.vec_id FROM bkt b, qb
  WHERE b.bucket IN (qb.qbucket, {_LSH_MP_PROBES})
), q AS (
  SELECT embedding AS qe FROM embeddings WHERE vec_id = 0
), prod AS (
  SELECT e.vec_id,
         SUM(CAST(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))
             * CAST(CAST(q.qe[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))) AS dot,
         SUM(CAST(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))
             * CAST(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))) AS na,
         SUM(CAST(CAST(q.qe[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))
             * CAST(CAST(q.qe[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))) AS nb
  FROM embeddings e JOIN cand USING (vec_id), q, generate_series(1, 64) AS t(i)
  GROUP BY e.vec_id
), scored AS (
  SELECT vec_id,
         CAST(ROUND(dot, 12) AS DOUBLE)
         / (SQRT(CAST(ROUND(na, 12) AS DOUBLE)) * SQRT(CAST(ROUND(nb, 12) AS DOUBLE))) AS cosine
  FROM prod
)
SELECT vec_id, cosine,
       CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id) AS INT) AS rank
FROM scored
ORDER BY cosine DESC, vec_id
LIMIT 10
"""


@register(
    "sim_cosine_topk_lsh_multiprobe_exact",
    oracle=_LSH_MP_EXACT_SQL,
    tags=("similarity", "approx"),
)
def sim_cosine_topk_lsh_multiprobe_exact(spark, sf_dir):
    """Multi-probe LSH top-10 (query bucket + Hamming-1 neighbors,
    probe set XOR-derived in-engine) with exact oracle parity."""
    from etlalchemy_spark.operators.similarity import cosine_topk_lsh_multiprobe_exact

    emb = t(spark, sf_dir, "embeddings")
    return cosine_topk_lsh_multiprobe_exact(
        emb,
        "vec_id",
        "embedding",
        query_id=0,
        query_vec=_query_vec(spark, sf_dir),
        k=10,
        n_planes=_LSH_N_PLANES,
    )


_CENTROID_SQL = """
SELECT e.label, CAST(i - 1 AS INT) AS dim,
       CAST(SUM(CAST(FLOOR(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE)
                           * CAST(10000000.0 AS DOUBLE)) AS BIGINT)) AS DOUBLE)
         / CAST(COUNT(*) * 10000000 AS DOUBLE) AS centroid
FROM embeddings e, generate_series(1, 64) AS s(i)
GROUP BY e.label, i
"""


@register("sim_label_centroids", oracle=_CENTROID_SQL, tags=("similarity", "agg"))
def sim_label_centroids(spark, sf_dir):
    """Per-label embedding centroid, one row per (label, dimension) —
    the class-prototype aggregate behind nearest-centroid classifiers
    and IVF coarse quantizers. posexplode + hash aggregate, partial
    sums combining map-side. Elements are floor-quantized to 1e-7
    integers before summing (float32 carries ~7 significant digits):
    the double→decimal(12,10) cast used by the cosine path rounds
    ties differently across engines when raw elements are summed
    alone, while multiply-and-floor is a correctly-rounded chain —
    integer-exact everywhere."""
    emb = t(spark, sf_dir, "embeddings")
    ex = emb.select("label", F.posexplode("embedding").alias("dim", "v"))
    q = F.floor(F.col("v").cast("double") * F.lit(10000000.0))
    return ex.groupBy("label", "dim").agg(
        (
            F.sum(q).cast("double")
            / (F.count(F.lit(1)) * F.lit(10000000)).cast("double")
        ).alias("centroid")
    )


_RADIUS_SQL = """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
prod AS (
  SELECT e.vec_id,
         SUM(CAST(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))
             * CAST(CAST(q.qe[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))) AS dot,
         SUM(CAST(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))
             * CAST(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))) AS na,
         SUM(CAST(CAST(q.qe[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))
             * CAST(CAST(q.qe[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))) AS nb
  FROM embeddings e, q, generate_series(1, 64) AS t(i)
  GROUP BY e.vec_id
)
SELECT vec_id,
       CAST(ROUND(dot, 12) AS DOUBLE) / (SQRT(CAST(ROUND(na, 12) AS DOUBLE)) * SQRT(CAST(ROUND(nb, 12) AS DOUBLE))) AS cosine
FROM prod
WHERE CAST(ROUND(dot, 12) AS DOUBLE) / (SQRT(CAST(ROUND(na, 12) AS DOUBLE)) * SQRT(CAST(ROUND(nb, 12) AS DOUBLE))) >= 0.2
  AND vec_id <> 0
"""


@register("sim_radius_search_exact", oracle=_RADIUS_SQL, tags=("similarity",))
def sim_radius_search_exact(spark, sf_dir):
    """Radius (range) similarity search: every vector within cosine
    >= 0.2 of the query — the dedup-sweep shape (fetch ALL near
    neighbors, not top-k). Same decimal-exact scoring as the top-k
    path; the threshold filter replaces the rank, so the result needs
    no global ordering at all — fully parallel scan+agg, and at scale
    the LSH/IVF bucket prefilters compose in front of it unchanged."""
    from etlalchemy_spark.operators.similarity import exact_cosine

    emb = t(spark, sf_dir, "embeddings")
    scored = exact_cosine(emb, ["vec_id"], F.col("embedding"), _lit_qvec(spark, sf_dir))
    return scored.where((F.col("cosine") >= 0.2) & (F.col("vec_id") != 0))


def _lit_qvec(spark, sf_dir):
    from etlalchemy_spark.operators.similarity import _lit_vec

    return _lit_vec(_query_vec(spark, sf_dir))


_KNN_BATCH_SQL = """
WITH q AS (
  SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id % 50 = 0
),
prod AS (
  SELECT q.qid, e.vec_id,
         SUM(CAST(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))
             * CAST(CAST(q.qe[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))) AS dot,
         SUM(CAST(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))
             * CAST(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))) AS na,
         SUM(CAST(CAST(q.qe[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))
             * CAST(CAST(q.qe[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))) AS nb
  FROM embeddings e, q, generate_series(1, 64) AS t(i)
  WHERE e.vec_id <> q.qid
  GROUP BY q.qid, e.vec_id
),
scored AS (
  SELECT qid, vec_id,
         CAST(ROUND(dot, 12) AS DOUBLE) / (SQRT(CAST(ROUND(na, 12) AS DOUBLE)) * SQRT(CAST(ROUND(nb, 12) AS DOUBLE))) AS cosine
  FROM prod
)
SELECT qid, vec_id, cosine,
       CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS INT) AS rank
FROM scored
QUALIFY rank <= 3
"""


@register("sim_knn_batch_exact", oracle=_KNN_BATCH_SQL, tags=("similarity",))
def sim_knn_batch_exact(spark, sf_dir):
    """Batch kNN: exact 3-nearest-neighbors for a SET of query vectors
    in one plan (the embedding-join shape: every query scored against
    the corpus, ranked per query). The broadcast side is the query
    set, the corpus NEVER shuffles on a join key — the plan-pinned
    audit contract (BroadcastNestedLoopJoin, no SortMergeJoin). The
    corpus scan is round-robin spread to full parallelism first
    (keyless — _spread_embeddings; at 100 TB the scan's own thousands
    of row groups provide this parallelism and the spread is a no-op
    policy, but the single-row-group fixture otherwise runs the whole
    |corpus| x |queries| decimal-cosine battery in ONE task: 9.8 s ->
    ~1 s at sf0.1). The per-query rank window partitions on qid so no
    global sort exists. IVF/LSH prefilters drop in front of the same
    scoring to cut the candidate set when the query batch is large."""
    from pyspark.sql import Window as W

    from etlalchemy_spark.operators.similarity import exact_cosine

    emb = _spread_embeddings(spark, sf_dir)  # map-bound exact-cosine stage
    q = t(spark, sf_dir, "embeddings").where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    pairs = emb.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
    scored = exact_cosine(pairs, ["qid", "vec_id"], F.col("embedding"), F.col("qe"))
    w = W.partitionBy("qid").orderBy(F.col("cosine").desc(), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 3)
    )


# --- ANN recall audit (exact vs LSH operating point) -----------------------

_RECALL_AUDIT_SQL = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_true_neighbors,
       CAST(COUNT(a.vec_id) AS BIGINT) AS n_overlap,
       CAST(COUNT(a.vec_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall
FROM (SELECT vec_id FROM ({_TOPK_SQL}) WHERE vec_id <> 0) e
LEFT JOIN (SELECT vec_id FROM ({_lsh_exact_sql()}) WHERE vec_id <> 0) a
  USING (vec_id)
"""


@register("sim_lsh_recall_audit", oracle=_RECALL_AUDIT_SQL, tags=("similarity", "approx"))
def sim_lsh_recall_audit(spark, sf_dir):
    """Neighbor recall of the hyperplane-LSH top-k against the
    brute-force ground truth — the similarity twin of
    ``dedup_lsh_recall`` / ``sketch_hll_error_report``: the audit that
    tells you whether an ANN operating point (here 6 planes,
    single-probe) is safe to ship before pointing it at the full
    corpus. The query vector itself is EXCLUDED from both sides
    (cosine(q, q) = 1 ranks first in any configuration, so counting it
    would floor-bias the metric to 1/k even when the LSH retrieves no
    real neighbor), and the denominator is the measured size of the
    exact neighbor set — not a hard-coded k — so a changed operating
    point can't silently skew the ratio. Both sides reuse the
    oracle-exact formulations above; the overlap is one left join of
    two <=k-row results (LSH side broadcast) aggregated in a single
    pass, and the audit costs two corpus scans total —
    run-once-per-config, not per-query."""
    exact_ids = (
        sim_cosine_topk_exact(spark, sf_dir)
        .where(F.col("vec_id") != 0)
        .select("vec_id")
    )
    lsh_ids = (
        sim_cosine_topk_lsh_exact(spark, sf_dir)
        .where(F.col("vec_id") != 0)
        .select(F.col("vec_id").alias("a_vec_id"))
    )
    return (
        exact_ids.join(
            F.broadcast(lsh_ids), exact_ids.vec_id == F.col("a_vec_id"), "left"
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_true_neighbors"),
            F.count("a_vec_id").cast("bigint").alias("n_overlap"),
            (
                F.count("a_vec_id").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("recall"),
        )
    )


_INT8_Q_EXPR = """CASE WHEN s = 0 THEN list_transform(e, v -> CAST(0 AS BIGINT))
       ELSE list_transform(e, v -> CAST(FLOOR(CAST(v AS DOUBLE) / s * 127 + 0.5) AS BIGINT)) END"""

_INT8_TOPK_SQL = f"""
WITH qq AS (
  SELECT {_INT8_Q_EXPR} AS q
  FROM (SELECT embedding AS e,
               list_aggregate(list_transform(embedding, v -> abs(CAST(v AS DOUBLE))), 'max') AS s
        FROM embeddings WHERE vec_id = 0)
),
base AS (
  SELECT vec_id, {_INT8_Q_EXPR} AS q
  FROM (SELECT vec_id, embedding AS e,
               list_aggregate(list_transform(embedding, v -> abs(CAST(v AS DOUBLE))), 'max') AS s
        FROM embeddings)
),
scored AS (
  SELECT b.vec_id,
         CAST(list_aggregate(list_transform(generate_series(1, 64),
              i -> b.q[CAST(i AS INT)] * qq.q[CAST(i AS INT)]), 'sum') AS BIGINT) AS dot,
         CAST(list_aggregate(list_transform(b.q, x -> x * x), 'sum') AS BIGINT) AS nb,
         CAST(list_aggregate(list_transform(qq.q, x -> x * x), 'sum') AS BIGINT) AS nq
  FROM base b, qq
),
cos AS (
  SELECT vec_id,
         CAST(dot AS DOUBLE) / (SQRT(CAST(nb AS DOUBLE)) * SQRT(CAST(nq AS DOUBLE))) AS cosine
  FROM scored WHERE nb > 0 AND nq > 0
)
SELECT vec_id, cosine,
       CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id) AS INT) AS rank
FROM cos ORDER BY cosine DESC, vec_id LIMIT 10
"""


@register("sim_int8_quantized_topk", oracle=_INT8_TOPK_SQL, tags=("similarity",))
def sim_int8_quantized_topk(spark, sf_dir):
    """Compressed-vector ANN path: per-vector symmetric int8
    quantization (operators/similarity.py int8_quantize), then top-10
    by QUANTIZED cosine — integer zip_with dot products and integer
    norms in codegen, one double division at the end. Both engines
    quantize independently with the same floor-half-up formula, so the
    whole query is oracle-exact without decimal accumulators: the
    integers make exact arithmetic free. 100 TB story: 4x less scan
    bandwidth than float32; the int8 sweep is the candidate generator
    and a float re-rank (sim_cosine_topk_exact's plan) runs only on
    the k survivors. tests/test_similarity.py pins recall vs the
    float exact top-10."""
    from etlalchemy_spark.operators.similarity import int8_cosine_topk, int8_quantize_py

    emb = _spread_embeddings(spark, sf_dir)  # map-bound exact-cosine stage
    qq = int8_quantize_py(_query_vec(spark, sf_dir))
    return int8_cosine_topk(emb, "vec_id", "embedding", qq, k=10)


_PQ_CODES_SQL = """
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE)*127 + 0.5) AS BIGINT)) AS qv
  FROM embeddings
), anch AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code, qv AS aqv
  FROM q ORDER BY vec_id LIMIT 16
), dist AS (
  SELECT q.vec_id, m.m AS subspace, a.code,
         list_sum(list_transform(range(1, 9),
           d -> (q.qv[m.m*8+d] - a.aqv[m.m*8+d])*(q.qv[m.m*8+d] - a.aqv[m.m*8+d]))) AS dist
  FROM q
  CROSS JOIN generate_series(0, 7) AS m(m)
  CROSS JOIN anch a
)
SELECT vec_id, CAST(subspace AS INT) AS subspace, CAST(code AS INT) AS code
FROM (
  SELECT vec_id, subspace, code,
         ROW_NUMBER() OVER (PARTITION BY vec_id, subspace ORDER BY dist, code) AS rn
  FROM dist) WHERE rn = 1
"""


@register("sim_pq_codes_exact", oracle=_PQ_CODES_SQL, tags=("similarity",))
def sim_pq_codes_exact(spark, sf_dir):
    """Product-quantization ENCODING, oracle-exact: each 64-dim vector
    becomes 8 sub-space codes (argmin integer L2 against 16 anchor
    codebooks on a shared global grid — floor-half-up, the portable
    rounding). The codebook rides as a BROADCAST dimension table
    (n_sub x n_codes rows, bounded by the codebook never the data):
    one broadcast equi-join + one per-(id, subspace) argmin aggregate
    — the only shuffle — at any corpus size; ties break to the lowest
    code on both engines (struct-MIN == ORDER BY dist, code). This is
    the correctness gate for the PQ family — sim_pq_adc_topk runs the
    kmeans-trained float path that SQL can't reproduce."""
    from etlalchemy_spark.operators.similarity import (
        pq_anchor_codebooks,
        pq_codes_exact,
    )

    emb = t(spark, sf_dir, "embeddings")
    anchors = pq_anchor_codebooks(emb, "vec_id", "embedding", n_codes=16)
    return pq_codes_exact(emb, "vec_id", "embedding", anchors)


@register("sim_pq_adc_topk", oracle=None, tags=("similarity", "approx", "iterative"))
def sim_pq_adc_topk(spark, sf_dir):
    """PQ + asymmetric distance computation as the CANDIDATE
    GENERATOR, exact re-rank on the shortlist — the production ANN
    shape at 100 TB: per-subspace L2 kmeans codebooks (8 subspaces x
    32 codes, driver-literal state, three Lloyd iterations), corpus
    scanned in code space (8 small ints/vector, a 32x memory cut vs
    float32 — RAM-resident index instead of spilling), query scored by
    summing 8 lookup-table entries instead of 64 multiplies. The ADC
    top-100 shortlist (TakeOrderedAndProject) then gets ONE exact
    float re-rank — 100 vectors, not the corpus — so PQ's score
    distortion costs recall only if a true neighbor misses the
    shortlist (recall@10 pinned in tests/test_similarity.py; the
    fixture's vectors are near-random, the hardest operating point —
    neighbor margins of ~0.05 cosine — so the shortlist is sized
    generously; real embedding corpora separate far better). The
    unit-norm corpus makes the L2 ranking a cosine ranking.
    Rows-only (kmeans is float/iteration-order dependent); exact-gate
    twin sim_pq_codes_exact covers the encoder."""
    from etlalchemy_spark.operators.similarity import (
        cosine_topk_exact,
        pq_adc_topk,
        pq_train_codebooks,
    )

    emb = _spread_embeddings(spark, sf_dir)  # map-bound exact-cosine stage
    q = _query_vec(spark, sf_dir)
    books = pq_train_codebooks(emb, "vec_id", "embedding", n_codes=32, iters=3)
    shortlist = pq_adc_topk(emb, "vec_id", "embedding", q, books, k=100)
    cands = emb.join(
        F.broadcast(shortlist.select("vec_id")), "vec_id", "left_semi"
    )
    return cosine_topk_exact(cands, "vec_id", "embedding", q, k=10)


@register("sim_incremental_index_topk", oracle=_lsh_exact_sql(), tags=("similarity", "approx"))
def sim_incremental_index_topk(spark, sf_dir):
    """Incremental ANN index — the similarity mirror of the dedup band
    store: the corpus arrives as two disjoint batches, each signed
    ONCE and appended to a persisted (id, bucket, version) parquet
    store; the query probes the STORE (one bucket broadcast, left-semi
    candidate fetch, exact re-rank) without ever re-hashing indexed
    vectors. The oracle is the ONE-SHOT whole-corpus LSH search
    (sim_cosine_topk_lsh_exact's SQL): equality proves append-built ≡
    built-at-once — the invariant that lets a 100 TB index absorb
    daily batches instead of rebuilding."""
    import os as _os
    import shutil as _shutil

    from etlalchemy_spark.operators.similarity import (
        append_bucket_index,
        probe_bucket_index,
    )
    from etlalchemy_spark.queries._util import scratch_dir

    emb = t(spark, sf_dir, "embeddings")
    store = _os.path.join(scratch_dir("sim_bucket_index", sf_dir), "store")
    _shutil.rmtree(store, ignore_errors=True)
    append_bucket_index(
        store, emb.where(F.col("vec_id") % 3 != 0), "vec_id", "embedding", dim=64
    )
    append_bucket_index(
        store, emb.where(F.col("vec_id") % 3 == 0), "vec_id", "embedding", dim=64
    )
    return probe_bucket_index(
        spark, store, emb, "vec_id", "embedding", _query_vec(spark, sf_dir), k=10
    )


@register("sim_index_compaction", oracle=_lsh_exact_sql(), tags=("similarity", "approx"))
def sim_index_compaction(spark, sf_dir):
    """ANN index compaction invariant, oracle-gated: a batch is
    RE-APPENDED (the at-least-once replay the append-only store
    tolerates by design), the store is compacted back to one row per
    id (dead duplicate rows dropped, each bucket directory rewritten
    as one well-sized file), and the probe of the compacted store must
    still equal the one-shot whole-corpus LSH search. Store-size
    reduction and probe partition-pruning are pinned in
    tests/test_bucket_index.py; this query makes 'compaction never
    changes an answer' part of the cross-engine gate. At 100 TB this
    is the maintenance op that keeps probe cost tracking LIVE ids
    instead of append history."""
    import os as _os
    import shutil as _shutil

    from etlalchemy_spark.operators.similarity import (
        append_bucket_index,
        compact_bucket_index,
        probe_bucket_index,
    )
    from etlalchemy_spark.queries._util import scratch_dir

    emb = t(spark, sf_dir, "embeddings")
    store = _os.path.join(scratch_dir("sim_index_compaction", sf_dir), "store")
    _shutil.rmtree(store, ignore_errors=True)
    half = emb.where(F.col("vec_id") % 2 == 0)
    append_bucket_index(store, half, "vec_id", "embedding", dim=64)
    append_bucket_index(
        store, emb.where(F.col("vec_id") % 2 != 0), "vec_id", "embedding", dim=64
    )
    append_bucket_index(store, half, "vec_id", "embedding", dim=64)  # replayed batch
    stats = compact_bucket_index(spark, store, "vec_id")
    assert stats["rows_after"] < stats["rows_before"]
    return probe_bucket_index(
        spark, store, emb, "vec_id", "embedding", _query_vec(spark, sf_dir), k=10
    )


# --- MMR diverse top-k (oracle-exact via unrolled selection CTEs) -----------

_MMR_SHORTLIST = 20
_MMR_K = 5
_MMR_LAM = 0.7
_MMR_OML = 0.3  # literal, NOT 1-0.7 (0.30000000000000004 in binary)

_MMR_DOT = """
  SELECT {a_id} AS ia, {b_id} AS ib,
         SUM(CAST(CAST({a_e}[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))
             * CAST(CAST({b_e}[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))) AS dot,
         SUM(CAST(CAST({a_e}[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))
             * CAST(CAST({a_e}[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))) AS na,
         SUM(CAST(CAST({b_e}[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))
             * CAST(CAST({b_e}[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))) AS nb
  FROM {rels}, generate_series(1, 64) AS t(i)
  {where}
  GROUP BY {group}
"""


def _mmr_sql() -> str:
    steps = []
    picks = []
    for s in range(1, _MMR_K + 1):
        if s == 1:
            steps.append("s1 AS (SELECT vec_id, rel FROM cand ORDER BY rel DESC, vec_id LIMIT 1)")
            picks.append("p1 AS (SELECT vec_id FROM s1)")
        else:
            steps.append(
                f"""s{s} AS (
  SELECT c.vec_id, c.rel FROM cand c
  ANTI JOIN p{s - 1} ON c.vec_id = p{s - 1}.vec_id
  ORDER BY {_MMR_LAM} * c.rel - {_MMR_OML} * (
      SELECT MAX(sym.cos) FROM sym SEMI JOIN p{s - 1} ON sym.b = p{s - 1}.vec_id
      WHERE sym.a = c.vec_id
    ) DESC, c.vec_id
  LIMIT 1)"""
            )
            picks.append(
                f"p{s} AS (SELECT vec_id FROM p{s - 1} UNION ALL SELECT vec_id FROM s{s})"
            )
    qdot = _MMR_DOT.format(
        a_id="e.vec_id", b_id="0", a_e="e.embedding", b_e="q.qe",
        rels="embeddings e, q", where="WHERE e.vec_id <> 0",
        group="e.vec_id",
    )
    pdot = _MMR_DOT.format(
        a_id="a.vec_id", b_id="b.vec_id", a_e="a.embedding", b_e="b.embedding",
        rels="ce a JOIN ce b ON a.vec_id < b.vec_id", where="",
        group="a.vec_id, b.vec_id",
    )
    chain = []
    for s, p in zip(steps, picks):
        chain.append(s)
        chain.append(p)
    chain_sql = ",\n".join(chain)
    union = "\nUNION ALL\n".join(
        f"SELECT {s} AS step, vec_id, rel AS relevance FROM s{s}"
        for s in range(1, _MMR_K + 1)
    )
    return f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
qp AS ({qdot}),
cand AS (
  SELECT ia AS vec_id,
         CAST(ROUND(dot, 12) AS DOUBLE)
           / (SQRT(CAST(ROUND(na, 12) AS DOUBLE)) * SQRT(CAST(ROUND(nb, 12) AS DOUBLE))) AS rel
  FROM qp ORDER BY rel DESC, ia LIMIT {_MMR_SHORTLIST}
),
ce AS (SELECT e.vec_id, e.embedding FROM embeddings e SEMI JOIN cand ON e.vec_id = cand.vec_id),
pp AS ({pdot}),
pairs AS (
  SELECT ia, ib,
         CAST(ROUND(dot, 12) AS DOUBLE)
           / (SQRT(CAST(ROUND(na, 12) AS DOUBLE)) * SQRT(CAST(ROUND(nb, 12) AS DOUBLE))) AS cos
  FROM pp
),
sym AS (SELECT ia AS a, ib AS b, cos FROM pairs UNION ALL SELECT ib AS a, ia AS b, cos FROM pairs),
{chain_sql}
{union}
"""


_MMR_SQL = _mmr_sql()


@register("sim_mmr_diverse_topk", oracle=_MMR_SQL, tags=("similarity",))
def sim_mmr_diverse_topk(spark, sf_dir):
    """Maximal-Marginal-Relevance diverse retrieval: greedy k=5
    selection maximizing lam*rel(q,d) - (1-lam)*max_{s in S} sim(d,s)
    over a top-20 exact-cosine shortlist — the dedup-aware top-k that
    keeps near-duplicate neighbors from crowding a retrieval slate
    (RAG contexts, eval panels, labeling batches). Split of labor at
    scale: the SHORTLIST is the distributed part (exact decimal
    cosine, TakeOrderedAndProject over any corpus size); the greedy
    selection is inherently sequential-in-k but runs on
    aggregate-sized state (20 relevances + <=190 pairwise cosines,
    both computed by the same oracle-exact decimal formula in-plan,
    collected within the bounded-collect budget like the histogram
    quantile walk) and returns as a literal frame. The oracle unrolls
    the 5 selection steps as chained CTEs with identical float
    scoring — selections AND relevances hash-match. (1-lam) is the
    literal 0.3 on both sides: computing 1-0.7 in binary gives
    0.30000000000000004 and would diverge the score by an ulp."""
    from etlalchemy_spark.operators.similarity import exact_cosine

    emb = t(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir, 0)
    qlit = F.array(*[F.lit(float(x)) for x in qv])
    scored = exact_cosine(
        emb.where(F.col("vec_id") != 0).select("vec_id", "embedding"),
        ["vec_id"],
        F.col("embedding"),
        qlit,
    )
    short = scored.orderBy(F.desc("cosine"), "vec_id").limit(_MMR_SHORTLIST)
    rel = {r["vec_id"]: r["cosine"] for r in short.collect()}  # <= 20 rows
    ids = sorted(rel)

    se = emb.where(F.col("vec_id").isin(ids)).select("vec_id", "embedding")
    a = se.select(F.col("vec_id").alias("a"), F.col("embedding").alias("ea"))
    b = se.select(F.col("vec_id").alias("b"), F.col("embedding").alias("eb"))
    pair_scored = exact_cosine(
        a.join(F.broadcast(b), F.col("a") < F.col("b")),
        ["a", "b"],
        F.col("ea"),
        F.col("eb"),
    )
    pair: dict[tuple[int, int], float] = {}
    for r in pair_scored.collect():  # <= 190 rows
        pair[(r["a"], r["b"])] = r["cosine"]
        pair[(r["b"], r["a"])] = r["cosine"]

    picked: list[int] = []
    out: list[tuple[int, int, float]] = []
    for step in range(1, _MMR_K + 1):
        best = None
        for v in ids:
            if v in picked:
                continue
            if step == 1:
                score = rel[v]
            else:
                score = _MMR_LAM * rel[v] - _MMR_OML * max(pair[(v, p)] for p in picked)
            if best is None or score > best[0] or (score == best[0] and v < best[1]):
                best = (score, v)
        picked.append(best[1])
        out.append((step, best[1], rel[best[1]]))

    entries = F.array(
        *[
            F.struct(
                F.lit(s).cast("int").alias("step"),
                F.lit(v).cast("bigint").alias("vec_id"),
                F.lit(float(r)).alias("relevance"),
            )
            for s, v, r in out
        ]
    )
    return (
        spark.range(0, 1, 1, 1)
        .select(F.explode(entries).alias("_e"))
        .select("_e.step", "_e.vec_id", "_e.relevance")
    )


def _hybrid_rrf_sql() -> str:
    from etlalchemy_spark.queries.text import _BM25_SQL

    return f"""
WITH bm AS (
  SELECT doc_id,
         CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS INT) AS r
  FROM ( {_BM25_SQL} )
), co AS (
  SELECT vec_id AS doc_id, CAST(rank AS INT) AS r FROM ( {_TOPK_SQL} )
), ids AS (
  SELECT doc_id FROM bm UNION SELECT doc_id FROM co
)
SELECT ids.doc_id,
       CAST(COALESCE(1.0 / (60 + bm.r), 0.0)
            + COALESCE(1.0 / (60 + co.r), 0.0) AS DOUBLE) AS rrf,
       bm.r AS bm25_rank,
       co.r AS cosine_rank
FROM ids LEFT JOIN bm ON ids.doc_id = bm.doc_id
         LEFT JOIN co ON ids.doc_id = co.doc_id
ORDER BY rrf DESC, ids.doc_id
LIMIT 10
"""


@register("sim_hybrid_rrf_fusion", oracle=_hybrid_rrf_sql(), tags=("similarity", "text", "bench"))
def sim_hybrid_rrf_fusion(spark, sf_dir):
    """Hybrid retrieval: BM25 lexical top-20 fused with exact-cosine
    vector top-10 by reciprocal-rank fusion (RRF, k=60) — the standard
    two-tower retrieval stack (sparse + dense, fused rank-side so the
    incomparable score scales never meet). Built by COMPOSING the two
    registered retrievers (text_bm25_search, sim_cosine_topk_exact):
    each list is the distributed part, the fusion runs on
    aggregate-sized state (<=30 ids). RRF terms 1/(60+rank) are
    divisions of exact integers (correctly rounded, bit-identical)
    summed in a fixed two-slot order, so fused scores hash-match.
    The documents and embeddings fixtures share the 0..N id space —
    doc_id IS vec_id (TESTDATA.md)."""
    from etlalchemy_spark.queries.text import text_bm25_search

    # Rank the <=20-row BM25 list with the array-packed cumulative
    # idiom (sort_array + posexplode on ONE aggregate row) instead of
    # an unpartitioned window — the tiny-frame house rule the plan
    # police enforces on every bench query (tests/test_plans.py).
    bm = text_bm25_search(spark, sf_dir)
    bm = (
        bm.agg(
            F.sort_array(
                F.collect_list(F.struct((-F.col("score")).alias("neg"), "doc_id"))
            ).alias("a")
        )
        .select(F.posexplode("a").alias("pos", "st"))
        .select(
            F.col("st.doc_id").alias("doc_id"),
            (F.col("pos") + 1).cast("int").alias("r_bm"),
        )
    )
    co = sim_cosine_topk_exact(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"), F.col("rank").cast("int").alias("r_co")
    )
    # ONE full-outer join replaces the id union + two join-backs: the
    # union/join-back shape referenced each retriever twice, so the full
    # BM25 corpus pass and the exact-cosine scan each executed twice
    # (r13 before-plan: 12 Exchanges). A full outer join on doc_id is
    # the same id-union semantics with each side computed once.
    j = bm.join(co, "doc_id", "full_outer")
    rrf = F.coalesce(1.0 / (60 + F.col("r_bm")), F.lit(0.0)) + F.coalesce(
        1.0 / (60 + F.col("r_co")), F.lit(0.0)
    )
    return (
        j.select(
            "doc_id",
            rrf.cast("double").alias("rrf"),
            F.col("r_bm").alias("bm25_rank"),
            F.col("r_co").alias("cosine_rank"),
        )
        .orderBy(F.desc("rrf"), F.asc("doc_id"))
        .limit(10)
    )


# --- Matryoshka prefix-dimension search (r9) -------------------------------------

_MRL_PRE_D = 16
_MRL_SHORTLIST = 50

_MRL_SQL = f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
pre AS (
  SELECT e.vec_id,
         SUM(CAST(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))
             * CAST(CAST(q.qe[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))) AS dot,
         SUM(CAST(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))
             * CAST(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))) AS na,
         SUM(CAST(CAST(q.qe[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))
             * CAST(CAST(q.qe[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))) AS nb
  FROM embeddings e, q, generate_series(1, {_MRL_PRE_D}) AS t(i)
  GROUP BY e.vec_id
),
pre_scored AS (
  SELECT vec_id,
         CAST(ROUND(dot, 12) AS DOUBLE)
           / (SQRT(CAST(ROUND(na, 12) AS DOUBLE)) * SQRT(CAST(ROUND(nb, 12) AS DOUBLE))) AS c
  FROM pre
),
short AS (
  SELECT vec_id FROM pre_scored WHERE c IS NOT NULL
  ORDER BY c DESC, vec_id LIMIT {_MRL_SHORTLIST}
),
prod AS (
  SELECT e.vec_id,
         SUM(CAST(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))
             * CAST(CAST(q.qe[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))) AS dot,
         SUM(CAST(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))
             * CAST(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))) AS na,
         SUM(CAST(CAST(q.qe[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))
             * CAST(CAST(q.qe[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))) AS nb
  FROM embeddings e JOIN short USING (vec_id), q, generate_series(1, 64) AS t(i)
  GROUP BY e.vec_id
),
scored AS (
  SELECT vec_id,
         CAST(ROUND(dot, 12) AS DOUBLE)
           / (SQRT(CAST(ROUND(na, 12) AS DOUBLE)) * SQRT(CAST(ROUND(nb, 12) AS DOUBLE))) AS cosine
  FROM prod
)
SELECT vec_id, cosine,
       CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id) AS INT) AS rank
FROM scored
ORDER BY cosine DESC, vec_id
LIMIT 10
"""


@register("sim_matryoshka_prefix_topk", oracle=_MRL_SQL, tags=("similarity",))
def sim_matryoshka_prefix_topk(spark, sf_dir):
    """Matryoshka (MRL) adaptive-dimension search — the third modern
    ANN family beside LSH/IVF and PQ: embeddings trained with
    matryoshka loss rank usefully under PREFIX truncation, so stage 1
    scores every vector on the first {pre} dims (a {ratio}× cheaper
    scan that reads a quarter of the vector bytes — with dimension-
    major storage, only the prefix columns), keeps a {short}-candidate
    shortlist, and stage 2 re-ranks ONLY the shortlist at full
    dimension. Both stages are the decimal-exact cosine, the shortlist
    boundary tie-breaks deterministically, and the oracle replays the
    exact two-stage pipeline — so this gate pins the SEARCH PIPELINE,
    not just a score. At 100 TB: stage-1 cost scales with corpus ×
    prefix dims; full-dim work is shortlist-sized.""".format(
        pre=_MRL_PRE_D, ratio=64 // _MRL_PRE_D, short=_MRL_SHORTLIST
    )
    from etlalchemy_spark.operators.similarity import _topk_ranked, exact_cosine

    emb = t(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir)
    q_pre = F.array(*[F.lit(float(x)) for x in qv[:_MRL_PRE_D]])
    q_full = F.array(*[F.lit(float(x)) for x in qv])
    pre = exact_cosine(
        emb.select("vec_id", F.slice("embedding", 1, _MRL_PRE_D).alias("_pre")),
        ["vec_id"],
        F.col("_pre"),
        q_pre,
    ).where(F.col("cosine").isNotNull())
    short = pre.orderBy(F.desc("cosine"), F.col("vec_id")).limit(_MRL_SHORTLIST)
    full = exact_cosine(
        emb.join(short.select("vec_id"), "vec_id", "left_semi"),
        ["vec_id"],
        F.col("embedding"),
        q_full,
    )
    return _topk_ranked(full, "vec_id", 10)


# --- Clustering purity + NMI against labels (r10) ------------------------------------

from etlalchemy_spark.queries._util import ln_int_sql  # noqa: E402

_NMI_LN_NIJ = ln_int_sql("(n * n_ij)")
_NMI_LN_MARG = ln_int_sql("(n_i * n_j)")
_NMI_LN_N = ln_int_sql("n")
_NMI_LN_NI = ln_int_sql("n_i")
_NMI_LN_NJ = ln_int_sql("n_j")


def _nmi_sql() -> str:
    dot_aggs = ",\n         ".join(
        "SUM(CAST(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))"
        f" * CAST(CAST(({_plane_lit_sql(p)})[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))) AS d{j}"
        for j, p in enumerate(_LSH_PLANES)
    )
    bucket = " + ".join(
        f"(CASE WHEN d{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(_LSH_N_PLANES)
    )
    return f"""
WITH pd AS (
  SELECT e.vec_id, {dot_aggs}
  FROM embeddings e, generate_series(1, 64) AS t(i)
  GROUP BY e.vec_id
), bkt AS (
  SELECT vec_id, CAST({bucket} AS INT) AS bucket FROM pd
), cont AS (
  SELECT b.bucket, e.label, COUNT(*) AS n_ij
  FROM bkt b JOIN embeddings e USING (vec_id)
  GROUP BY b.bucket, e.label
), ni AS (SELECT bucket, SUM(n_ij) AS n_i FROM cont GROUP BY bucket),
nj AS (SELECT label, SUM(n_ij) AS n_j FROM cont GROUP BY label),
nn AS (SELECT SUM(n_ij) AS n FROM cont),
pur AS (SELECT SUM(mx) AS agree FROM (SELECT bucket, MAX(n_ij) AS mx FROM cont GROUP BY bucket)),
mi AS (
  SELECT SUM(CAST((CAST(n_ij AS DOUBLE) / CAST(n AS DOUBLE))
                  * (({_NMI_LN_NIJ}) - ({_NMI_LN_MARG})) AS DECIMAL(28,12))) AS i_sum
  FROM cont JOIN ni USING (bucket) JOIN nj USING (label), nn
),
hx AS (
  SELECT SUM(CAST((CAST(n_i AS DOUBLE) / CAST(n AS DOUBLE))
                  * (({_NMI_LN_N}) - ({_NMI_LN_NI})) AS DECIMAL(28,12))) AS h
  FROM ni, nn
),
hy AS (
  SELECT SUM(CAST((CAST(n_j AS DOUBLE) / CAST(n AS DOUBLE))
                  * (({_NMI_LN_N}) - ({_NMI_LN_NJ})) AS DECIMAL(28,12))) AS h
  FROM nj, nn
)
SELECT CAST(nn.n AS BIGINT) AS n_vectors,
       CAST((SELECT COUNT(*) FROM ni) AS BIGINT) AS n_clusters,
       CAST((SELECT COUNT(*) FROM nj) AS BIGINT) AS n_labels,
       CAST(pur.agree AS DOUBLE) / CAST(nn.n AS DOUBLE) AS purity,
       CAST(CAST(mi.i_sum AS VARCHAR) AS DOUBLE) AS mi_nats,
       CAST(CAST(mi.i_sum AS VARCHAR) AS DOUBLE)
         / SQRT(CAST(CAST(hx.h AS VARCHAR) AS DOUBLE)
                * CAST(CAST(hy.h AS VARCHAR) AS DOUBLE)) AS nmi
FROM nn, pur, mi, hx, hy
"""


@register("sim_cluster_purity_nmi", oracle=_nmi_sql(), tags=("similarity", "stats"))
def sim_cluster_purity_nmi(spark, sf_dir):
    """Clustering quality against ground-truth labels (r10): PURITY
    (majority-label agreement) and NORMALIZED MUTUAL INFORMATION —
    the two standard external cluster-evaluation metrics every
    embedding-pipeline report quotes. Clusters are the decimal-exact
    hyperplane-LSH buckets (the one clustering in the repo that is
    bit-identical cross-engine; k-means is float-iteration-bound and
    stays rows-only), so the metric pipeline itself is what's
    verified: contingency hash-agg, margins, and every entropy/MI
    term as integer-count ln differences (ln_int) summed as scale-12
    decimals — information theory with zero libm. All reduction
    happens on CONTINGENCY rows (<= clusters x labels), never
    vectors."""
    from etlalchemy_spark.operators.similarity import lsh_buckets_exact

    emb = t(spark, sf_dir, "embeddings")
    bkt = lsh_buckets_exact(emb, "vec_id", "embedding", _LSH_PLANES)
    cont = (
        bkt.join(emb.select("vec_id", "label"), "vec_id")
        .groupBy("bucket", "label")
        .agg(F.count(F.lit(1)).alias("n_ij"))
    )
    cont = cont.localCheckpoint(eager=False)  # tiny; feeds 4 aggregates
    ni = cont.groupBy("bucket").agg(F.sum("n_ij").alias("n_i"))
    nj = cont.groupBy("label").agg(F.sum("n_ij").alias("n_j"))
    nn = cont.agg(F.sum("n_ij").alias("n"))
    pur = (
        cont.groupBy("bucket")
        .agg(F.max("n_ij").alias("mx"))
        .agg(F.sum("mx").alias("agree"))
    )
    mi = (
        cont.join(ni, "bucket")
        .join(nj, "label")
        .crossJoin(F.broadcast(nn))
        .select(
            F.expr(
                f"CAST((CAST(n_ij AS DOUBLE) / CAST(n AS DOUBLE))"
                f" * (({_NMI_LN_NIJ}) - ({_NMI_LN_MARG})) AS DECIMAL(28,12))"
            ).alias("v")
        )
        .agg(F.sum("v").alias("i_sum"))
    )
    hx = (
        ni.crossJoin(F.broadcast(nn))
        .select(
            F.expr(
                f"CAST((CAST(n_i AS DOUBLE) / CAST(n AS DOUBLE))"
                f" * (({_NMI_LN_N}) - ({_NMI_LN_NI})) AS DECIMAL(28,12))"
            ).alias("v")
        )
        .agg(F.sum("v").alias("hx"))
    )
    hy = (
        nj.crossJoin(F.broadcast(nn))
        .select(
            F.expr(
                f"CAST((CAST(n_j AS DOUBLE) / CAST(n AS DOUBLE))"
                f" * (({_NMI_LN_N}) - ({_NMI_LN_NJ})) AS DECIMAL(28,12))"
            ).alias("v")
        )
        .agg(F.sum("v").alias("hy"))
    )
    n_clusters = ni.agg(F.count(F.lit(1)).alias("n_clusters"))
    n_labels = nj.agg(F.count(F.lit(1)).alias("n_labels"))
    w = (
        nn.crossJoin(F.broadcast(pur))
        .crossJoin(F.broadcast(mi))
        .crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .crossJoin(F.broadcast(n_clusters))
        .crossJoin(F.broadcast(n_labels))
    )
    i_d = F.col("i_sum").cast("double")
    return w.select(
        F.col("n").cast("bigint").alias("n_vectors"),
        F.col("n_clusters").cast("bigint").alias("n_clusters"),
        F.col("n_labels").cast("bigint").alias("n_labels"),
        (F.col("agree").cast("double") / F.col("n").cast("double")).alias("purity"),
        i_d.alias("mi_nats"),
        (
            i_d
            / F.sqrt(F.col("hx").cast("double") * F.col("hy").cast("double"))
        ).alias("nmi"),
    )


# --- metadata-filtered search (r11) --------------------------------------------------------

_FILTERED_TOPK_SQL = """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
prod AS (
  SELECT e.vec_id, e.label,
         SUM(CAST(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))
             * CAST(CAST(q.qe[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))) AS dot,
         SUM(CAST(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))
             * CAST(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))) AS na,
         SUM(CAST(CAST(q.qe[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))
             * CAST(CAST(q.qe[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))) AS nb
  FROM embeddings e, q, generate_series(1, 64) AS t(i)
  WHERE e.label IN (2, 5) AND e.vec_id <> 0
  GROUP BY e.vec_id, e.label
),
scored AS (
  SELECT vec_id, label,
         CAST(ROUND(dot, 12) AS DOUBLE)
           / (SQRT(CAST(ROUND(na, 12) AS DOUBLE))
              * SQRT(CAST(ROUND(nb, 12) AS DOUBLE))) AS cosine
  FROM prod
)
SELECT vec_id, label, cosine,
       CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id) AS INT) AS rank
FROM scored
ORDER BY cosine DESC, vec_id
LIMIT 10
"""


@register("sim_filtered_topk", oracle=_FILTERED_TOPK_SQL,
          tags=("similarity",))
def sim_filtered_topk(spark, sf_dir):
    """Metadata-FILTERED vector search — the retrieval shape RAG
    stacks actually run ('nearest neighbors WHERE label in …'), and
    the one naive pipelines get backwards: the label predicate is
    applied BEFORE scoring, in the scan stage (PushedFilters on the
    parquet read), so at 100 TB the dot-product work is proportional
    to the filtered corpus, not the full one — score-then-filter
    also silently under-fills k when survivors are sparse.
    Scoring is the `sim_cosine_topk_exact` decimal-dot discipline, so
    the filtered top-10 is hash-exact; rank ties break on vec_id."""
    from etlalchemy_spark.operators.similarity import cosine_topk_exact

    emb = t(spark, sf_dir, "embeddings")
    filtered = emb.where(F.col("label").isin(2, 5) & (F.col("vec_id") != 0))
    out = cosine_topk_exact(
        filtered, "vec_id", "embedding", _query_vec(spark, sf_dir), k=10
    )
    # re-attach the label by broadcasting the k-row RESULT against the
    # metadata projection (broadcasting the metadata side would ship
    # the whole corpus's ids at scale)
    lbl = emb.select("vec_id", "label")
    return (
        lbl.join(F.broadcast(out), "vec_id")
        .select("vec_id", "label", "cosine", "rank")
        .orderBy(F.col("cosine").desc(), "vec_id")
    )


# --- oracle-exact TRAINED IVF (r12) ------------------------------------------------------------


def _ivf_kmeans_sql(k_cells: int = 8, iters: int = 2, n_probe: int = 2) -> str:
    """DuckDB replay of ivf_kmeans_exact_topk's ENTIRE training loop:
    grid quantization, integer-L2 Lloyd assignment ((dist, cell)
    packed arg_min — ties to the lowest cell), and the
    floor(sum/count + 0.5) centroid re-quantization, unrolled one CTE
    triple (distances, assignment, new centroids) per iteration — then
    the same probe + decimal-exact cosine scoring the other sim_*
    oracles use. Bit-equality holds because every step is integer
    arithmetic or one correctly-rounded IEEE division of exact
    int64s. dist <= 64*254^2 < 2^23, so dist*k_cells + cid packs
    losslessly into BIGINT."""
    ctes = [
        (
            "g AS (SELECT vec_id, CAST(i AS INT) AS dim,"
            " CAST(FLOOR(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 127 + 0.5) AS BIGINT) AS x"
            " FROM embeddings CROSS JOIN generate_series(1, 64) AS t(i))"
        ),
        # Seeding twin of the operator's ORDER BY id LIMIT k_cells.
        # WHERE vec_id < k_cells is equivalent ONLY because the
        # embeddings table's vec_ids are 0-based and contiguous
        # (TESTDATA.md); on a gappy id space this CTE would seed fewer
        # cells than the operator (which now raises < k_cells rows).
        f"c0 AS (SELECT CAST(vec_id AS INT) AS cid, dim, x AS c FROM g WHERE vec_id < {k_cells})",
    ]
    prev = "c0"
    for r in range(1, iters + 1):
        ctes.append(
            f"d{r} AS (SELECT g.vec_id, c.cid, SUM((g.x - c.c) * (g.x - c.c)) AS dist"
            f" FROM g JOIN {prev} c USING (dim) GROUP BY 1, 2)"
        )
        ctes.append(
            f"a{r} AS (SELECT vec_id, arg_min(cid, dist * {k_cells} + cid) AS cell"
            f" FROM d{r} GROUP BY vec_id)"
        )
        ctes.append(
            f"s{r} AS (SELECT a.cell AS cid, g.dim, SUM(g.x) AS s, COUNT(*) AS n"
            f" FROM g JOIN a{r} a USING (vec_id) GROUP BY 1, 2)"
        )
        ctes.append(
            f"c{r} AS (SELECT p.cid, p.dim, COALESCE("
            f"CAST(FLOOR(CAST(s.s AS DOUBLE) / CAST(s.n AS DOUBLE) + 0.5) AS BIGINT), p.c) AS c"
            f" FROM {prev} p LEFT JOIN s{r} s ON s.cid = p.cid AND s.dim = p.dim)"
        )
        prev = f"c{r}"
    final_d = (
        f"df AS (SELECT g.vec_id, c.cid, SUM((g.x - c.c) * (g.x - c.c)) AS dist"
        f" FROM g JOIN {prev} c USING (dim) GROUP BY 1, 2)"
    )
    final_a = (
        f"af AS (SELECT vec_id, arg_min(cid, dist * {k_cells} + cid) AS cell"
        f" FROM df GROUP BY vec_id)"
    )
    query_legs = f"""
qg AS (
  SELECT CAST(i AS INT) AS dim,
         CAST(FLOOR(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 127 + 0.5) AS BIGINT) AS x
  FROM embeddings CROSS JOIN generate_series(1, 64) AS t(i)
  WHERE vec_id = 0
),
qd AS (
  SELECT c.cid, SUM((qg.x - c.c) * (qg.x - c.c)) AS dist
  FROM qg JOIN {prev} c USING (dim) GROUP BY 1
),
probe AS (SELECT cid AS cell FROM qd ORDER BY dist, cid LIMIT {n_probe}),
cand AS (SELECT af.vec_id FROM af JOIN probe USING (cell)),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
prod AS (
  SELECT e.vec_id,
         SUM(CAST(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))
             * CAST(CAST(q.qe[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))) AS dot,
         SUM(CAST(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))
             * CAST(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))) AS na,
         SUM(CAST(CAST(q.qe[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))
             * CAST(CAST(q.qe[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,10))) AS nb
  FROM embeddings e JOIN cand USING (vec_id), q, generate_series(1, 64) AS t(i)
  GROUP BY e.vec_id
),
scored AS (
  SELECT vec_id,
         CAST(ROUND(dot, 12) AS DOUBLE)
         / (SQRT(CAST(ROUND(na, 12) AS DOUBLE)) * SQRT(CAST(ROUND(nb, 12) AS DOUBLE))) AS cosine
  FROM prod
)
SELECT vec_id, cosine,
       CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id) AS INT) AS rank
FROM scored
ORDER BY cosine DESC, vec_id
LIMIT 10
"""
    return "WITH " + ",\n".join(ctes + [final_d, final_a]) + "," + query_legs


@register(
    "sim_ivf_kmeans_exact_topk",
    oracle=_ivf_kmeans_sql(),
    tags=("similarity", "iterative"),
)
def sim_ivf_kmeans_exact_topk(spark, sf_dir):
    """IVF top-10 with a TRAINED (2 Lloyd iterations, k=8 cells)
    coarse quantizer that is fully ORACLE-EXACT — the r11 verdict's
    named gap (sim_ivf_kmeans_topk was rows-only because float means
    are reduction-order-dependent). The trainer runs on the shared
    integer grid with floor-half-up centroid re-quantization
    (operators/similarity.ivf_kmeans_exact_topk), so DuckDB replays
    training, assignment, probe selection, and scoring bit-for-bit.
    The float/production twin (sim_ivf_kmeans_topk) keeps its recall
    pin; this gate proves the TRAINING LOOP itself, not just the
    probe."""
    from etlalchemy_spark.operators.similarity import ivf_kmeans_exact_topk

    emb = t(spark, sf_dir, "embeddings")
    return ivf_kmeans_exact_topk(
        emb, "vec_id", "embedding", _query_vec(spark, sf_dir),
        k_cells=8, iters=2, k=10, n_probe=2,
    )


# --- oracle-exact ADC scoring (r12) ------------------------------------------------------------

_PQ_ADC_EXACT_SQL = """
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE)*127 + 0.5) AS BIGINT)) AS qv
  FROM embeddings
), anch AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code, qv AS aqv
  FROM q ORDER BY vec_id LIMIT 16
), dist AS (
  SELECT q.vec_id, m.m AS subspace, a.code,
         list_sum(list_transform(range(1, 9),
           d -> (q.qv[m.m*8+d] - a.aqv[m.m*8+d])*(q.qv[m.m*8+d] - a.aqv[m.m*8+d]))) AS dist
  FROM q
  CROSS JOIN generate_series(0, 7) AS m(m)
  CROSS JOIN anch a
), codes AS (
  SELECT vec_id, subspace, code
  FROM (
    SELECT vec_id, subspace, code,
           ROW_NUMBER() OVER (PARTITION BY vec_id, subspace ORDER BY dist, code) AS rn
    FROM dist) WHERE rn = 1
), qgrid AS (SELECT qv FROM q WHERE vec_id = 0),
lut AS (
  SELECT m.m AS subspace, a.code,
         list_sum(list_transform(range(1, 9),
           d -> (qg.qv[m.m*8+d] - a.aqv[m.m*8+d])*(qg.qv[m.m*8+d] - a.aqv[m.m*8+d]))) AS lut
  FROM qgrid qg
  CROSS JOIN generate_series(0, 7) AS m(m)
  CROSS JOIN anch a
), scored AS (
  SELECT c.vec_id, CAST(SUM(l.lut) AS BIGINT) AS adc_dist
  FROM codes c JOIN lut l ON l.subspace = c.subspace AND l.code = c.code
  GROUP BY c.vec_id
)
SELECT vec_id, adc_dist,
       CAST(ROW_NUMBER() OVER (ORDER BY adc_dist, vec_id) AS INT) AS rank
FROM scored
ORDER BY adc_dist, vec_id
LIMIT 10
"""


@register("sim_pq_adc_exact_topk", oracle=_PQ_ADC_EXACT_SQL, tags=("similarity",))
def sim_pq_adc_exact_topk(spark, sf_dir):
    """ADC SCORING made oracle-exact (r12): sim_pq_codes_exact gated
    the encoder, this gates the other half of the PQ read path — the
    query-to-codebook lookup table and the per-vector sum of its 8
    entries, all integer on the shared grid, ties to the lowest id.
    Together the two cover every arithmetic step of the PQ family;
    sim_pq_adc_topk remains the kmeans-trained float/production path
    with its recall pin. One broadcast LUT join + one per-id sum —
    the deployed shape scans 8 small ints per vector instead of 64
    floats."""
    from etlalchemy_spark.operators.similarity import (
        pq_adc_exact_topk,
        pq_anchor_codebooks,
    )

    emb = t(spark, sf_dir, "embeddings")
    anchors = pq_anchor_codebooks(emb, "vec_id", "embedding", n_codes=16)
    return pq_adc_exact_topk(
        emb, "vec_id", "embedding", _query_vec(spark, sf_dir), anchors
    )
