"""Similarity search over embedding columns (array<float>).

Mandated extension surface (BASELINE.json): brute-force cosine top-k as
the exact baseline, plus LSH-bucketed variants as the 100 TB path.

All vector math is expression-level (``zip_with`` + ``aggregate`` run
inside codegen) — no UDFs, no collect. For oracle-exact queries the dot
products accumulate in DECIMAL (order-proof); the LSH variants use
plain double (they are rows-only checks).

Scale notes: brute-force top-k is one pass over n vectors × O(d) per
row with a TakeOrderedAndProject — fine for one query vector even at
billions of rows. For batch top-k (m queries × n base) use the LSH /
IVF variants: candidates per query collapse from n to a bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _lit_vec(vec: list[float]):
    """Literal double array as ONE parsed expression: the per-element
    F.lit form cost ~2 Py4J roundtrips per dimension of pure plan-
    construction time. CAST('<repr>' AS DOUBLE) parses the shortest
    round-trip repr back to the identical bits F.lit would embed."""
    body = ", ".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in vec)
    return F.expr(f"array({body})")


# Per-element decimal width for exact dot products: embeddings are
# unit-scale floats, so (12,10) fits; products are (25,20) and a
# grouped SUM caps at decimal(35,20) — exact, no precision loss.
# (F.aggregate can't do this: lambda-fold addition re-derives the
# accumulator type each step and Spark rejects/rounds it.)
_D = "decimal(12,10)"


def exact_cosine(df: DataFrame, keys: list[str], va, vb) -> DataFrame:
    """Append an oracle-exact ``cosine`` column per ``keys`` group.

    ``va``/``vb`` are array columns (or literal arrays). Explodes one
    side, sums decimal products (exact, order-insensitive), finishes
    with sqrt/divide in double on identical operands — bit-identical
    across engines. Costs a 64× row expansion + one groupBy on keys;
    use the zip_with double path when oracle-exactness isn't needed."""
    va = va if isinstance(va, Column) else F.col(va)
    vb = vb if isinstance(vb, Column) else F.col(vb)
    e = (
        df.select(*keys, vb.alias("_vb"), F.posexplode(va).alias("_pos", "_xa"))
        # try_element_at: a length mismatch degrades the overhanging
        # positions to NULL (dropped by the sums) instead of throwing
        # INVALID_ARRAY_INDEX under Spark's default ANSI mode
        .withColumn("_xb", F.try_element_at("_vb", F.col("_pos") + 1))
    )
    # float → DOUBLE → decimal: DuckDB's direct float→decimal cast is
    # imprecise (fixed-point artifact); via double both engines round
    # the same binary value correctly
    xa = F.col("_xa").cast("double").cast(_D)
    xb = F.col("_xb").cast("double").cast(_D)
    g = e.groupBy(*keys).agg(
        F.sum(xa * xb).alias("_dot"),
        F.sum(xa * xa).alias("_na"),
        F.sum(xb * xb).alias("_nb"),
    )
    # ROUND to scale 12 before the double cast: at scale 20 the
    # unscaled int exceeds 2^53 and DuckDB's decimal→double conversion
    # double-rounds (off-by-one-ulp vs Spark's exact conversion)
    def to_dbl(c):
        return F.round(c, 12).cast("double")

    # try_divide: a zero-norm vector yields NULL cosine instead of a
    # DIVIDE_BY_ZERO abort under ANSI mode (downstream top-k drops
    # NULL-scored rows)
    return g.select(
        *keys,
        F.try_divide(
            to_dbl(F.col("_dot")),
            F.sqrt(to_dbl(F.col("_na"))) * F.sqrt(to_dbl(F.col("_nb"))),
        ).alias("cosine"),
    )


def dot_double(a, b):
    """Fast path (not oracle-exact): double accumulation."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_double(a, b):
    # try_divide: zero-norm vectors score NULL instead of aborting the
    # whole query under ANSI division
    return F.try_divide(
        dot_double(a, b), F.sqrt(dot_double(a, a)) * F.sqrt(dot_double(b, b))
    )


def _topk_ranked(scored: DataFrame, id_col: str, k: int) -> DataFrame:
    """Distributed top-k with a rank column. ``orderBy().limit(k)``
    compiles to TakeOrderedAndProject (per-partition heaps + a k-row
    driver merge — no global sort, no single-partition shuffle); the
    ≤k survivors are then ranked by one collect_list aggregate +
    array_sort + posexplode — O(k) state, no WindowExec at all (a
    window here, even over k rows, would plan unpartitioned and
    single-task; Spark 4 strips foldable partition keys). NULL-scored
    rows (zero-norm vectors under the try_divide guards) are dropped
    up front: the limit's NULLS-LAST order and array_sort's
    nulls-first struct order would otherwise DISAGREE, handing rank 1
    to an unscorable row whenever a bucket holds fewer than k real
    candidates."""
    scored = scored.where(F.col("cosine").isNotNull())
    top = scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)
    arr = F.array_sort(
        F.collect_list(F.struct((-F.col("cosine")).alias("_neg"), F.col(id_col), F.col("cosine")))
    )
    return (
        top.agg(arr.alias("_a"))
        .select(F.posexplode("_a").alias("_pos", "_e"))
        .select(
            F.col(f"_e.{id_col}").alias(id_col),
            F.col("_e.cosine").alias("cosine"),
            (F.col("_pos") + 1).cast("int").alias("rank"),
        )
    )


def cosine_topk_exact(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
) -> DataFrame:
    """Brute-force cosine top-k against one query vector. Output:
    (id, cosine, rank) — deterministic total order (cosine desc, id)."""
    q = _lit_vec(query_vec)
    scored = exact_cosine(df, [id_col], F.col(vec_col), q)
    return _topk_ranked(scored, id_col, k)


# --- random-hyperplane LSH (approximate, scale path) -----------------------

def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (pure-python LCG; no
    numpy dependency in the plan, values baked as literals)."""
    state = seed
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(((state >> 11) / float(1 << 53)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def query_bits(query_vec: list[float], planes: list[list[float]]) -> int:
    """Driver-side bucket id of a query vector — the ONE definition of
    the sign convention shared by the LSH probes (a fix applied to one
    inline copy and not the other would silently diverge the buckets
    from the engine-side ``lsh_bucket``)."""
    qbits = 0
    for i, p in enumerate(planes):
        if sum(x * y for x, y in zip(query_vec, p)) > 0:
            qbits |= 1 << i
    return qbits


def lsh_bucket(vec_col, planes: list[list[float]]):
    """Bit-signature bucket id: sign of <v, plane_i> per plane."""
    bits = [
        F.when(dot_double(vec_col, _lit_vec(p)) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i, p in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def cosine_topk_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: restrict exact scoring to the query's LSH
    bucket (plus nothing — recall traded for a ~2^planes candidate
    cut). Candidate filter is a partition-prunable int equality."""
    dim = len(query_vec)
    planes = hyperplanes(dim, n_planes, seed)
    # query bucket computed driver-side (tiny, pure python)
    qbits = query_bits(query_vec, planes)
    q = _lit_vec(query_vec)
    cands = df.withColumn("_bucket", lsh_bucket(F.col(vec_col), planes)).where(
        F.col("_bucket") == qbits
    )
    scored = cands.select(F.col(id_col), cosine_double(F.col(vec_col), q).alias("cosine"))
    return _topk_ranked(scored, id_col, k)


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    n_planes: int = 12,
    seed: int = 7,
    dim: int | None = None,
) -> DataFrame:
    """Embedding near-dup: LSH-bucket candidates (vectors sharing the
    full bit signature), exact cosine verify within bucket. Linear
    candidate generation — the all-pairs version of cosine_topk_lsh.

    ``dim`` defaults to the observed vector length (one-row probe). A
    wrong dim would NULL every plane dot product, collapse all vectors
    into bucket 0, and degrade candidate generation to the full cross
    join this function exists to avoid."""
    if dim is None:
        probe = (
            df.select(F.size(F.col(vec_col)).alias("d"))
            .where(F.col("d").isNotNull())  # skip NULL-vector rows
            .first()
        )
        if probe is None:
            from pyspark.sql import types as T

            idt = df.schema[id_col].dataType  # keep the caller's id type
            return df.sparkSession.createDataFrame(
                [],
                T.StructType(
                    [
                        T.StructField("id_a", idt),
                        T.StructField("id_b", idt),
                        T.StructField("cosine", T.DoubleType()),
                    ]
                ),
            )
        dim = probe["d"]
    planes = hyperplanes(dim, n_planes, seed)
    bucketed = df.select(
        F.col(id_col), F.col(vec_col), lsh_bucket(F.col(vec_col), planes).alias("_bucket")
    )
    a = bucketed.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "_bucket"
    )
    b = bucketed.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "_bucket"
    )
    return (
        a.join(b, "_bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine_double(F.col("va"), F.col("vb")))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )




def _unit(vecs: list[list[float]]) -> list[list[float]]:
    """Normalize centroids to unit norm so argmax(dot) == argmax(cosine):
    raw dot products bias assignment toward high-norm centroids."""
    out = []
    for v in vecs:
        n = sum(x * x for x in v) ** 0.5
        out.append([x / n for x in v] if n > 0 else list(v))
    return out


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 2,
) -> DataFrame:
    """IVF-flat: assign each vector to its nearest centroid (one pass,
    argmax over c centroids), search only the query's n_probe nearest
    cells. Centroids are caller-supplied (e.g. sampled ids or a k-means
    fit) and unit-normalized here, so the argmax over dot products is a
    true cosine assignment; assignment is a deterministic argmax
    expression."""
    centroids = _unit(centroids)

    def nearest_cell(vec):
        sims = F.array(*[dot_double(vec, _lit_vec(c)) for c in centroids])
        # first index of the max similarity (deterministic tie-break)
        return F.array_position(sims, F.array_max(sims)) - 1

    # query's n_probe nearest cells, driver-side
    qsims = [
        (i, sum(x * y for x, y in zip(query_vec, c))) for i, c in enumerate(centroids)
    ]
    probe_cells = [i for i, _ in sorted(qsims, key=lambda t: -t[1])[:n_probe]]

    q = _lit_vec(query_vec)
    assigned = df.withColumn("_cell", nearest_cell(F.col(vec_col)).cast("int"))
    cands = assigned.where(F.col("_cell").isin(probe_cells))
    scored = cands.select(F.col(id_col), cosine_double(F.col(vec_col), q).alias("cosine"))
    return _topk_ranked(scored, id_col, k)


def kmeans_centroids(
    df: DataFrame, vec_col: str, k: int = 8, iters: int = 3, id_col: str | None = None
) -> list[list[float]]:
    """Lloyd's k-means over an embedding column in pure DataFrame ops —
    the IVF training step (and the house template for iterative
    algorithms: per-iteration state is aggregate-sized, so it lives on
    the driver as plan literals; the DATA never leaves executors).

    Init: first k vectors in id order (deterministic). Each iteration:
    argmax-assign to the nearest centroid (cosine), recompute each
    centroid as the per-dimension mean via posexplode + groupBy — one
    shuffle of k×dim partial sums per iteration, never the vectors.
    Only the k×dim centroid matrix is collected.
    """
    order = F.col(id_col) if id_col else F.monotonically_increasing_id()
    centroids = [
        [float(x) for x in r[0]]
        for r in df.select(vec_col).orderBy(order).limit(k).collect()
    ]
    for _ in range(iters):
        # assignment uses UNIT centroids (cosine argmax); the update
        # step still averages raw vectors (standard spherical k-means)
        sims = F.array(*[dot_double(F.col(vec_col), _lit_vec(c)) for c in _unit(centroids)])
        cell = (F.array_position(sims, F.array_max(sims)) - 1).cast("int")
        means = (
            df.select(cell.alias("_cell"), F.posexplode(F.col(vec_col)).alias("_pos", "_x"))
            .groupBy("_cell", "_pos")
            .agg(F.avg("_x").alias("_m"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(r["_cell"], {})[r["_pos"]] = r["_m"]
        dim = len(centroids[0])
        centroids = [
            [by_cell.get(c, {}).get(p, centroids[c][p]) for p in range(dim)]
            for c in range(len(centroids))
        ]
    return centroids


def cosine_topk_lsh_multiprobe(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Multi-probe LSH: search the query's bucket plus every bucket at
    Hamming distance 1 (the planes the query is least certain about
    flip first in near neighbors). Recall approaches exact at the cost
    of (n_planes+1)/2^n_planes of the data — still a >95% candidate cut
    at 8 planes."""
    planes = hyperplanes(len(query_vec), n_planes, seed)
    qbits = query_bits(query_vec, planes)
    probes = [qbits] + [qbits ^ (1 << i) for i in range(n_planes)]
    q = _lit_vec(query_vec)
    cands = df.withColumn("_bucket", lsh_bucket(F.col(vec_col), planes)).where(
        F.col("_bucket").isin(probes)
    )
    scored = cands.select(F.col(id_col), cosine_double(F.col(vec_col), q).alias("cosine"))
    return _topk_ranked(scored, id_col, k)


# --- oracle-exact hyperplane LSH -------------------------------------------

def lsh_buckets_exact(
    df: DataFrame, id_col: str, vec_col: str, planes: list[list[float]]
) -> DataFrame:
    """(id, bucket) with bucket bits = sign of DECIMAL dot products
    against literal hyperplanes — exact, order-insensitive, hence
    bit-identical in any engine (the double-fold ``lsh_bucket`` above
    is the production fast path). One posexplode + one groupBy."""
    e = df.select(F.col(id_col), F.posexplode(F.col(vec_col)).alias("_pos", "_x"))
    xd = F.col("_x").cast("double").cast(_D)
    aggs = []
    for j, p in enumerate(planes):
        body = ", ".join(f"CAST(CAST('{float(v)!r}' AS DOUBLE) AS {_D})" for v in p)
        plit = F.expr(f"array({body})")
        # try_element_at: a dim > len(planes[j]) mismatch degrades to
        # NULL terms (skipped by SUM) instead of an ANSI index abort
        aggs.append(F.sum(xd * F.try_element_at(plit, F.col("_pos") + 1)).alias(f"_d{j}"))
    sums = e.groupBy(id_col).agg(*aggs)
    bucket = None
    for j in range(len(planes)):
        term = F.when(F.col(f"_d{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = term if bucket is None else bucket + term
    return sums.select(F.col(id_col), bucket.cast("int").alias("bucket"))


def cosine_topk_lsh_exact(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_id: int,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Hyperplane-LSH top-k, fully reproducible: candidates = vectors
    sharing the query's bucket (decimal-exact bit signs, query bucket
    computed in-engine from its own row), scored with the decimal-exact
    cosine. Same candidate cut as the production path, zero
    engine-specific arithmetic."""
    planes = hyperplanes(len(query_vec), n_planes, seed)
    bkt = lsh_buckets_exact(df, id_col, vec_col, planes)
    qb = bkt.where(F.col(id_col) == query_id).select(F.col("bucket").alias("_qb"))
    cand_ids = bkt.join(F.broadcast(qb), bkt.bucket == F.col("_qb")).select(id_col)
    cands = df.join(cand_ids, id_col)
    scored = exact_cosine(cands, [id_col], F.col(vec_col), _lit_vec(query_vec))
    return _topk_ranked(scored, id_col, k)


def embedding_near_dup_pairs_exact(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.3,
    n_planes: int = 6,
    seed: int = 7,
    dim: int = 64,
) -> DataFrame:
    """Embedding near-dup with exact cross-engine reproducibility:
    candidates = pairs sharing the full decimal-sign LSH signature,
    verified with the decimal-exact cosine. Candidate generation stays
    linear (one bucket equi-join); only bucket-mates pay the exact
    scoring."""
    planes = hyperplanes(dim, n_planes, seed)
    bkt = lsh_buckets_exact(df, id_col, vec_col, planes)
    withb = df.join(bkt, id_col)
    a = withb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"), "bucket")
    b = withb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"), "bucket")
    pairs = a.join(b, "bucket").where(F.col("id_a") < F.col("id_b"))
    scored = exact_cosine(pairs, ["id_a", "id_b"], F.col("_va"), F.col("_vb"))
    return scored.where(F.col("cosine") >= threshold).select("id_a", "id_b", "cosine")


def ivf_topk_exact(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_id: int,
    query_vec: list[float],
    centroid_ids: list[int],
    k: int = 10,
    n_probe: int = 2,
) -> DataFrame:
    """IVF-flat top-k with full cross-engine reproducibility: centroids
    are existing rows (``centroid_ids``), every vector is assigned to
    its max-cosine centroid via the decimal-exact cosine (ties → lowest
    centroid id), the query's ``n_probe`` best cells are derived
    in-engine from its own assignment scores, and the probed candidates
    are scored exactly. No driver-side float math anywhere."""
    cents = df.where(F.col(id_col).isin(centroid_ids)).select(
        F.col(id_col).alias("_cid"), F.col(vec_col).alias("_cvec")
    )
    pairs = df.select(F.col(id_col), F.col(vec_col)).crossJoin(F.broadcast(cents))
    scored = exact_cosine(pairs, [id_col, "_cid"], F.col(vec_col), F.col("_cvec"))
    w = Window.partitionBy(id_col).orderBy(F.desc("cosine"), F.col("_cid"))
    ranked = scored.withColumn("_crank", F.row_number().over(w))

    cells = ranked.where(F.col("_crank") == 1).select(id_col, F.col("_cid").alias("_cell"))
    probe = (
        ranked.where((F.col(id_col) == query_id) & (F.col("_crank") <= n_probe))
        .select(F.col("_cid").alias("_cell"))
    )
    cand_ids = cells.join(F.broadcast(probe), "_cell").select(id_col)
    cands = df.join(cand_ids, id_col)
    out = exact_cosine(cands, [id_col], F.col(vec_col), _lit_vec(query_vec))
    return _topk_ranked(out, id_col, k)


def cosine_topk_lsh_multiprobe_exact(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_id: int,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Multi-probe variant of ``cosine_topk_lsh_exact``: candidates
    come from the query's bucket plus every bucket at Hamming distance
    1, with the probe set derived in-engine by XOR-ing the query's own
    bucket — recall approaches exact while staying reproducible."""
    planes = hyperplanes(len(query_vec), n_planes, seed)
    bkt = lsh_buckets_exact(df, id_col, vec_col, planes)
    qb = bkt.where(F.col(id_col) == query_id).select(F.col("bucket").alias("_qb"))
    probed = bkt.crossJoin(F.broadcast(qb))
    cond = F.col("bucket") == F.col("_qb")
    for i in range(n_planes):
        cond = cond | (F.col("bucket") == F.col("_qb").bitwiseXOR(F.lit(1 << i)))
    cand_ids = probed.where(cond).select(id_col)
    cands = df.join(cand_ids, id_col)
    scored = exact_cosine(cands, [id_col], F.col(vec_col), _lit_vec(query_vec))
    return _topk_ranked(scored, id_col, k)


# --- int8 scalar quantization (compressed exact-arithmetic path) -----------


def int8_quantize(vec_col) -> Column:
    """Per-vector symmetric int8 quantization: s = max|v_i|, q_i =
    floor(v_i/s·127 + 0.5) ∈ [-127, 127] (half-up via floor — the one
    rounding rule Spark and DuckDB share bit-for-bit; banker's rounding
    would diverge). Cosine is scale-invariant per vector, so the
    per-vector scale drops out of ranking entirely and everything
    downstream of quantization is INTEGER arithmetic — exact on any
    engine with no decimal machinery, and a 4× scan-bandwidth /
    memory cut vs float32, which is the point at 100 TB: quantize once
    at ingest, score candidates in int8, re-rank the short list in
    float only if the application needs calibrated scores."""
    v = vec_col if isinstance(vec_col, Column) else F.col(vec_col)
    s = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    return F.when(
        s == F.lit(0.0), F.transform(v, lambda x: F.lit(0).cast("long"))
    ).otherwise(
        F.transform(
            v, lambda x: F.floor(x.cast("double") / s * 127 + F.lit(0.5)).cast("long")
        )
    )


def int8_quantize_py(vec: list[float]) -> list[int]:
    """Driver-side twin of ``int8_quantize`` for the query vector.
    Python floats ARE IEEE doubles and the op order mirrors the
    engine expression exactly, so the ints match bit-for-bit."""
    import math

    s = max(abs(float(x)) for x in vec)
    if s == 0:
        return [0] * len(vec)
    return [math.floor(float(x) / s * 127 + 0.5) for x in vec]


def int8_cosine_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_q: list[int],
    k: int = 10,
) -> DataFrame:
    """Brute-force top-k on QUANTIZED vectors: integer zip_with dot +
    integer norms inside codegen, one double division at the end,
    TakeOrderedAndProject for the k survivors. Output (id, cosine,
    rank) — same shape as cosine_topk_exact so recall audits compose."""
    qarr = F.expr("array(" + ", ".join(f"{int(x)}L" for x in query_q) + ")")
    nq = sum(int(x) * int(x) for x in query_q)
    q = int8_quantize(vec_col)
    acc0 = F.lit(0).cast("long")
    dot = F.aggregate(F.zip_with(q, qarr, lambda a, b: a * b), acc0, lambda a, x: a + x)
    nb = F.aggregate(F.transform(q, lambda x: x * x), acc0, lambda a, x: a + x)
    scored = df.select(
        F.col(id_col),
        F.try_divide(
            dot.cast("double"),
            F.sqrt(nb.cast("double")) * F.sqrt(F.lit(nq).cast("double")),
        ).alias("cosine"),
    )
    return _topk_ranked(scored, id_col, k)
