"""Deterministic content-hash sampling queries (oracle-exact).

Engine RNG sampling can't be oracle-checked; these sample by portable
md5-derived hash (operators/sampling.py), so Spark and DuckDB select
the IDENTICAL rows — reproducibility is the point, and the harness
proves it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etlalchemy_spark.operators.sampling import (
    bernoulli_sample,
    fixed_size_per_group,
    stratified_sample,
)
from etlalchemy_spark.registry import register
from etlalchemy_spark.queries._util import t


def _bucket_sql(key_expr: str, salt: str) -> str:
    """DuckDB twin of operators.sampling.hash_bucket: byte-swap
    md5_number_upper to recover the big-endian 60-bit md5 prefix, then
    mod 1e6. (Single-expression form: md5_number_upper is evaluated
    once per reference by DuckDB's CSE.)"""
    u = f"md5_number_upper('{salt}' || CAST({key_expr} AS VARCHAR))"
    return f"""(CAST((
    (CAST(({u} >> 0)  & 255 AS UBIGINT) * 72057594037927936) +
    (CAST(({u} >> 8)  & 255 AS UBIGINT) * 281474976710656) +
    (CAST(({u} >> 16) & 255 AS UBIGINT) * 1099511627776) +
    (CAST(({u} >> 24) & 255 AS UBIGINT) * 4294967296) +
    (CAST(({u} >> 32) & 255 AS UBIGINT) * 16777216) +
    (CAST(({u} >> 40) & 255 AS UBIGINT) * 65536) +
    (CAST(({u} >> 48) & 255 AS UBIGINT) * 256) +
     CAST(({u} >> 56) & 255 AS UBIGINT)
  ) // 16 AS BIGINT) % 1000000)"""


_BERNOULLI_SQL = f"""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE {_bucket_sql("o_orderkey", "s1:")} < 50000
"""


@register("sample_bernoulli_hash", oracle=_BERNOULLI_SQL, tags=("sampling",))
def sample_bernoulli_hash(spark, sf_dir):
    """Deterministic 5% Bernoulli sample of orders, keyed on
    o_orderkey — a narrow filter (no shuffle, no RNG), row-identical
    in any engine."""
    o = t(spark, sf_dir, "orders")
    return bernoulli_sample(o, F.col("o_orderkey"), 0.05, salt="s1:").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


_STRAT_RATES = {"en": 0.1, "zh": 0.5, "es": 0.5, "de": 0.8, "fr": 0.8}
_STRAT_CASE = " ".join(
    f"WHEN lang = '{v}' THEN {round(r * 1_000_000)}" for v, r in sorted(_STRAT_RATES.items())
)
_STRATIFIED_SQL = f"""
SELECT doc_id, lang, source
FROM documents
WHERE {_bucket_sql("doc_id", "s2:")} < (CASE {_STRAT_CASE} ELSE 0 END)
"""


@register("sample_stratified_hash", oracle=_STRATIFIED_SQL, tags=("sampling",))
def sample_stratified_hash(spark, sf_dir):
    """Stratified language rebalancing: downsample dominant 'en' to
    10%, keep rarer languages at higher rates — the standard corpus
    rebalance, still a pure narrow filter."""
    d = t(spark, sf_dir, "documents")
    return stratified_sample(
        d, F.col("doc_id"), F.col("lang"), _STRAT_RATES, salt="s2:"
    ).select("doc_id", "lang", "source")


_PER_GROUP_SQL = f"""
SELECT source, doc_id, lang FROM (
  SELECT source, doc_id, lang,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY {_bucket_sql("doc_id", "s3:")}, CAST(doc_id AS VARCHAR)
         ) AS rn
  FROM documents
) WHERE rn <= 3
"""


@register("sample_fixed_per_group", oracle=_PER_GROUP_SQL, tags=("sampling", "window"))
def sample_fixed_per_group(spark, sf_dir):
    """Exactly 3 documents per source, uniformly chosen by hash order —
    deterministic per-group reservoir sampling (one window shuffle)."""
    d = t(spark, sf_dir, "documents")
    return fixed_size_per_group(d, ["source"], F.col("doc_id"), 3, salt="s3:").select(
        "source", "doc_id", "lang"
    )


_WEIGHTED_SQL = """
WITH c AS (
  SELECT l_orderkey, l_linenumber, CAST(FLOOR(l_quantity) AS BIGINT) AS w,
         SUM(CAST(FLOOR(l_quantity) AS BIGINT)) OVER (
           ORDER BY l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM lineitem
), tot AS (SELECT SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS wtot FROM lineitem)
SELECT l_orderkey, l_linenumber,
       CAST((cum * 200) // wtot - ((cum - w) * 200) // wtot AS BIGINT) AS n_picks
FROM c CROSS JOIN tot
WHERE (cum * 200) // wtot - ((cum - w) * 200) // wtot > 0
"""


@register("sample_weighted_systematic", oracle=_WEIGHTED_SQL, tags=("sampling",))
def sample_weighted_systematic(spark, sf_dir):
    """200 quantity-weighted systematic draws from lineitem
    (probability proportional to size): 200 even thresholds over the
    cumulative-quantity axis, each row drawn once per threshold in its
    interval. The cumulative sum is the range-bucketed two-phase
    prefix — the oracle's single ORDER BY window, without the single
    partition. Weights are FLOOR(l_quantity) on BOTH sides: a bare
    double→BIGINT cast truncates in Spark but rounds in DuckDB, so on
    data with fractional quantities the engines would silently pick
    different rows (r7 driver hash mismatch, unreproducible on the
    all-integral local fixture); floor is engine-identical. The
    oracle's n_picks is CAST to BIGINT so DuckDB's HUGEINT window-sum
    arithmetic can't leak a wider type into the hash comparison."""
    from etlalchemy_spark.operators.sampling import weighted_systematic_sample

    li = t(spark, sf_dir, "lineitem")
    return weighted_systematic_sample(
        li, ["l_orderkey", "l_linenumber"], F.col("l_quantity"), 200
    ).select("l_orderkey", "l_linenumber", "n_picks")


_SPLIT_SQL = f"""
SELECT CASE WHEN {_bucket_sql("doc_id", "sp:")} < 800000 THEN 'train'
            WHEN {_bucket_sql("doc_id", "sp:")} < 900000 THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT lang) AS n_langs
FROM documents GROUP BY 1
"""


@register("sample_train_test_split", oracle=_SPLIT_SQL, tags=("sampling",))
def sample_train_test_split(spark, sf_dir):
    """80/10/10 train/val/test corpus split, content-addressed on
    doc_id: membership is a pure function of the row, so the split is
    identical on any engine, any partitioning, any retry — and never
    leaks rows between splits when the corpus is re-processed
    incrementally. One narrow CASE + one aggregate."""
    from etlalchemy_spark.operators.sampling import hash_bucket

    d = t(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"), salt="sp:")
    split = (
        F.when(b < 800000, "train").when(b < 900000, "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "lang")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("lang").alias("n_langs"),
        )
    )


_RESERVOIR_SQL = """
SELECT l_orderkey, l_linenumber,
       md5(CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)) AS h
FROM lineitem
ORDER BY h
LIMIT 500
"""


@register("sample_reservoir_hash_topk", oracle=_RESERVOIR_SQL, tags=("sampling",))
def sample_reservoir_hash_topk(spark, sf_dir):
    """Fixed-size uniform sample without replacement (the distributed
    reservoir): rank rows by a content hash of the primary key and keep
    the k smallest. Unlike a classic sequential reservoir this is
    order-independent, mergeable (each partition keeps its local top-k,
    TakeOrderedAndProject combines them on the driver — no global
    sort), and identical across engines, partitionings, and reruns.
    k=500 per-partition heaps of 500 rows, nothing else shuffles."""
    li = t(spark, sf_dir, "lineitem")
    h = F.md5(
        F.concat_ws(
            ":",
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
        )
    )
    return (
        li.select("l_orderkey", "l_linenumber", h.alias("h"))
        .orderBy("h")
        .limit(500)
    )


_NEG_SQL = f"""
WITH pos AS (
  SELECT DISTINCT user_id, CAST(json_extract(props, '$.k') AS BIGINT) AS pos_item
  FROM events WHERE event_type = 'purchase'
),
bounds AS (SELECT MAX(p_partkey) AS max_item FROM part),
slots AS (SELECT UNNEST(generate_series(0, 3)) AS slot)
SELECT p.user_id, p.pos_item, s.slot,
       {_bucket_sql("p.user_id * 1000000 + p.pos_item * 10 + s.slot", "ng:")} % (b.max_item + 1) AS neg_item,
       ({_bucket_sql("p.user_id * 1000000 + p.pos_item * 10 + s.slot", "ng:")} % (b.max_item + 1)) = p.pos_item AS collides
FROM pos p, bounds b, slots s
"""


@register("sample_negative_sampling", oracle=_NEG_SQL, tags=("sampling",))
def sample_negative_sampling(spark, sf_dir):
    """Deterministic negative sampling for recommender/contrastive
    training: for every (user, positive item) pair, draw 4 negatives as
    a pure hash of (user, item, slot) mod the item universe —
    reproducible across engines, partitionings, and epochs (change the
    salt to reroll), no RNG state to coordinate across 1000 executors.
    Collisions with the positive are FLAGGED, not resampled, keeping
    the op stateless; the universe bound is one broadcast scalar."""
    from etlalchemy_spark.operators.sampling import hash_bucket

    ev = t(spark, sf_dir, "events")
    part = t(spark, sf_dir, "part")
    pos = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.get_json_object("props", "$.k").cast("bigint").alias("pos_item"),
        )
        .distinct()
    )
    bounds = part.agg(F.max("p_partkey").alias("max_item"))
    slots = spark.range(4).select(F.col("id").alias("slot"))
    key = (
        F.col("user_id") * 1000000 + F.col("pos_item") * 10 + F.col("slot")
    )
    drawn = (
        pos.crossJoin(F.broadcast(slots))
        .crossJoin(F.broadcast(bounds))
        .withColumn("neg_item", hash_bucket(key, salt="ng:") % (F.col("max_item") + 1))
    )
    return drawn.select(
        "user_id",
        "pos_item",
        "slot",
        "neg_item",
        (F.col("neg_item") == F.col("pos_item")).alias("collides"),
    )


_TEMP_MIX_SQL = f"""
WITH counts AS (
  SELECT lang AS s, COUNT(*) AS n FROM documents GROUP BY lang
),
pw AS (
  SELECT s, CAST(1 AS DOUBLE) / SQRT(CAST(n AS DOUBLE)) AS p FROM counts
),
thresh AS (
  SELECT s, CAST(ROUND(p / (SELECT MAX(p) FROM pw) * 1000000, 0) AS BIGINT) AS th FROM pw
)
SELECT d.doc_id, d.source, d.lang
FROM documents d JOIN thresh t ON d.lang = t.s
WHERE {_bucket_sql("d.doc_id", "tm:")} < t.th
"""


@register("sample_temperature_mixture", oracle=_TEMP_MIX_SQL, tags=("sampling",))
def sample_temperature_mixture(spark, sf_dir):
    """Temperature-rebalanced language mixture (alpha = 0.5): the
    standard multinomial rebalancing that flattens a skewed
    multilingual corpus toward p_l proportional to n_l^alpha — the
    rarest language keeps every row, dominant ones downsample by
    sqrt(n_min/n_l)-shaped acceptance rates (en at ~2.7x de volume
    keeps ~61% here), all realized with the portable content-hash draw
    (operators/sampling.py temperature_mixture_sample). Corpus never
    shuffles: per-language counts are a languages-sized aggregate
    broadcast back as a threshold; the draw is a narrow filter."""
    from etlalchemy_spark.operators.sampling import temperature_mixture_sample

    d = t(spark, sf_dir, "documents")
    return temperature_mixture_sample(
        d, F.col("doc_id"), F.col("lang"), alpha=0.5, salt="tm:"
    ).select("doc_id", "source", "lang")


_GROUP_SPLIT_SQL = f"""
WITH assigned AS (
  SELECT doc_id, source,
         CASE WHEN {_bucket_sql("source", "gsplit:")} < 800000 THEN 'train'
              WHEN {_bucket_sql("source", "gsplit:")} < 900000 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT doc_id, source, split,
       COUNT(DISTINCT split) OVER (PARTITION BY source) AS group_split_count
FROM assigned
"""


@register("sample_split_group_disjoint", oracle=_GROUP_SPLIT_SQL, tags=("sampling", "window"))
def sample_split_group_disjoint(spark, sf_dir):
    """Leakage-safe train/val/test split: the split is a hash of the
    GROUP key (source), not the document, so near-duplicate documents
    that share a provenance group can never straddle the
    train/evaluation boundary — the standard guard against benchmark
    leakage that per-row splits (sample_train_test_split) do not give.
    Stateless per-row arithmetic (no shuffle to assign); the
    group_split_count audit column (distinct splits seen per group —
    structurally 1) rides along so a pipeline can assert disjointness
    from the output itself. 80/10/10 by group; at 100 TB the only
    requirement is enough groups to make the ratio concentrate."""
    from etlalchemy_spark.operators.sampling import hash_bucket

    d = t(spark, sf_dir, "documents")
    b = hash_bucket(F.col("source"), "gsplit:")
    assigned = d.select(
        "doc_id",
        "source",
        F.when(b < 800000, "train").when(b < 900000, "val").otherwise("test").alias("split"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("source")
    return assigned.withColumn(
        "group_split_count", F.size(F.collect_set("split").over(w)).cast("bigint")
    )


# Poisson(1) CDF thresholds scaled to the integer bucket space [0, 1e6):
# bucket < 367879 -> weight 0, < 735759 -> 1, ... else 8. Shared literal
# integers on both engines — the whole bootstrap is float-free until the
# final mean division.
_POIS_THRESH = [367879, 735759, 919699, 981012, 996340, 999406, 999917, 999990]
_BOOT_REPS = 8


def _pois_weight_sql(bucket_expr: str) -> str:
    whens = " ".join(
        f"WHEN {bucket_expr} < {t} THEN {k}" for k, t in enumerate(_POIS_THRESH)
    )
    return f"(CASE {whens} ELSE {len(_POIS_THRESH)} END)"


_BOOT_KEY = "l_orderkey || '-' || l_linenumber"

_BOOT_COLS_SQL = ",\n".join(
    f"""  SUM(CAST({_pois_weight_sql(_bucket_sql(_BOOT_KEY, f'boot{r}:'))} AS BIGINT)) AS n_{r},
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
      * {_pois_weight_sql(_bucket_sql(_BOOT_KEY, f'boot{r}:'))}), 4) AS DOUBLE)
    / CAST(SUM(CAST({_pois_weight_sql(_bucket_sql(_BOOT_KEY, f'boot{r}:'))} AS BIGINT)) AS DOUBLE) AS m_{r}"""
    for r in range(_BOOT_REPS)
)

_BOOT_UNION_SQL = "\nUNION ALL\n".join(
    f"SELECT {r} AS rep, n_{r} AS n_resampled, m_{r} AS boot_mean FROM agg"
    for r in range(_BOOT_REPS)
)

_BOOT_SQL = f"""
WITH agg AS (
  SELECT
{_BOOT_COLS_SQL}
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
)
{_BOOT_UNION_SQL}
"""


@register("sample_poisson_bootstrap", oracle=_BOOT_SQL, tags=("sampling",))
def sample_poisson_bootstrap(spark, sf_dir):
    """Resampling-free bootstrap: 8 Poisson(1) replicate estimates of
    mean(l_extendedprice) in ONE scan. Per (row, replicate) the
    resample multiplicity is drawn deterministically — portable
    content hash of (salt_r, row key) into the integer bucket space,
    inverse-CDF'd through shared literal integer thresholds — so no
    data is ever copied, shuffled, or RNG-dependent: each replicate is
    a pair of conditional aggregates (weighted decimal sum + weight
    count) and the 8 replicate means leave the scan as one row,
    unpivoted to 8. This is how variance/CI estimation works at
    100 TB: the naive bootstrap (materialize R resampled copies) is
    R× the data; this is R extra aggregate columns. Replicates
    decorrelate by salt. Float ops: exactly one division per
    replicate, on identical operands — hash-exact in any engine."""
    from etlalchemy_spark.operators.sampling import hash_bucket

    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
    )
    key = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit("-"),
        F.col("l_linenumber").cast("string"),
    )
    v = F.col("l_extendedprice").cast("decimal(18,4)")

    def pois_w(r: int) -> F.Column:
        b = hash_bucket(key, salt=f"boot{r}:")
        expr = F.when(b < _POIS_THRESH[0], 0)
        for k, th in enumerate(_POIS_THRESH[1:], start=1):
            expr = expr.when(b < th, k)
        return expr.otherwise(len(_POIS_THRESH))

    aggs = []
    for r in range(_BOOT_REPS):
        w = pois_w(r)
        aggs.append(F.sum(w.cast("bigint")).alias(f"n_{r}"))
        aggs.append(
            (
                F.sum(v * w).cast("decimal(38,4)").cast("double")
                / F.sum(w.cast("bigint")).cast("double")
            ).alias(f"m_{r}")
        )
    one = li.agg(*aggs)
    reps = F.array(
        *[
            F.struct(
                F.lit(r).alias("rep"),
                F.col(f"n_{r}").alias("n_resampled"),
                F.col(f"m_{r}").alias("boot_mean"),
            )
            for r in range(_BOOT_REPS)
        ]
    )
    return one.select(F.explode(reps).alias("_e")).select(
        "_e.rep", "_e.n_resampled", "_e.boot_mean"
    )


_ALLOC_BUDGET = 1000

_ALLOC_SQL = f"""
WITH s AS (
  SELECT o_orderpriority, COUNT(*) AS n_h FROM orders GROUP BY 1
), tot AS (SELECT SUM(n_h) AS n FROM s),
q AS (
  SELECT s.o_orderpriority, s.n_h,
         ({_ALLOC_BUDGET} * s.n_h) // tot.n AS base,
         ({_ALLOC_BUDGET} * s.n_h) % tot.n AS rem
  FROM s, tot
), rs AS (
  SELECT o_orderpriority, base, rem,
         ROW_NUMBER() OVER (ORDER BY rem DESC, o_orderpriority) AS rr,
         SUM(base) OVER () AS sum_base
  FROM q
), quota AS (
  SELECT o_orderpriority,
         base + CASE WHEN rr <= {_ALLOC_BUDGET} - sum_base THEN 1 ELSE 0 END AS quota
  FROM rs
), r AS (
  SELECT o_orderkey, o_orderpriority,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY {_bucket_sql("o_orderkey", "alloc:")}, o_orderkey) AS rn
  FROM orders
)
SELECT r.o_orderkey, r.o_orderpriority
FROM r JOIN quota USING (o_orderpriority)
WHERE r.rn <= quota.quota
"""


@register("sample_fixed_total_allocation", oracle=_ALLOC_SQL, tags=("sampling",))
def sample_fixed_total_allocation(spark, sf_dir):
    """EXACTLY-N stratified sample via largest-remainder (Hamilton)
    allocation: a fixed budget of {n} rows is split across strata
    proportionally in pure integer arithmetic — base = floor(B*n_h/N),
    the leftover seats go to the largest remainders (deterministic
    stratum tie-break) — then each stratum takes its quota of rows by
    portable-hash order. Rate-based samplers (Bernoulli/stratified)
    only hit a budget in expectation; pipelines with a hard row/token
    budget (eval slices, human-review batches) need the exact-N
    contract. Scale shape: the allocation runs on AGGREGATE state (one
    count row per stratum, collected within the repo's bounded-collect
    budget and baked back as plan literals — no quota join, no
    driver-data loop); the per-stratum rank window partitions by
    stratum and the final filter is narrow. The sample is
    row-identical in any engine, and |result| == B exactly.""".replace(
        "{n}", str(_ALLOC_BUDGET)
    )
    from pyspark.sql import Window as W

    from etlalchemy_spark.operators.sampling import hash_bucket

    o = t(spark, sf_dir, "orders")
    stats = sorted(
        (r["o_orderpriority"], r["n"])
        for r in o.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    n_total = sum(n for _, n in stats)
    base = {p: (_ALLOC_BUDGET * n) // n_total for p, n in stats}
    rem = {p: (_ALLOC_BUDGET * n) % n_total for p, n in stats}
    leftover = _ALLOC_BUDGET - sum(base.values())
    for p, _ in sorted(stats, key=lambda x: (-rem[x[0]], x[0]))[:leftover]:
        base[p] += 1
    quota = F.create_map(
        *[F.lit(x) for p, q in sorted(base.items()) for x in (p, q)]
    )
    w = W.partitionBy("o_orderpriority").orderBy(
        hash_bucket(F.col("o_orderkey"), "alloc:"), "o_orderkey"
    )
    return (
        o.select("o_orderkey", "o_orderpriority")
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= F.element_at(quota, F.col("o_orderpriority")))
        .drop("_rn")
    )


_AB_SQL = f"""
WITH a AS (
  SELECT c_custkey,
         CASE WHEN {_bucket_sql("c_custkey", "ab:")} < 500000
              THEN 'control' ELSE 'treatment' END AS arm
  FROM customer
), per AS (
  SELECT arm, COUNT(*) AS n_customers FROM a GROUP BY arm
), om AS (
  SELECT a.arm,
         COUNT(*) AS n_orders,
         SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS s
  FROM orders JOIN a ON o_custkey = a.c_custkey
  GROUP BY a.arm
), srm AS (
  SELECT SUM(CASE WHEN arm = 'control' THEN n_customers ELSE 0 END) AS nc,
         SUM(CASE WHEN arm = 'treatment' THEN n_customers ELSE 0 END) AS nt
  FROM per
)
SELECT per.arm,
       CAST(per.n_customers AS BIGINT) AS n_customers,
       CAST(om.n_orders AS BIGINT) AS n_orders,
       CAST(om.s AS DOUBLE) / CAST(om.n_orders AS DOUBLE) AS mean_order_total,
       CAST((srm.nc - srm.nt) * (srm.nc - srm.nt) AS DOUBLE)
         / CAST(srm.nc + srm.nt AS DOUBLE) AS srm_chi2,
       (100 * (srm.nc - srm.nt) * (srm.nc - srm.nt) > 384 * (srm.nc + srm.nt))
         AS srm_violated
FROM per JOIN om ON per.arm = om.arm, srm
"""


@register("sample_ab_assignment", oracle=_AB_SQL, tags=("sampling", "events"))
def sample_ab_assignment(spark, sf_dir):
    """Deterministic A/B experiment assignment + sample-ratio-mismatch
    (SRM) guard: customers hash into control/treatment by the portable
    60-bit md5 bucket (stateless — any engine, any day, same arms; no
    assignment table to sync), the per-arm readout is order count and
    mean order value, and the SRM chi-square (1 dof, equal split:
    (nc-nt)^2/(nc+nt)) is the first thing a trustworthy experiment
    dashboard checks — a violated split means the assignment or
    logging is broken and the metric readout is garbage. The 3.84
    critical value is tested by exact integer cross-multiplication.
    Shape: one narrow assignment projection, one broadcast-ready
    customer->arm join, two hash aggregates, a 2-row broadcast for the
    SRM columns."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    from etlalchemy_spark.operators.sampling import hash_bucket

    a = cust.select(
        "c_custkey",
        F.when(hash_bucket(F.col("c_custkey"), "ab:") < 500000, "control")
        .otherwise("treatment")
        .alias("arm"),
    )
    per = a.groupBy("arm").agg(F.count(F.lit(1)).alias("n_customers"))
    om = (
        orders.join(a, orders.o_custkey == a.c_custkey)
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(15,2)")).alias("s"),
        )
    )
    srm = per.agg(
        F.sum(F.when(F.col("arm") == "control", F.col("n_customers")).otherwise(0)).alias("nc"),
        F.sum(F.when(F.col("arm") == "treatment", F.col("n_customers")).otherwise(0)).alias("nt"),
    )
    d = F.col("nc") - F.col("nt")
    return (
        per.join(om, "arm")
        .crossJoin(F.broadcast(srm))
        .select(
            "arm",
            F.col("n_customers").cast("bigint").alias("n_customers"),
            F.col("n_orders").cast("bigint").alias("n_orders"),
            (F.col("s").cast("double") / F.col("n_orders").cast("double")).alias(
                "mean_order_total"
            ),
            ((d * d).cast("double") / (F.col("nc") + F.col("nt")).cast("double")).alias(
                "srm_chi2"
            ),
            (100 * d * d > 384 * (F.col("nc") + F.col("nt"))).alias("srm_violated"),
        )
    )


# --- k-fold cross-validation assignment (r9) ---------------------------------

_KFOLD_K = 5

_KFOLD_SQL = f"""
WITH folds AS (
  SELECT doc_id, lang, {_bucket_sql("doc_id", "cv:")} % {_KFOLD_K} AS fold
  FROM documents
)
SELECT fold,
       CAST(COUNT(*) AS BIGINT) AS n_val,
       CAST((SELECT COUNT(*) FROM documents) - COUNT(*) AS BIGINT) AS n_train,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM folds GROUP BY fold
"""


@register("sample_kfold_assignment", oracle=_KFOLD_SQL, tags=("sampling",))
def sample_kfold_assignment(spark, sf_dir):
    """Deterministic k-fold cross-validation assignment (k=5):
    fold = salted 60-bit md5 prefix of the key, mod k — stateless,
    engine/retry-reproducible, no RNG, no shuffle for the assignment
    itself (the same contract as `sample_bernoulli_hash`; a given doc
    lands in the same fold on any engine, any cluster, any rerun —
    what makes CV results auditable). Output is the per-fold summary
    (validation size, complementary train size, language coverage,
    smallest id) a training harness checks before launching k runs."""
    from etlalchemy_spark.operators.sampling import hash_bucket

    docs = t(spark, sf_dir, "documents")
    n_total = docs.count()  # one scalar aggregate
    folds = docs.select(
        "doc_id", "lang", (hash_bucket(F.col("doc_id"), salt="cv:") % _KFOLD_K).alias("fold")
    )
    return folds.groupBy("fold").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_val"),
        (F.lit(n_total) - F.count(F.lit(1))).cast("bigint").alias("n_train"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.min("doc_id").cast("bigint").alias("first_doc"),
    )


# --- Neyman-optimal stratified allocation (r9) ---------------------------------

_NEY_BUDGET = 1000

_NEY_SQL = f"""
WITH s AS (
  SELECT o_orderpriority,
         COUNT(*) AS n_h,
         SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS sx,
         SUM(CAST(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS HUGEINT)
             * CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS sxx
  FROM orders GROUP BY 1
),
w AS (
  SELECT o_orderpriority, n_h,
         CASE WHEN n_h > 1 THEN
           CAST(FLOOR(SQRT(
             CAST(CAST(n_h * (n_h * sxx - CAST(sx AS HUGEINT) * sx) AS VARCHAR) AS DOUBLE)
             / CAST(n_h - 1 AS DOUBLE)
           )) AS BIGINT)
         ELSE 0 END AS wq
  FROM s
),
tot AS (SELECT SUM(wq) AS tw FROM w),
q AS (
  SELECT w.o_orderpriority, w.wq,
         ({_NEY_BUDGET} * w.wq) // tot.tw AS base,
         ({_NEY_BUDGET} * w.wq) % tot.tw AS rem
  FROM w, tot
),
rs AS (
  SELECT o_orderpriority, base, rem,
         ROW_NUMBER() OVER (ORDER BY rem DESC, o_orderpriority) AS rr,
         SUM(base) OVER () AS sum_base
  FROM q
),
quota AS (
  SELECT o_orderpriority,
         base + CASE WHEN rr <= {_NEY_BUDGET} - sum_base THEN 1 ELSE 0 END AS quota
  FROM rs
),
r AS (
  SELECT o_orderkey, o_orderpriority,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY {{bucket}}, o_orderkey) AS rn
  FROM orders
)
SELECT r.o_orderkey, r.o_orderpriority
FROM r JOIN quota USING (o_orderpriority)
WHERE r.rn <= quota.quota
"""


@register(
    "sample_neyman_allocation",
    oracle=_NEY_SQL.replace("{bucket}", _bucket_sql("o_orderkey", "ney:")),
    tags=("sampling",),
)
def sample_neyman_allocation(spark, sf_dir):
    """Neyman-OPTIMAL stratified allocation: the fixed budget splits
    across strata proportionally to n_h·S_h (stratum size × stratum
    std of the survey metric, here order total in exact cents) — the
    allocation that minimizes the stratified mean's variance, vs
    sample_fixed_total_allocation's size-proportional split. Cross-
    engine exactness at every hazard: moment sums are exact integers
    (HUGEINT ≡ decimal(38,0)); n²S² = n(n·Σx²−(Σx)²)/(n−1) closes as
    ONE division + IEEE-correctly-rounded sqrt on a VARCHAR-routed
    double; weights then FLOOR to integers (cent-granular — n·S here
    is ~1e10, so the truncation is 1e-10 relative) BEFORE the Hamilton
    largest-remainder step, so every floor/remainder comparison is
    integer arithmetic (a 5-row double SUM would be order-sensitive —
    the quantization removes the hazard). Zero-
    variance or singleton strata weigh 0 and draw nothing, exactly as
    Neyman prescribes. Scale shape: allocation on aggregate state
    baked back as plan literals (bounded collect, ≤ strata rows), one
    per-stratum rank window, narrow filter; |result| == budget."""
    import math

    from pyspark.sql import Window as W

    from etlalchemy_spark.operators.sampling import hash_bucket

    o = t(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
    cd = cents.cast("decimal(19,0)")
    stats = {
        r["o_orderpriority"]: (r["n_h"], int(r["sx"]), int(r["sxx"]))
        for r in o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_h"),
            F.sum(cents).alias("sx"),
            F.sum(cd * cd).alias("sxx"),
        )
        .collect()  # bounded: one row per stratum
    }
    wq = {}
    for p, (n_h, sx, sxx) in stats.items():
        if n_h > 1:
            num = n_h * (n_h * sxx - sx * sx)
            # float(num)/float(den): the same two correctly-rounded
            # conversions + one division the oracle performs
            wq[p] = int(math.floor(math.sqrt(float(num) / float(n_h - 1))))
        else:
            wq[p] = 0
    tw = sum(wq.values())
    base = {p: (_NEY_BUDGET * w) // tw for p, w in wq.items()}
    rem = {p: (_NEY_BUDGET * w) % tw for p, w in wq.items()}
    leftover = _NEY_BUDGET - sum(base.values())
    for p in sorted(base, key=lambda p: (-rem[p], p))[:leftover]:
        base[p] += 1
    quota = F.create_map(*[F.lit(x) for p in sorted(base) for x in (p, base[p])])
    w = W.partitionBy("o_orderpriority").orderBy(
        hash_bucket(F.col("o_orderkey"), "ney:"), "o_orderkey"
    )
    return (
        o.select("o_orderkey", "o_orderpriority")
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= F.element_at(quota, F.col("o_orderpriority")))
        .drop("_rn")
    )


# --- Inverse-propensity weighted estimate (r9) -------------------------------------

_IPW_SQL = f"""
WITH rated AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 4 ELSE 20 END AS inv_rate
  FROM orders
),
samp AS (
  SELECT * FROM rated
  WHERE {_bucket_sql("o_orderkey", "ipw:")} * inv_rate < 1000000
),
est AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_sampled,
         CAST(SUM(CAST(cents AS HUGEINT) * inv_rate) AS BIGINT) AS wsum,
         CAST(SUM(inv_rate) AS BIGINT) AS wn
  FROM samp
),
truth AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_all,
         CAST(SUM(CAST(cents AS HUGEINT)) AS BIGINT) AS s_all
  FROM rated
)
SELECT n_sampled, n_all,
       (CAST(wsum AS DOUBLE) / CAST(wn AS DOUBLE)) / 100.0 AS ipw_mean,
       (CAST(s_all AS DOUBLE) / CAST(n_all AS DOUBLE)) / 100.0 AS true_mean,
       (CAST(wsum AS DOUBLE) / CAST(wn AS DOUBLE))
         / (CAST(s_all AS DOUBLE) / CAST(n_all AS DOUBLE)) - 1.0 AS rel_bias
FROM est, truth
"""


@register("sample_ipw_estimate", oracle=_IPW_SQL, tags=("sampling", "stats"))
def sample_ipw_estimate(spark, sf_dir):
    """Inverse-propensity-weighted estimation — the correction that
    makes a DELIBERATELY biased sample (urgent orders kept at 25%,
    the rest at 5% — the shape every cost-tiered telemetry pipeline
    produces) estimate the population mean without bias: each sampled
    row weighs 1/p(sampled), here the exact integer inv_rate, so the
    Horvitz-Thompson ratio wsum/wn is exact-integer until one double
    division. The riding true mean and relative-bias column are the
    audit: IPW lands within sampling noise of truth while the naive
    sample mean would skew toward urgent orders. Membership is the
    portable content hash (deterministic, retry-stable); one narrow
    filter + two aggregates."""
    from etlalchemy_spark.operators.sampling import hash_bucket

    o = t(spark, sf_dir, "orders")
    inv_rate = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.lit(4)
    ).otherwise(F.lit(20))
    cents = (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
    rated = o.select(
        "o_orderkey", cents.alias("cents"), inv_rate.alias("inv_rate")
    )
    samp = rated.where(
        hash_bucket(F.col("o_orderkey"), "ipw:") * F.col("inv_rate") < 1000000
    )
    est = samp.agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum(F.col("cents").cast("decimal(19,0)") * F.col("inv_rate"))
        .cast("bigint")
        .alias("wsum"),
        F.sum("inv_rate").cast("bigint").alias("wn"),
    )
    truth = rated.agg(
        F.count(F.lit(1)).alias("n_all"),
        F.sum(F.col("cents").cast("decimal(19,0)")).cast("bigint").alias("s_all"),
    )
    ipw = F.col("wsum").cast("double") / F.col("wn").cast("double")
    tm = F.col("s_all").cast("double") / F.col("n_all").cast("double")
    return est.crossJoin(F.broadcast(truth)).select(
        F.col("n_sampled").cast("bigint").alias("n_sampled"),
        F.col("n_all").cast("bigint").alias("n_all"),
        (ipw / 100.0).alias("ipw_mean"),
        (tm / 100.0).alias("true_mean"),
        (ipw / tm - 1.0).alias("rel_bias"),
    )


# --- Kish design effect (r9) ---------------------------------------------------

_DEFF_SQL = f"""
WITH rated AS (
  SELECT o_orderkey,
         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 4 ELSE 20 END AS w
  FROM orders
),
samp AS (
  SELECT * FROM rated
  WHERE {_bucket_sql("o_orderkey", "ipw:")} * w < 1000000
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sampled,
       CAST(SUM(w) AS BIGINT) AS sum_w,
       CAST(SUM(w * w) AS BIGINT) AS sum_w2,
       (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(w * w) AS DOUBLE))
         / (CAST(SUM(w) AS DOUBLE) * CAST(SUM(w) AS DOUBLE)) AS design_effect,
       (CAST(SUM(w) AS DOUBLE) * CAST(SUM(w) AS DOUBLE))
         / CAST(SUM(w * w) AS DOUBLE) AS n_effective
FROM samp
"""


@register("sample_design_effect", oracle=_DEFF_SQL, tags=("sampling", "stats"))
def sample_design_effect(spark, sf_dir):
    """Kish design effect of the tiered IPW sample — the audit that
    says what unequal weights COST: deff = n·Σw²/(Σw)² ≥ 1 inflates
    every variance by that factor, and n_eff = (Σw)²/Σw² is the
    equal-weight sample the weighted one is actually worth (budget
    planning reads THIS, not the raw row count). Same deterministic
    tiered membership as sample_ipw_estimate; exact integer weight
    sums close in two double divisions. One filter + one aggregate."""
    from etlalchemy_spark.operators.sampling import hash_bucket

    o = t(spark, sf_dir, "orders")
    w = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.lit(4)
    ).otherwise(F.lit(20))
    samp = o.select("o_orderkey", w.alias("w")).where(
        hash_bucket(F.col("o_orderkey"), "ipw:") * F.col("w") < 1000000
    )
    n = F.count(F.lit(1))
    sw = F.sum("w")
    sw2 = F.sum(F.col("w") * F.col("w"))
    return samp.agg(
        n.cast("bigint").alias("n_sampled"),
        sw.cast("bigint").alias("sum_w"),
        sw2.cast("bigint").alias("sum_w2"),
        (
            (n.cast("double") * sw2.cast("double"))
            / (sw.cast("double") * sw.cast("double"))
        ).alias("design_effect"),
        (
            (sw.cast("double") * sw.cast("double")) / sw2.cast("double")
        ).alias("n_effective"),
    )


from etlalchemy_spark.queries._util import ln_int_sql  # noqa: E402

# Gumbel/exponential key for weighted sampling WITHOUT replacement
# (Efraimidis–Spirakis A-ES): rank by ln(u)/w with u uniform — here
# u = (hash_bucket + 1)/1e6, deterministic and content-addressed, and
# ln comes from the cross-engine-exact integer construction, so the
# ranking doubles are bit-identical in both engines.
_GUMBEL_LN_U = f"({ln_int_sql('(hb + 1)')} - {ln_int_sql('1000000')})"

_GUMBEL_SQL = f"""
WITH h AS (
  SELECT o_orderkey, o_custkey, o_totalprice,
         {_bucket_sql("o_orderkey", "gw:")} AS hb
  FROM orders
  WHERE o_totalprice > 0
),
keyed AS (
  SELECT o_orderkey, o_custkey, o_totalprice,
         CAST({_GUMBEL_LN_U} / CAST(o_totalprice AS DOUBLE) AS DOUBLE) AS gkey
  FROM h
)
SELECT o_orderkey, o_custkey, o_totalprice
FROM keyed
ORDER BY gkey DESC, o_orderkey
LIMIT 500
"""


@register("sample_gumbel_weighted_topk", oracle=_GUMBEL_SQL, tags=("sampling", "topk"))
def sample_gumbel_weighted_topk(spark, sf_dir):
    """Weighted sampling WITHOUT replacement (r10) — the
    Efraimidis–Spirakis one-pass algorithm every data-mixing pipeline
    wants when 'sample 500 docs proportional to quality score' must be
    reproducible: each row draws key = ln(u)/w with u a deterministic
    content-addressed uniform (portable md5 bucket) and w its weight;
    the top-k keys ARE a weight-proportional sample without
    replacement, one narrow map + one TakeOrderedAndProject — no
    second pass, no rejection loop, rerun-stable. ln comes from the
    cross-engine-exact integer construction (ln_int_sql), so even the
    ranking doubles hash-match; `sample_weighted_systematic` is the
    with-replacement/grid counterpart."""
    from etlalchemy_spark.operators.sampling import hash_bucket

    o = t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    h = o.select(
        "o_orderkey", "o_custkey", "o_totalprice",
        hash_bucket(F.col("o_orderkey"), "gw:").alias("hb"),
    )
    keyed = h.select(
        "o_orderkey", "o_custkey", "o_totalprice",
        F.expr(
            f"CAST({_GUMBEL_LN_U} / CAST(o_totalprice AS DOUBLE) AS DOUBLE)"
        ).alias("gkey"),
    )
    return (
        keyed.orderBy(F.desc("gkey"), "o_orderkey")
        .limit(500)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# --- Two-stage cluster sampling (r10) --------------------------------------------------

_CL1_RATE = 100000  # 10% of customers (clusters)
_CL2_RATE = 500000  # 50% of each sampled cluster's orders

_CLUSTER_SQL = f"""
WITH s AS (
  SELECT o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
  FROM orders
  WHERE {_bucket_sql("o_custkey", "cl1:")} < {_CL1_RATE}
    AND {_bucket_sql("o_orderkey", "cl2:")} < {_CL2_RATE}
),
cl AS (
  SELECT COUNT(DISTINCT o_custkey) AS n_clusters FROM orders
  WHERE {_bucket_sql("o_custkey", "cl1:")} < {_CL1_RATE}
),
tru AS (
  SELECT SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS tot
  FROM orders
)
SELECT CAST(cl.n_clusters AS BIGINT) AS n_clusters_sampled,
       CAST((SELECT COUNT(*) FROM s) AS BIGINT) AS n_orders_sampled,
       CAST((SELECT SUM(cents) * 20 FROM s) AS DOUBLE) / 100.0 AS estimated_total,
       CAST(tru.tot AS DOUBLE) / 100.0 AS true_total,
       (CAST((SELECT SUM(cents) * 20 FROM s) AS DOUBLE) - CAST(tru.tot AS DOUBLE))
         / CAST(tru.tot AS DOUBLE) AS rel_error
FROM cl, tru
"""


@register("sample_cluster_twostage", oracle=_CLUSTER_SQL, tags=("sampling", "stats"))
def sample_cluster_twostage(spark, sf_dir):
    """Two-stage cluster sampling (r10) — THE survey design when
    enumerating units is expensive but enumerating GROUPS is cheap
    (sample customers, then subsample their orders; crawl hosts, then
    subsample their pages): stage 1 draws 10% of customers by
    portable hash, stage 2 draws 50% of each sampled customer's
    orders by an independent salt, and the Horvitz-Thompson estimate
    inverts the known inclusion probability 1/(0.1 * 0.5) = 20
    exactly. Both stages are pure narrow filters (content-addressed —
    rerun/engine/retry-stable, the sample_bernoulli_hash discipline);
    the estimate is exact integer cents times an integer weight,
    audited against the true total. Scan-speed at any scale."""
    from etlalchemy_spark.operators.sampling import hash_bucket

    o = t(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("bigint")
    stage1 = o.where(hash_bucket(F.col("o_custkey"), "cl1:") < _CL1_RATE)
    s = stage1.where(hash_bucket(F.col("o_orderkey"), "cl2:") < _CL2_RATE).select(
        cents.alias("cents")
    )
    cl = stage1.agg(F.countDistinct("o_custkey").alias("n_clusters"))
    samp = s.agg(
        F.count(F.lit(1)).alias("n_orders"), F.sum("cents").alias("cents_sum")
    )
    tru = o.agg(F.sum(cents).alias("tot"))
    w = cl.crossJoin(F.broadcast(samp)).crossJoin(F.broadcast(tru))
    est = (F.col("cents_sum") * 20).cast("double")
    return w.select(
        F.col("n_clusters").cast("bigint").alias("n_clusters_sampled"),
        F.col("n_orders").cast("bigint").alias("n_orders_sampled"),
        (est / 100.0).alias("estimated_total"),
        (F.col("tot").cast("double") / 100.0).alias("true_total"),
        ((est - F.col("tot").cast("double")) / F.col("tot").cast("double")).alias(
            "rel_error"
        ),
    )
