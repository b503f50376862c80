"""Connected components over an edge list — the cluster step of a
near-dup pipeline (pairs → groups → one canonical doc per group).

Iterative min-label propagation on DataFrames: every node adopts the
smallest label among itself and its neighbors until fixpoint. O(graph
diameter) rounds; dup clusters are near-cliques, so 1–2 rounds in
practice. Per round: one join + one groupBy (both shuffle on node id —
co-partitioned, AQE-coalesced), and a localCheckpoint to cut the
iterative lineage (without it the plan doubles every round and the
driver OOMs planning round ~20 at scale).

The fixpoint test (`changed == 0`) is one count over the label join —
aggregate-sized driver traffic only, never the labels themselves.
"""

from __future__ import annotations

import logging
import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)


# Driver fast-path threshold for the score-iteration operators
# (pagerank / personalized-pagerank / HITS): when the AGGREGATED edge
# list fits comfortably on the driver, the power iterations run as a
# local loop over the collected edges instead of 5-10 driver-sequenced
# Spark jobs per iteration. Every current call site feeds a
# bounded-domain graph (event-type transitions: |V| = |event types|,
# |E| <= |V|^2 at ANY input scale), where the iteration frames are a
# few dozen rows but each distributed superstep still pays job-launch,
# AQE planning and broadcast round-trips — measured 43 jobs / ~1.7 s of
# pure driver-orchestration gap for HITS at sf0.1 on 32 cores. The
# arithmetic below reproduces the distributed expressions OPERATION BY
# OPERATION (same multiply order, same floor-quantized int64 sums, same
# int->double casts before the one division), so the scores are
# bit-identical — pinned by tests/test_graph.py::test_driver_path_*
# and the DuckDB oracle on both gate SFs. Graphs past the cap (or an
# unreadable count) take the distributed path unchanged.
_DRIVER_EDGE_CAP = 65536


def _ieee_div(a: float, b: float) -> float:
    """a / b with IEEE-754 zero-divide semantics (Spark's double
    division), which Python's ZeroDivisionError hides."""
    if b != 0.0:
        return a / b
    if a > 0.0:
        return float("inf")
    if a < 0.0:
        return float("-inf")
    return float("nan")


def _collect_if_small(e: DataFrame, cap: int = _DRIVER_EDGE_CAP):
    """The edge frame's rows when it has <= cap of them, else None.
    One limit-collect job; callers checkpoint ``e`` first so the work
    is reused by the distributed path on a miss."""
    rows = e.limit(cap + 1).collect()
    if len(rows) > cap:
        return None
    # a NULL endpoint/weight interacts with joins and sums in
    # engine-specific ways the local loop does not reproduce — punt
    if any(f is None for r in rows for f in r):
        return None
    return rows


def _q_long(p: float) -> int:
    """FLOOR(double) -> BIGINT with Spark's non-ANSI degenerate-value
    semantics (NaN -> 0, +/-inf saturate); finite doubles floor
    exactly. Unreachable for positive weights — defensive parity."""
    if p != p:
        return 0
    if p == float("inf"):
        return 9223372036854775807
    if p == float("-inf"):
        return -9223372036854775808
    return math.floor(p)


def _create_single_slice(spark, rows, schema):
    """One-partition local frame (the r13 single-slice discipline:
    a default createDataFrame splits tiny lists over every core)."""
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)


def _hits_driver(spark, rows, iters: int, node_type) -> DataFrame:
    """hits_exact's iterations over collected edges — every operation
    mirrors the distributed expressions: (v * w) * 1e9 in that multiply
    order, floor -> exact int sums per node, int->double casts before
    the ONE division per node per half-step. Sparse frames exactly as
    the distributed loop keeps them (absent = no contribution), final
    zero-fill identical."""
    from pyspark.sql import types as T

    edges = [(r[0], r[1], float(r[2])) for r in rows]
    nodes: dict = {}
    for s, d, _ in edges:
        nodes.setdefault(s)
        nodes.setdefault(d)

    def half(scores: dict, join_i: int, other_i: int) -> dict:
        c: dict = {}
        for ed in edges:
            v = scores.get(ed[join_i])
            if v is None:
                continue
            k = ed[other_i]
            c[k] = c.get(k, 0) + _q_long(v * ed[2] * 1000000000.0)
        t = float(sum(c.values()))
        return {n: _ieee_div(float(cv), t) for n, cv in c.items()}

    hub = {n: 1.0 for n in nodes}
    auth: dict = {}
    for _ in range(iters):
        auth = half(hub, 0, 1)
        hub = half(auth, 1, 0)
    out = [(n, hub.get(n, 0.0), auth.get(n, 0.0)) for n in nodes]
    schema = T.StructType(
        [
            T.StructField("node", node_type),
            T.StructField("hub", T.DoubleType()),
            T.StructField("authority", T.DoubleType()),
        ]
    )
    return _create_single_slice(spark, out, schema)


def _exact_sum_type(dt) -> bool:
    """Weight types whose SUM is exact (order-insensitive) in both the
    local loop and Spark: integers and decimals. Float weights sum
    order-dependently and stay on the distributed path."""
    s = dt.simpleString()
    return s in ("tinyint", "smallint", "int", "bigint") or s.startswith("decimal")


def _pagerank_driver(
    spark, rows, damping: float, iters: int, node_type, out_col: str,
    seeds: set | None = None,
) -> DataFrame:
    """pagerank_exact / personalized_pagerank_exact iterations over
    collected edges, operation-for-operation: contribution =
    floor(((rank * w) * 1e9) / outw) summed exactly per target, rank =
    teleport + damping * (sum / 1e9) with the same literal
    (1.0 - damping) both paths compute at build time."""
    from pyspark.sql import types as T

    edges = [(r[0], r[1], r[2]) for r in rows]
    outw: dict = {}
    nodes: dict = {}
    for s, d, w in edges:
        outw[s] = outw.get(s, 0) + w  # exact: integral/decimal weights only
        nodes.setdefault(s)
        nodes.setdefault(d)
    ew = [(s, d, float(w), float(outw[s])) for s, d, w in edges]
    if seeds is None:
        nf = float(len(nodes))
        ranks = {n: 1.0 / nf for n in nodes}
        teleport = {n: (1.0 - damping) / nf for n in nodes}
    else:
        ns = float(len(seeds))
        ranks = {n: (1.0 / ns if n in seeds else 0.0) for n in nodes}
        teleport = {
            n: ((1.0 - damping) / ns if n in seeds else 0.0) for n in nodes
        }
    for _ in range(iters):
        sums: dict = {}
        for s, d, w, ow in ew:
            sums[d] = sums.get(d, 0) + _q_long(ranks[s] * w * 1000000000.0 / ow)
        ranks = {
            n: teleport[n] + damping * (float(sums.get(n, 0)) / 1000000000.0)
            for n in nodes
        }
    schema = T.StructType(
        [T.StructField("node", node_type), T.StructField(out_col, T.DoubleType())]
    )
    return _create_single_slice(spark, [(n, r) for n, r in ranks.items()], schema)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    hint_small_labels: bool = False,
) -> DataFrame:
    """Return (node, component) with component = min node id reachable.

    ``edges`` is undirected input (each pair once is fine).

    ``hint_small_labels``: caller-guaranteed |V| bound (e.g. a parquet
    footer row count of the id domain) — broadcasts the label /
    neighbor-min sides of the per-round joins so the |2E| frame and
    the |V| update join stream instead of shuffling (the frames
    descend from checkpoints, so the planner has no stats to decide
    this itself). Join semantics are strategy-independent.
    """
    if max_iter < 1:
        raise ValueError(f"connected_components: max_iter must be >= 1, got {max_iter}")
    # materialize the symmetrized edges ONCE: `und` is consumed by the
    # label init plus every propagation round, and each round is its
    # own job (the localCheckpoints below cut exchange reuse) — without
    # this cut the full upstream edge pipeline (e.g. the quadratic
    # shingle join feeding dedup CC) re-executes 2x per round
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionAll(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .localCheckpoint()
    )
    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    hint = F.broadcast if hint_small_labels else (lambda d: d)
    for _ in range(max_iter):
        lbl_b = hint(labels)
        neighbor_min = (
            und.join(lbl_b, und.a == lbl_b.node)
            .groupBy(F.col("b").alias("node2"))
            .agg(F.min("label").alias("nmin"))
        )
        # the previous label rides along so the convergence check is a
        # filter-count over the frame this round materializes ANYWAY —
        # the old shape re-joined new labels against old labels
        # (|V| x |V|, two exchanges + one extra job) per round just to
        # count changes; same count, zero extra plan work.
        new_full = (
            labels.join(hint(neighbor_min), labels.node == F.col("node2"), "left")
            .select(
                "node",
                F.col("label").alias("_old"),
                F.least(F.col("label"), F.coalesce("nmin", F.col("label"))).alias("label"),
            )
            .localCheckpoint()
        )
        changed = new_full.where(F.col("label") != F.col("_old")).count()
        labels = new_full.select("node", "label")
        if changed == 0:
            break
    else:
        # exhausted max_iter without fixpoint: labels are partially
        # propagated — one true component may still read as several
        logger.warning(
            "connected_components did not converge in %d rounds "
            "(%d labels still changing); raise max_iter (graph diameter "
            "exceeds the round budget)",
            max_iter,
            changed,
        )
    return labels.select("node", F.col("label").alias("component"))


def pagerank_exact(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 5,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    checkpoint_every: int = 8,
) -> DataFrame:
    """(node, pagerank) after ``iters`` weighted power iterations —
    deterministic in ANY engine.

    The accumulation hazard: summing double contributions per target
    node is order-dependent. Each contribution is therefore
    floor-quantized to a 1e-9 integer (one identical multiply/divide
    chain, then FLOOR — correctly rounded everywhere), summed as
    BIGINT (exact, associative), and rescaled once per iteration. The
    tiny systematic downward bias (< 1e-9 * in-degree) is the price of
    bit-reproducibility across engines, partitionings, and retries.

    Dangling nodes contribute nothing (no redistribution) — the
    simplest PR variant, applied identically in the SQL twin. Per
    iteration: one join (ranks × edges, both keyed on src) + one
    aggregate — ranks stay node-count-sized, edges are scanned from
    their cached partitioning each round.
    """
    e = edges.select(
        F.col(src).alias("_s"), F.col(dst).alias("_d"), F.col(weight).alias("_w")
    ).localCheckpoint(eager=False)
    if _exact_sum_type(e.schema["_w"].dataType):
        small = _collect_if_small(e)
        if small is not None:
            return _pagerank_driver(
                edges.sparkSession, small, damping, iters,
                e.schema["_s"].dataType, "pagerank",
            )
    outw = e.groupBy("_s").agg(F.sum("_w").alias("_outw"))
    # materialized once: the checkpoints below split the iterations
    # into separate jobs, and without this cut each job re-derives the
    # edge scan + out-weight aggregate + join for every iteration since
    # the last checkpoint — the docstring's "scanned from their cached
    # partitioning" made literal
    ew = e.join(outw, "_s").localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("_s").alias("node"))
        .unionAll(e.select("_d"))
        .distinct()
    )
    n1 = nodes.agg(F.count(F.lit(1)).alias("_n"))
    base = nodes.crossJoin(F.broadcast(n1))
    ranks = base.select(
        "node", (F.lit(1.0) / F.col("_n").cast("double")).alias("pagerank")
    )
    for i in range(iters):
        if i and i % checkpoint_every == 0:
            # cut the iterative lineage like connected_components above:
            # planning cost grows with every stacked iteration otherwise
            ranks = ranks.localCheckpoint(eager=True)
        contrib = ranks.join(ew, ranks["node"] == ew["_s"]).select(
            F.col("_d").alias("node"),
            F.floor(
                (F.col("pagerank") * F.col("_w").cast("double") * F.lit(1000000000.0))
                / F.col("_outw").cast("double")
            ).alias("_c"),
        )
        sums = contrib.groupBy("node").agg(F.sum("_c").alias("_c"))
        ranks = (
            base.join(sums, "node", "left")
            .select(
                "node",
                (
                    (F.lit(1.0 - damping) / F.col("_n").cast("double"))
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("_c"), F.lit(0).cast("long")).cast("double")
                        / F.lit(1000000000.0)
                    )
                ).alias("pagerank"),
            )
        )
    return ranks


def hits_exact(
    edges: DataFrame,
    iters: int = 4,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """(node, hub, authority) after ``iters`` HITS iterations
    (Kleinberg), deterministic in ANY engine — the `pagerank_exact`
    discipline applied to the two-score mutual recursion: every
    contribution is floor-quantized to a 1e-9 integer before the
    per-node BIGINT sum (exact, associative), and each half-step
    L1-normalizes by the EXACT integer total, so the one float
    division per node has identical operands in both engines.
    Authority update pulls hub mass over in-edges, hub update pulls
    the fresh authority mass back over out-edges. Two plan hazards,
    both measured: (a) the raw mutual recursion references each score
    frame twice per half-step (scores + L1 total) and DOUBLES the
    logical tree — exponential analysis time in BOTH engines (>160 s
    at 4 iterations; DuckDB inlines multi-referenced CTEs the same
    way, hence AS MATERIALIZED in the SQL twin); (b) a whole-frame
    window for the total avoids the double reference but is a
    single-partition WindowExec over |V| rows — the shape the
    tests/test_plans.py tripwire bans, and genuinely wrong for
    billion-node graphs. So: one lazy localCheckpoint per half-step
    cuts the lineage (plan stays linear, no extra jobs), and the L1
    total rides a one-row aggregate broadcast back. Per iteration:
    two node-keyed joins + two aggregates; scores stay
    node-count-sized."""
    e = edges.select(
        F.col(src).alias("_s"), F.col(dst).alias("_d"), F.col(weight).alias("_w")
    ).localCheckpoint(eager=False)
    small = _collect_if_small(e)
    if small is not None:
        return _hits_driver(edges.sparkSession, small, iters, e.schema["_s"].dataType)
    nodes = (
        e.select(F.col("_s").alias("node")).unionAll(e.select("_d")).distinct()
    )
    Q = F.lit(1000000000.0)

    def half_step(scores, join_col, other_col):
        # SPARSE frames through the iterations (r13 optimization
        # round): a node with zero contributions used to be kept as an
        # explicit c=0 row via a nodes-left-join per half-step, but a
        # zero row adds 0 to the L1 total and floor(0*w*Q)=0 to every
        # next-step sum — dropping it changes no value, and the final
        # readout re-fills the zeros ONCE. Removes one join + the
        # nodes-distinct exchange from every half-step (8 of each per
        # run); values bit-identical (oracle re-verified sf0.01+sf0.1)
        # EXCEPT the degenerate all-zero-mass graph (L1 total t = 0,
        # e.g. every weight 0): dense produced NaN (0/0) for every
        # node, sparse coalesces ABSENT nodes to 0.0 in the readout
        # while nodes still present here keep NaN — a mixed NaN/0.0
        # output (ADVICE r13). No fixture and no declared query can
        # produce t = 0 (weights are positive transition counts), so
        # the divergence is documented rather than guarded.
        raw = (
            scores.join(e, scores["node"] == e[join_col])
            .select(
                F.col(other_col).alias("node"),
                F.floor(F.col("v") * F.col("_w").cast("double") * Q)
                .cast("bigint").alias("c"),
            )
            .groupBy("node").agg(F.sum("c").alias("c"))
            .localCheckpoint(eager=False)
        )
        total = raw.agg(F.sum("c").alias("t"))
        return raw.crossJoin(F.broadcast(total)).select(
            "node",
            (F.col("c").cast("double") / F.col("t").cast("double")).alias("v"),
        )

    hub = nodes.select("node", F.lit(1.0).alias("v"))
    auth = None
    for _ in range(iters):
        auth = half_step(hub, "_s", "_d")
        hub = half_step(auth, "_d", "_s")
    # zero-fill once: nodes absent from a sparse frame scored exactly
    # 0.0 (= 0/t) in the dense formulation
    return (
        nodes.join(hub.select("node", F.col("v").alias("hub")), "node", "left")
        .join(auth.select("node", F.col("v").alias("authority")), "node", "left")
        .select(
            "node",
            F.coalesce(F.col("hub"), F.lit(0.0)).alias("hub"),
            F.coalesce(F.col("authority"), F.lit(0.0)).alias("authority"),
        )
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 4,
    hint_small_labels: bool = False,
) -> DataFrame:
    """Synchronous label-propagation community detection: return
    (node, lbl) after ``rounds`` fixed supersteps. Init lbl(v)=v; each
    superstep EVERY node simultaneously adopts the most frequent label
    among its NEIGHBORS (not itself), ties to the smallest label — a
    fully deterministic LPA variant, so results are reproducible across
    engines and retries (the property the DuckDB gate twin relies on).
    Per superstep: one edge-x-label equi-join + one hash aggregate (the
    (count, -label) struct max — no per-node window), then a lazy
    lineage cut. Cost is |E| shuffle rows per superstep at any scale —
    the Pregel shape, like connected_components above. Nodes with no
    neighbors never enter the edge list and are absent from the result,
    matching the edge-derived node set.

    Lineage policy: cut EVERY round. The r13 optimization round tried
    cutting only every 4th round (one AQE query planning several
    supersteps, fewer stage barriers); a quiet-host alternating A/B
    (4 runs each, same session) measured every-round 5.9-6.5 s vs
    every-4th 6.6-7.1 s at sf0.1 — the materialized labels each
    superstep replays from beat the deeper fused plan, so the
    every-round cut stays.

    Node ids must be NUMERIC and < 2^32 (r12 ADVICE): the smallest-label
    tie-break is the ``(count, -lbl)`` struct max, so string ids don't
    negate, and the DuckDB gate twin packs ``c * 2^32 - lbl`` into one
    BIGINT — a label at or beyond 2^32 silently corrupts that packed
    ordering. Validated here so misuse fails loudly in BOTH engines'
    favor; hash string ids (xxhash64 % 2^31) upstream of this operator
    if needed.

    Upstream reference (seanharr11/etlalchemy) has no graph surface;
    this is part of the mandated LLM-curation layer (domain clustering
    of a similarity/co-occurrence graph before sampling)."""
    if rounds < 1:
        raise ValueError(f"label_propagation: rounds must be >= 1, got {rounds}")
    for side in (src, dst):
        dt = dict(edges.dtypes)[side]
        if dt in ("string", "binary") or dt.startswith(("decimal", "array", "struct")):
            raise ValueError(
                f"label_propagation: node column {side!r} is {dt}; numeric "
                "node ids < 2^32 are required (the smallest-label tie-break "
                "negates labels, and the cross-engine oracle packs them into "
                "a BIGINT) — hash ids to integers first"
            )
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionAll(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .localCheckpoint(eager=False)
    )
    # recovered labels are cast back to the input id type so the
    # operator's output schema is packing-independent
    lbl_type = dict(sym.dtypes)["v"]
    labels = None
    for r in range(rounds):
        # most-frequent label, ties to the SMALLEST — exactly Spark's
        # mode(e, deterministic=true) ("the lowest value" on frequency
        # ties). ONE groupBy(u) aggregate per superstep: the previous
        # shape ran TWO hash aggregates (count per (u,lbl), then a
        # packed-long argmax per u) paying two exchanges per round;
        # mode's typed-imperative map accumulator does the per-label
        # counting inside one partial+final aggregation on u (r13
        # optimization round; the packed-BIGINT argmax — c * 2^32 -
        # lbl, mirroring the DuckDB twin — remains the fallback shape
        # if mode ever regresses).
        #
        # Round 0 label set is the IDENTITY (lbl(v) = v), so the first
        # superstep needs neither the nodes-distinct init frame nor the
        # edge-x-label join — each edge row already carries its
        # neighbor's round-0 label in the v column (r13 optimization
        # round: one |2E| exchange + one |V| distinct removed; the
        # aggregate input multiset is identical by construction).
        # hint_small_labels (caller-guaranteed |V| bound, e.g. a parquet
        # footer row count): broadcast the label side so the superstep
        # streams the checkpointed |2E| frame instead of shuffling both
        # sides — the label frame descends from a checkpoint and has no
        # size stats, so the planner cannot make this call itself.
        # Join semantics (inner equi-join) are strategy-independent.
        lbl_side = F.broadcast(labels) if (hint_small_labels and labels is not None) else labels
        joined = (
            sym.select("u", F.col("v").alias("lbl"))
            if labels is None
            else sym.join(lbl_side, sym.v == lbl_side.node).select("u", "lbl")
        )
        labels = joined.groupBy(F.col("u").alias("node")).agg(
            F.mode("lbl", True).cast(lbl_type).alias("lbl")
        )
        if r + 1 < rounds:
            labels = labels.localCheckpoint(eager=False)
    return labels


def personalized_pagerank_exact(
    edges: DataFrame,
    seeds: list[str],
    damping: float = 0.85,
    iters: int = 5,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """(node, ppr) — personalized PageRank: the teleport mass lands
    ONLY on the ``seeds`` instead of uniformly, so scores read as
    'relevance to the seed set' (the recommendation / seed-expansion
    primitive: related-to-conversion event types, documents adjacent
    to a curated set). Same bit-reproducibility discipline as
    pagerank_exact above — per-target contributions floor-quantized
    to 1e-9 integers before the exact BIGINT sum — with the teleport
    CASE on a literal seed list both engines share. Init mass 1/|S|
    on seeds, 0 elsewhere; dangling mass is dropped identically to
    the plain variant. Per iteration one src-keyed join + one
    aggregate; ranks stay node-count-sized."""
    if not seeds:
        raise ValueError("personalized_pagerank_exact: seeds must be non-empty")
    e = edges.select(
        F.col(src).alias("_s"), F.col(dst).alias("_d"), F.col(weight).alias("_w")
    ).localCheckpoint(eager=False)
    if _exact_sum_type(e.schema["_w"].dataType):
        small = _collect_if_small(e)
        if small is not None:
            return _pagerank_driver(
                edges.sparkSession, small, damping, iters,
                e.schema["_s"].dataType, "ppr", seeds=set(seeds),
            )
    outw = e.groupBy("_s").agg(F.sum("_w").alias("_outw"))
    ew = e.join(outw, "_s").localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("_s").alias("node")).unionAll(e.select("_d")).distinct()
    )
    ns = float(len(set(seeds)))
    is_seed = F.col("node").isin(list(set(seeds)))
    teleport = F.when(is_seed, F.lit(1.0 - damping) / F.lit(ns)).otherwise(F.lit(0.0))
    ranks = nodes.select(
        "node",
        F.when(is_seed, F.lit(1.0) / F.lit(ns)).otherwise(F.lit(0.0)).alias("ppr"),
    )
    for _ in range(iters):
        contrib = ranks.join(ew, ranks["node"] == ew["_s"]).select(
            F.col("_d").alias("node"),
            F.floor(
                (F.col("ppr") * F.col("_w").cast("double") * F.lit(1000000000.0))
                / F.col("_outw").cast("double")
            ).alias("_c"),
        )
        sums = contrib.groupBy("node").agg(F.sum("_c").alias("_c"))
        ranks = nodes.join(sums, "node", "left").select(
            "node",
            (
                teleport
                + F.lit(damping)
                * (
                    F.coalesce(F.col("_c"), F.lit(0).cast("long")).cast("double")
                    / F.lit(1000000000.0)
                )
            ).alias("ppr"),
        )
    return ranks


def louvain_one_level(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 3,
    hint_small_labels: bool = False,
) -> DataFrame:
    """One-level Louvain community detection (synchronous local-moving
    phase, ``rounds`` fixed supersteps): return (node, lbl) where every
    node has greedily ascended modularity. Each superstep EVERY node
    simultaneously picks the community C (among its neighbors'
    communities plus its own) maximizing the EXACT-INTEGER move score

        score(C) = 2m·k_iC − k_i·(Σtot_C − [C = own]·k_i)

    which is the standard Louvain ΔQ multiplied by the positive
    constant 2m² — so the argmax is identical to real-valued Louvain,
    but every comparison is int64 arithmetic both engines reproduce
    bit-for-bit. Ties break to the SMALLEST community id ((score, −c)
    struct max), init c(v)=v, so the whole trajectory is deterministic
    and the DuckDB gate twin (queries/graph.py, unrolled CTEs) matches
    exactly. Like label_propagation this needs numeric node ids (the
    −c negation); the same validation applies.

    Per superstep: one |E| edge×community equi-join + three hash
    aggregates (Σtot, k_iC, argmax) and a lazy lineage cut — the
    Pregel shape, |E| shuffle rows at any scale. Aggregation-phase
    Louvain (collapsing communities into supernodes for the next
    level) is deliberately out of scope: one level already dominates
    the modularity gain on curation graphs, and the gate measures the
    partition's modularity against LPA's on the same graph.

    Upstream reference (seanharr11/etlalchemy) has no graph surface;
    this extends the mandated LLM-curation layer (r12 verdict #7:
    modularity-ascending communities beside LPA)."""
    if rounds < 1:
        raise ValueError(f"louvain_one_level: rounds must be >= 1, got {rounds}")
    for side in (src, dst):
        dt = dict(edges.dtypes)[side]
        if dt in ("string", "binary") or dt.startswith(("decimal", "array", "struct")):
            raise ValueError(
                f"louvain_one_level: node column {side!r} is {dt}; numeric "
                "node ids are required (the smallest-community tie-break "
                "negates ids) — hash ids to integers first"
            )
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionAll(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .localCheckpoint(eager=False)
    )
    deg = (
        sym.groupBy(F.col("u").alias("node"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
        .localCheckpoint(eager=False)
    )
    m_df = edges.agg((F.count(F.lit(1))).cast("bigint").alias("m"))
    comm = deg.select("node", F.col("node").cast("bigint").alias("c"))
    # hint_small_labels (caller-guaranteed |V| bound): every |V|- or
    # |C|-sized frame (community assignment, degrees, per-community
    # totals) is broadcast so the |2E| edge join and the candidate
    # score chain stream without shuffling — the frames descend from
    # checkpoints (no size stats), so the planner cannot make this
    # call itself. All joins are equi-joins; values are unchanged.
    hint = F.broadcast if hint_small_labels else (lambda d: d)
    for r in range(rounds):
        sig = (
            comm.join(hint(deg), "node")
            .groupBy("c")
            .agg(F.sum("degree").cast("bigint").alias("st"))
        )
        comm_b = hint(comm)
        kc = (
            sym.join(comm_b, sym.v == comm_b.node)
            .groupBy(F.col("u").alias("node"), "c")
            .agg(F.count(F.lit(1)).cast("bigint").alias("k"))
        )
        cand = (
            kc.unionByName(comm.select("node", "c", F.lit(0).cast("bigint").alias("k")))
            .groupBy("node", "c")
            .agg(F.max("k").alias("k"))
        )
        cur = comm.select("node", F.col("c").alias("cur_c"))
        sc = (
            cand.join(hint(deg), "node")
            .join(hint(cur), "node")
            .join(hint(sig), "c")
            .crossJoin(F.broadcast(m_df))
            .select(
                "node",
                "c",
                (
                    F.lit(2).cast("bigint") * F.col("m") * F.col("k")
                    - F.col("degree")
                    * (
                        F.col("st")
                        - F.when(F.col("c") == F.col("cur_c"), F.col("degree"))
                        .otherwise(F.lit(0).cast("bigint"))
                    )
                ).alias("score"),
            )
        )
        best = F.max(F.struct(F.col("score"), (-F.col("c")).alias("neg")))
        comm = sc.groupBy("node").agg((-best.getField("neg")).alias("c"))
        if r + 1 < rounds:
            comm = comm.localCheckpoint(eager=False)
    return comm.select("node", F.col("c").alias("lbl"))
