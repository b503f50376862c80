#!/usr/bin/env python
"""Derived sf1 fixture + heavy-tail scaling measurement (VERDICT r10
ask 8: every >=sf0.1 scaling claim was a design argument; this turns
the 10x story into a measured slope).

The fixture is sf0.1 replicated 10x with RE-SALTED KEYS (each replica
k offsets every key column by k * ceil(max_key + 1), so joins stay
key-consistent WITHIN a replica and replicas never collide —
fact/dimension ratios, group cardinalities per key, and text/embedding
content distributions are preserved; global distinct counts scale by
10x, which is the honest shape of a bigger corpus). nation/region are
genuinely fixed-size dimensions and are copied as-is. Written once
under /tmp (scratch; /root/testdata is read-only) and reused.

Usage:
  python tools/sf1_scaling.py            # build if missing + time
  python tools/sf1_scaling.py --rebuild  # force fixture rebuild

Output: a markdown table of per-query seconds at sf0.01 / sf0.1 / sf1
with the 10x and 100x slopes, ready for SCALING.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1_DIR = "/tmp/spark_graft_sf1"
SRC = "/root/testdata/sf0.1"

# key columns to offset per table; replicas shift them all by the same
# per-table stride so intra-replica FK joins keep working
KEY_COLS = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
}
COPY_AS_IS = ["nation", "region"]

# the heavy tail from GATE_SF01_r11 that exercises the replicated
# tables (mm_* synthesize pixels from doc_id — replication scales
# their decode workload 10x like a real corpus would)
QUERIES = [
    "text_fingerprint",
    "dedup_semantic_keep_first",
    "sim_knn_batch_exact",
    "dedup_prefix_filter_jaccard",
    "sketch_minhash_jaccard_corpora",
    "graph_triangle_count",
    "text_chargram_quality",
    "mm_decode_jpeg_stats",
    "sim_pq_adc_topk",
    "q1_pricing_summary",
    "q9_product_profit",
    "agg_spearman_corr",
    # r11 bench additions (r11 verdict #8: measure, don't argue)
    "agg_kruskal_wallis",
    "agg_average_precision",
    "graph_hits_exact",
    "ts_hurst_exponent",
    "etl_data_vault_load",
    "scalar_luhn_checksum",
    # r12 bench additions
    "graph_label_propagation",
    "ts_holt_winters_forecast",
]


def build_fixture(spark, force: bool = False) -> None:
    from pyspark.sql import functions as F

    marker = os.path.join(SF1_DIR, "_BUILT")
    if os.path.exists(marker) and not force:
        return
    os.makedirs(SF1_DIR, exist_ok=True)
    for table, keys in KEY_COLS.items():
        src = spark.read.parquet(os.path.join(SRC, f"{table}.parquet"))
        # one FLAT stride (10M) for every key namespace: it exceeds
        # every max key at sf0.1, and using the same stride on both
        # sides of each FK (orderkey in orders+lineitem, custkey in
        # orders+customer) keeps intra-replica joins consistent
        parts = []
        for rep in range(10):
            df = src
            for k in keys:
                df = df.withColumn(k, F.col(k) + F.lit(rep) * F.lit(10_000_000))
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(
            os.path.join(SF1_DIR, f"{table}.parquet")
        )
        print(f"built {table} x10")
    for table in COPY_AS_IS:
        spark.read.parquet(os.path.join(SRC, f"{table}.parquet")).write.mode(
            "overwrite"
        ).parquet(os.path.join(SF1_DIR, f"{table}.parquet"))
    with open(marker, "w") as fh:
        fh.write("ok\n")


def index_scaling(spark) -> dict:
    """Inverted-index scale datapoints (r12 verdict #5): per corpus
    size, build a 10-batch store, then time (a) ONE append of a
    FIXED-SIZE 500-doc batch — corpus-independence means this stays
    flat as the store grows 100x — and (b) the 5-term BM25 probe,
    whose cost is the |terms| bucket directories (those postings grow
    linearly with the corpus, but at 5/64 of a full scan plus fixed
    plan overhead the latency curve should stay near-flat at these
    sizes). Timed as warm + best-of-2 like the query rows."""
    import shutil

    from pyspark.sql import functions as F

    from etlalchemy_spark.operators.textindex import (
        append_text_index,
        probe_text_index,
    )
    from etlalchemy_spark.queries.text import _BM25_TERMS

    out = {"txtidx_append_500doc": {}, "txtidx_probe_bm25": {}}
    for label, sf_dir in (
        ("sf0.01", "/root/testdata/sf0.01"),
        ("sf0.1", SRC),
        ("sf1", SF1_DIR),
    ):
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
            "doc_id", "text"
        )
        lo = docs.agg(F.min("doc_id")).collect()[0][0]
        store = f"/tmp/spark_graft_txtidx_{label}"
        shutil.rmtree(store, ignore_errors=True)
        body = docs.where(F.col("doc_id") >= lo + 500)
        for r in range(10):
            append_text_index(
                store, body.where(F.pmod(F.col("doc_id"), F.lit(10)) == r),
                "doc_id", "text",
            )
        # one timed append of the held-out fixed-size batch (appends
        # are one-shot per store — the disjointness guard forbids a
        # warm repeat, which is exactly the property being measured)
        fresh = docs.where(F.col("doc_id") < lo + 500)
        t0 = time.time()
        append_text_index(store, fresh, "doc_id", "text")
        dt = time.time() - t0
        out["txtidx_append_500doc"][label] = dt
        print(f"txtidx_append_500doc {label:7s} {dt:7.2f}s", flush=True)
        ptimes = []
        for _ in range(3):
            t0 = time.time()
            probe_text_index(spark, store, list(_BM25_TERMS), k=20).collect()
            ptimes.append(time.time() - t0)
        out["txtidx_probe_bm25"][label] = min(ptimes)
        print(f"txtidx_probe_bm25    {label:7s} {min(ptimes):7.2f}s", flush=True)
    return out


def main() -> None:
    force = "--rebuild" in sys.argv
    from etlalchemy_spark.registry import all_queries
    from etlalchemy_spark.session import get_spark

    spark = get_spark()
    build_fixture(spark, force=force)
    qs = all_queries()
    results = {}
    for name in QUERIES:
        fn = qs[name].fn
        results[name] = {}
        for label, sf_dir in (
            ("sf0.01", "/root/testdata/sf0.01"),
            ("sf0.1", SRC),
            ("sf1", SF1_DIR),
        ):
            times = []
            for _ in range(2):  # warm + timed
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                times.append(time.time() - t0)
            results[name][label] = min(times)
            print(f"{name:34s} {label:7s} {min(times):7.2f}s", flush=True)

    results.update(index_scaling(spark))

    print("\n| query | sf0.01 | sf0.1 | sf1 | slope 0.1→1 | slope 0.01→1 |")
    print("|---|---|---|---|---|---|")
    for name, r in results.items():
        s10 = r["sf1"] / max(r["sf0.1"], 1e-9)
        s100 = r["sf1"] / max(r["sf0.01"], 1e-9)
        print(
            f"| {name} | {r['sf0.01']:.2f}s | {r['sf0.1']:.2f}s | "
            f"{r['sf1']:.2f}s | {s10:.1f}x | {s100:.1f}x |"
        )
    with open("/tmp/sf1_scaling.json", "w") as fh:
        json.dump(results, fh, indent=1)
    print("\nwrote /tmp/sf1_scaling.json")


if __name__ == "__main__":
    main()
