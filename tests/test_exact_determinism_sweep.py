"""Cross-config determinism sweep for the oracle-exact family
(r7 verdict #5).

The failure class the driver reported in r7 — a result that differs on
another container while every local run agrees — had no systematic
guard: each query is deterministic BY DESIGN (content-hash draws,
decimal reductions, plan-literal bounds), but nothing executed them
under materially different runtime configs and compared VALUES. This
sweep runs a representative slice of the registry (one per family
whose machinery could plausibly couple to the environment: quantile
bounds, window bucketing, float ordering, iterative state, driver-side
literals) under two (shuffle partitions, scan split size) configs and
asserts bit-identical canonical results. A drift here is a real bug; a
green sweep makes 'unreproducible driver flake' strong evidence of a
data/oracle-side cause instead.
"""

import os
import sys

import pytest

from conftest import SF_DIR
from etlalchemy_spark.registry import all_queries

_TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")

SWEEP_QUERIES = [
    "window_running_sum_global_scalable",  # prefix buckets + approxQuantile
    "window_rank_global_scalable",
    "text_vocab_coverage",                 # rank + running sum over word freqs
    "dedup_minhash_lsh_exact",             # banded candidates + md5 signatures
    "sim_cosine_topk_lsh_exact",           # decimal signs + top-k tie-breaks
    "sketch_quantile_histogram",           # driver-literal bin bounds
    "agg_mode_exact",                      # per-group argmax tie-breaks
    "agg_percentile_exact",
    "text_tfidf_topterms",                 # float scores -> rank ordering
    "ts_holt_brown_forecast",              # iterative float recurrence
    "sample_reservoir_hash_topk",          # per-partition heaps + driver merge
    "graph_recursive_closure",             # iterative fixpoint
    "graph_label_propagation",             # superstep struct-max ties (r12)
    "sim_ivf_kmeans_exact_topk",           # trained centroids as driver literals (r12)
]

CONFIGS = [
    {"spark.sql.shuffle.partitions": "5",
     "spark.sql.files.maxPartitionBytes": "262144"},
    {"spark.sql.shuffle.partitions": "32",
     "spark.sql.files.maxPartitionBytes": "134217728"},
]


def _canonical(df):
    if _TOOLS not in sys.path:
        sys.path.insert(0, _TOOLS)
    from verify_local import normalize

    pdf = normalize(df.toPandas())
    return [tuple(str(v) for v in row) for row in pdf.itertuples(index=False)]


@pytest.mark.parametrize("name", SWEEP_QUERIES)
def test_exact_result_invariant_across_configs(spark, name):
    fn = all_queries()[name].fn
    results = []
    for conf in CONFIGS:
        saved = {k: spark.conf.get(k) for k in conf}
        try:
            for k, v in conf.items():
                spark.conf.set(k, v)
            results.append(_canonical(fn(spark, SF_DIR)))
        finally:
            for k, v in saved.items():
                spark.conf.set(k, v)
    assert results[0] == results[1], (
        f"{name}: result drifted between runtime configs — "
        "environment-coupled nondeterminism"
    )


_SUBPROC_QUERIES = [
    "window_running_sum_global_scalable",
    "sample_weighted_systematic",
    "dedup_minhash_lsh_exact",
    "text_vocab_coverage",
]

_SUBPROC_SCRIPT = r"""
import sys
repo, sf_dir = sys.argv[1], sys.argv[2]
sys.path.insert(0, repo)
import os
sys.path.insert(0, os.path.join(repo, "tools"))
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[3]")
    .appName("det-sweep-subproc")
    .config("spark.sql.shuffle.partitions", "3")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.driver.memory", "3g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from etlalchemy_spark.session import ensure_session_confs
ensure_session_confs(spark)
from etlalchemy_spark.registry import all_queries
from verify_local import result_hash
for name in sys.argv[3:]:
    pdf = all_queries()[name].fn(spark, sf_dir).toPandas()
    print(f"HASH {name} {result_hash(pdf)}")
spark.stop()
"""


def test_exact_results_invariant_across_parallelism(spark):
    """The axis in-session sweeps can't move: EXECUTOR PARALLELISM
    (defaultParallelism drives file splits, createDataFrame slicing,
    and task scheduling — exactly what differs on the driver's
    container). Runs a slice of the sweep in a local[3] subprocess and
    compares canonical result hashes against this session's
    local[4]."""
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", _SUBPROC_SCRIPT, repo, SF_DIR, *_SUBPROC_QUERIES],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=repo,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    theirs = dict(
        line.split()[1:3]
        for line in out.stdout.splitlines()
        if line.startswith("HASH ")
    )
    assert set(theirs) == set(_SUBPROC_QUERIES)

    if _TOOLS not in sys.path:
        sys.path.insert(0, _TOOLS)
    from verify_local import result_hash

    for name in _SUBPROC_QUERIES:
        mine = result_hash(all_queries()[name].fn(spark, SF_DIR).toPandas())
        assert mine == theirs[name], (
            f"{name}: result differs between local[4] session and "
            f"local[3] subprocess — parallelism-coupled nondeterminism"
        )
