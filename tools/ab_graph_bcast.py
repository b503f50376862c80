"""Alternating same-session A/B of the graph |V|-frame broadcast guard.

Runs each query with the guard ON and OFF in alternating order (OFF
first on even iterations, ON first on odd) inside ONE Spark session so
host drift hits both arms equally.

Usage: python tools/ab_graph_bcast.py [--reps N] [query ...]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, ".")

from etlalchemy_spark.registry import all_queries
from etlalchemy_spark.session import get_spark


def run_once(spark, fn, sf_dir) -> float:
    t0 = time.monotonic()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", default=None)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    names = args.queries or ["graph_kcore_peel", "graph_label_propagation", "graph_bfs_hops"]

    spark = get_spark("ab_graph_bcast")
    qs = all_queries()
    for name in names:
        fn = qs[name].fn
        # warmup both arms
        os.environ["SPARK_GRAFT_GRAPH_BCAST"] = "off"
        run_once(spark, fn, args.sf_dir)
        os.environ.pop("SPARK_GRAFT_GRAPH_BCAST")
        run_once(spark, fn, args.sf_dir)
        on, off = [], []
        for i in range(args.reps):
            order = ["off", "on"] if i % 2 == 0 else ["on", "off"]
            for arm in order:
                if arm == "off":
                    os.environ["SPARK_GRAFT_GRAPH_BCAST"] = "off"
                else:
                    os.environ.pop("SPARK_GRAFT_GRAPH_BCAST", None)
                t = run_once(spark, fn, args.sf_dir)
                (off if arm == "off" else on).append(t)
        print(
            f"{name}: off median {statistics.median(off):.3f} {sorted(off)} | "
            f"on median {statistics.median(on):.3f} {sorted(on)}",
            flush=True,
        )


if __name__ == "__main__":
    main()
