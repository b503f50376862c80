"""Split each query's bench cost into plan-BUILD time (driver Python /
Py4J, ``fn(spark, sf_dir)`` returning the DataFrame — includes any
eager actions the build runs) and EXEC time (the noop-sink write).

Usage: python tools/build_vs_exec.py [--runs N] [query ...]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark("build_vs_exec")
    qs = all_queries()
    names = args.queries or sorted(n for n, q in qs.items() if "bench" in q.tags)

    print(f"{'query':40s} {'build':>7s} {'exec':>7s} {'total':>7s}")
    for name in names:
        spark.sparkContext.setJobDescription(f"bve: {name}")
        # warmup (codegen + JIT), untimed
        df = qs[name].fn(spark, args.sf_dir)
        df.write.format("noop").mode("overwrite").save()
        builds, execs = [], []
        for _ in range(args.runs):
            t0 = time.monotonic()
            df = qs[name].fn(spark, args.sf_dir)
            t1 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.monotonic()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        b = statistics.median(builds)
        e = statistics.median(execs)
        print(f"{name:40s} {b:7.3f} {e:7.3f} {b + e:7.3f}", flush=True)


if __name__ == "__main__":
    main()
