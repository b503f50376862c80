"""Per-query measurement harness for the optimization rounds.

For each named query (default: every bench-tagged query): capture
``explain('formatted')`` to ``plans/<round>/<name>_<tag>.txt``, run one
untimed warmup, then time ``--runs`` noop-sink materializations and
report the median — the same protocol as bench.py, but isolated per
query so a single query can be iterated on without paying the suite.

Usage:
  python tools/opt_measure.py [--sf-dir DIR] [--runs N] [--tag before|after]
                              [--no-plans] [query ...]
"""

from __future__ import annotations

import argparse
import json
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
    ap.add_argument("--tag", default=None, help="when set, write plans/<round>/<q>_<tag>.txt")
    ap.add_argument("--plans-round", default="r14")
    ap.add_argument("--out", default=None, help="write the timings JSON here too")
    args = ap.parse_args()

    spark = get_spark("opt_measure")
    qs = all_queries()
    names = args.queries or sorted(n for n, q in qs.items() if "bench" in q.tags)

    plans_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", args.plans_round)
    os.makedirs(plans_dir, exist_ok=True)

    timings: dict[str, float] = {}
    spreads: dict[str, list[float]] = {}
    for name in names:
        jsc = spark.sparkContext._jsc.sc()
        pre_ids = set()
        it = jsc.getPersistentRDDs().keys().iterator()
        while it.hasNext():
            pre_ids.add(it.next())
        spark.sparkContext.setJobDescription(f"opt_measure: {name}")
        df = qs[name].fn(spark, args.sf_dir)
        if args.tag:
            plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(plan)
        df.write.format("noop").mode("overwrite").save()  # warmup (codegen)
        runs = []
        for _ in range(args.runs):
            t0 = time.monotonic()
            qs[name].fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.monotonic() - t0)
        timings[name] = round(statistics.median(runs), 3)
        spreads[name] = [round(min(runs), 3), round(max(runs), 3)]
        print(f"{name}: {timings[name]} {spreads[name]}", file=sys.stderr)
        ent = jsc.getPersistentRDDs().iterator()
        while ent.hasNext():
            kv = ent.next()
            if kv._1() not in pre_ids:
                kv._2().unpersist(False)

    out = {"queries": timings, "spread": spreads, "total": round(sum(timings.values()), 3),
           "sf_dir": args.sf_dir}
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
