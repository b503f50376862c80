"""Per-job profile of one query run (optimization rounds).

Runs the named queries once (after one untimed warmup) with the Spark
UI REST API enabled and prints every job the run submitted: job id,
duration, number of tasks, and description — the fastest way to see
how many driver-sequenced jobs a query pays and which ones dominate.

Usage: python tools/job_profile.py [--sf-dir DIR] query [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, ".")

from etlalchemy_spark.registry import all_queries
from etlalchemy_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()

    spark = get_spark(
        "job_profile",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4099"},
    )
    qs = all_queries()
    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4099/api/v1/applications/{app_id}"

    def jobs_after(min_id: int):
        with urllib.request.urlopen(f"{base}/jobs") as r:
            data = json.loads(r.read())
        return [j for j in data if j["jobId"] >= min_id]

    for name in args.queries:
        fn = qs[name].fn
        if not args.no_warmup:
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        before = jobs_after(-1)
        min_id = max([j["jobId"] for j in before], default=-1) + 1
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.monotonic()
        fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.monotonic() - t0
        time.sleep(0.3)
        jobs = sorted(jobs_after(min_id), key=lambda j: j["jobId"])
        print(f"\n=== {name}: wall {wall:.2f}s, {len(jobs)} jobs ===")
        tot = 0.0
        for j in jobs:
            t_sub = j.get("submissionTime", "")
            t_end = j.get("completionTime", "")
            dur = ""
            try:
                from datetime import datetime

                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                d = (
                    datetime.strptime(t_end.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
                    - datetime.strptime(t_sub.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
                ).total_seconds()
                tot += d
                dur = f"{d:6.2f}s"
            except Exception:
                dur = "   ?  "
            desc = (j.get("description") or j.get("name", ""))[:110]
            print(f"  job {j['jobId']:>4} {dur} tasks={j.get('numTasks', 0):>5} {desc}")
        print(f"  (sum of job durations: {tot:.2f}s; wall {wall:.2f}s)")


if __name__ == "__main__":
    main()
