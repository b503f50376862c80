"""Task-retry determinism: the repo's content-hash sampling/split
operators claim reproducibility "across engines AND retries". Spark
retries individual tasks after transient failures and (unlike a seeded
rand()) a content-hash draw must give the retried task byte-identical
output. Inject a real task failure (first attempt of one partition
dies) and pin the sampled row set equal to the no-failure run.

Runs in a SUBPROCESS with master local[4,2]: plain local[N] has task
retries disabled (maxFailures=1), so the shared test session cannot
exercise the rescheduling path at all."""

import os
import subprocess
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import sys
from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, sys.argv[2])  # repo root, passed by the test
from etlalchemy_spark.operators.sampling import bernoulli_sample

spark = (
    SparkSession.builder.master("local[4,2]")  # 4 threads, maxFailures=2
    .appName("retry_determinism")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
marker = sys.argv[1]
base = spark.range(0, 20_000).select(F.col("id").alias("k"))
clean = sorted(
    r.k for r in bernoulli_sample(base, F.col("k"), 0.1, salt="retry:").collect()
)

def gen(batches):
    from pyspark import TaskContext

    ctx = TaskContext.get()
    if ctx.partitionId() == 0 and ctx.attemptNumber() == 0:
        with open(marker, "a") as fh:
            fh.write("failed attempt 0\n")
        raise RuntimeError("injected transient failure (test)")
    yield from batches

flaky = base.repartition(4)
flaky = flaky.mapInPandas(gen, flaky.schema)
retried = sorted(
    r.k for r in bernoulli_sample(flaky, F.col("k"), 0.1, salt="retry:").collect()
)
assert retried == clean, "retry changed the sampled set"
assert 1500 < len(clean) < 2500, len(clean)
print("RETRY_OK", len(clean))
spark.stop()
"""


def test_hash_sample_identical_under_task_retry(tmp_path):
    marker = str(tmp_path / "fail_marker")
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT, marker, _REPO_ROOT],
        capture_output=True,
        text=True,
        timeout=240,
        cwd=_REPO_ROOT,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "RETRY_OK" in out.stdout
    # the injected failure must actually have fired (else vacuous)
    with open(marker) as fh:
        assert "failed attempt 0" in fh.read()
