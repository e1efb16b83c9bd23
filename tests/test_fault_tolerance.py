"""Fault-tolerance parity: the reference's crash test (test-mr.sh:223-271,
mrapps/crash.go) kills workers mid-task and asserts byte-identical output
after re-execution. Spark's analogs, asserted here:

- task retry: a task that throws is re-scheduled up to spark.task.maxFailures
  times (local[N,F] enables it in local mode);
- exactly-once sink commit: only one successful attempt is promoted, so
  re-execution can never double-append (the reference's O_APPEND hazard,
  SURVEY.md §4.2.1).
"""

from __future__ import annotations

import os
import subprocess
import sys


def test_recompute_is_deterministic_no_double_output(spark, sf_dir, tmp_path):
    """Re-running the identical job must byte-match, and no uncommitted
    attempt files may survive the commit protocol."""
    from mapreduce_paper_implementation_spark.plans.queries import QUERIES

    out1 = str(tmp_path / "run1")
    out2 = str(tmp_path / "run2")
    df = QUERIES["q01_wordcount"](spark, sf_dir)
    df.write.mode("overwrite").parquet(out1)
    df.write.mode("overwrite").parquet(out2)
    a = sorted(tuple(r) for r in spark.read.parquet(out1).collect())
    b = sorted(tuple(r) for r in spark.read.parquet(out2).collect())
    assert a == b
    for root, _dirs, files in os.walk(out1):
        assert not any(f.startswith("_temporary") or ".pending" in f for f in files)


def test_task_retry_in_dedicated_context():
    """Full retry round-trip, subprocess-isolated (SparkContext is per-JVM):
    local[2,2] = 2 threads with maxFailures=2. The first attempt of every
    partition throws (deterministic crash.go analog via marker files); the
    retries succeed and the result is exactly-once."""
    code = r"""
import os, tempfile
from pyspark.sql import SparkSession

marker_dir = tempfile.mkdtemp()
spark = (
    SparkSession.builder.master("local[2,2]").appName("retry-test")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
sc = spark.sparkContext

def flaky_partition(i, it):
    m = os.path.join(marker_dir, f"p{i}")
    if not os.path.exists(m):
        open(m, "w").close()
        raise RuntimeError("injected crash: first attempt of partition %d" % i)
    return it

flat = sorted(
    sc.parallelize(range(100), 4).mapPartitionsWithIndex(flaky_partition).collect()
)
assert flat == list(range(100)), f"exactly-once violated: {len(flat)} values"
assert len(os.listdir(marker_dir)) == 4  # every partition crashed once
print("RETRY_OK")
"""
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=300
    )
    assert "RETRY_OK" in r.stdout, r.stderr[-2000:]


def test_randomized_chaos_burn_in():
    """The reference's chaos burn-in (test-mr.sh:223-271 + test-mr-many.sh):
    repeated trials where every task randomly crashes with p~1/3 or sleeps
    with p~1/3 (mrapps/crash.go:22-34), output compared to a golden each
    trial. Spark analog: seeded per-(trial, partition, attempt) randomness,
    local[4,4] task retries, exactly-once result asserted across 3 trials."""
    code = r"""
import random, time
from collections import Counter
from pyspark import TaskContext
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4,4]").appName("chaos-burn-in")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
sc = spark.sparkContext

corpus = [f"word{i % 17} word{i % 5} common" for i in range(2000)]
golden = Counter(w for line in corpus for w in line.split())

for trial in range(3):
    def chaotic(i, it, _trial=trial):
        ctx = TaskContext.get()
        rng = random.Random(f"{_trial}-{i}-{ctx.attemptNumber()}")
        r = rng.random()
        # p~1/3 crash (capped below maxFailures so the job always finishes,
        # like the reference's worker-respawn loop), p~1/3 delay 0-0.3s
        if r < 1.0 / 3 and ctx.attemptNumber() < 2:
            raise RuntimeError("chaos exit trial=%d part=%d" % (_trial, i))
        if r < 2.0 / 3:
            time.sleep(rng.random() * 0.3)
        return ((w, 1) for line in it for w in line.split())

    got = dict(
        sc.parallelize(corpus, 8)
        .mapPartitionsWithIndex(chaotic)
        .reduceByKey(lambda a, b: a + b)
        .collect()
    )
    assert got == dict(golden), f"trial {trial}: chaos output diverged from golden"
print("CHAOS_OK")
"""
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=420
    )
    assert "CHAOS_OK" in r.stdout, r.stderr[-2000:]
