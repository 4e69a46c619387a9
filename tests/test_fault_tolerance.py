"""Fault-tolerance semantics (SURVEY.md §2.A A14) — the reference
proves worker-crash recovery with a 302-line shell harness
(`test_health_check.sh`: kill a worker mid-job, assert the job still
completes with correct output). On Spark the same guarantee is the
engine's task-retry contract (`spark.task.maxFailures`); this test
exercises it END TO END rather than taking it on faith: a stage whose
tasks CRASH on first attempt (per-partition crash markers on disk, so
retries of the same task see the prior attempt) must still produce
exactly-correct results — no dropped rows, no double-counted rows from
failed attempts' partial work.

Runs in a SUBPROCESS with its own SparkContext: the retry budget is
per-cluster config (``local[threads, maxFailures]``), and only one
context may exist per JVM — the suite's shared session (maxFailures=1)
cannot be reused for this.
"""

from __future__ import annotations

import subprocess
import sys
import textwrap

_SCRIPT = textwrap.dedent(
    """
    import os, sys
    from pyspark.sql import SparkSession

    marker_dir = sys.argv[1]
    os.makedirs(marker_dir, exist_ok=True)
    spark = (
        SparkSession.builder.master("local[4, 3]")  # threads, maxFailures
        .appName("fault-tolerance-test")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.range(0, 1000).selectExpr("id", "id % 4 AS k")

    def crash_once(batches):
        # one crash per task: the first attempt of each partition dies
        # AFTER consuming its input (the worst case - partial work must
        # be discarded); the retry sees the marker and succeeds
        from pyspark import TaskContext

        ctx = TaskContext.get()
        marker = os.path.join(marker_dir, f"p{ctx.partitionId()}")
        rows = list(batches)
        if not os.path.exists(marker):
            with open(marker, "w") as f:
                f.write("attempted")
            raise RuntimeError("injected task crash (first attempt)")
        for pdf in rows:
            yield pdf

    out = (
        df.repartition(4, "k")
        .mapInPandas(crash_once, "id long, k long")
        .groupBy("k")
        .count()
        .collect()
    )
    got = {r["k"]: r["count"] for r in out}
    assert got == {0: 250, 1: 250, 2: 250, 3: 250}, got
    assert len(os.listdir(marker_dir)) == 4, os.listdir(marker_dir)
    spark.stop()
    print("RETRY-RECOVERY-OK")
    """
)


def test_task_retry_recovers_exactly_once_results(tmp_path):
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT, str(tmp_path / "attempts")],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "RETRY-RECOVERY-OK" in proc.stdout
