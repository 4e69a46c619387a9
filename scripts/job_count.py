#!/usr/bin/env python
"""Count Spark JOBS (actions) a declared query launches — the
scheduler-tick evidence for job-count-bound queries on high-tick hosts
(VERDICT r13 items 4/6). Runs each named query once to the noop sink
inside a job group and reports len(getJobIdsForGroup).

Usage: python scripts/job_count.py name [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import __spark_entry__ as entrymod
    from mapreduce_project_spark import queries_registry as reg
    from mapreduce_project_spark.session import get_spark

    spark = get_spark("job_count")
    spark.sparkContext.setLogLevel("ERROR")
    qmap = dict(entrymod.queries())
    for n, f in reg.EXTRA_QUERIES.items():
        qmap.setdefault(n, f)
    out = {}
    for name in sys.argv[1:]:
        spark.catalog.clearCache()
        sc = spark.sparkContext
        sc.setJobGroup(name, name)
        t0 = time.monotonic()
        qmap[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        jobs = sc.statusTracker().getJobIdsForGroup(name)
        sc.setJobGroup("other", "other")
        out[name] = {"jobs": len(jobs), "sec": round(dt, 3)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
