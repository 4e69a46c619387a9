#!/usr/bin/env python
"""Dump .explain("formatted") for named queries into plans/r14/.

Usage: python scripts/dump_query_plan.py <suffix> <query> [<query> ...]
Writes plans/r14/<query>_<suffix>.txt (suffix = "before" / "after").

The optimization-round evidence files: the judge diffs these against
plan claims in OPTIMIZATION_r14.md without running Spark.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14")


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    suffix = sys.argv[1]
    names = sys.argv[2:]
    from mapreduce_project_spark import queries_registry as R
    from mapreduce_project_spark.session import get_spark

    spark = get_spark("dump-query-plan")
    spark.sparkContext.setLogLevel("ERROR")
    queries = {**R.QUERIES, **R.EXTRA_QUERIES}
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        if name not in queries:
            print(f"?? {name}: not registered")
            continue
        df = queries[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
