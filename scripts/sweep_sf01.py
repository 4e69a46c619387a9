#!/usr/bin/env python
"""Deep differential sweep at sf0.1 (the scale the bench runs at):
every oracle-equipped query — declared AND extra — against its DuckDB
twin with the pytest comparator (round-2 precedent: this sweep caught
a RANGE-frame truncation bug invisible at sf0.01).

Usage: python scripts/sweep_sf01.py [start_idx] [end_idx]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.1"

import duckdb  # noqa: E402

from tests.conftest import TABLES, rows_of  # noqa: E402


def main() -> int:
    from mapreduce_project_spark import queries_registry as R
    from mapreduce_project_spark.session import get_spark

    spark = get_spark("sweep-sf01")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{name}.parquet')"
        )
    queries = {**R.QUERIES, **R.EXTRA_QUERIES}
    oracles = {**R.ORACLES, **R.EXTRA_ORACLES}
    names = sorted(n for n in queries if n in oracles)
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else len(names)
    bad = 0
    for name in names[lo:hi]:
        t0 = time.time()
        try:
            got = queries[name](spark, SF_DIR).toPandas()
            want = con.sql(oracles[name]).df()
            ok = (
                sorted(got.columns) == sorted(want.columns)
                and len(got) == len(want)
                and rows_of(got) == rows_of(want)
            )
            vac = len(want) == 0
        except Exception as exc:  # noqa: BLE001
            ok, vac = False, False
            print(f"ERR {name}: {type(exc).__name__}: {exc}"[:200], flush=True)
        if not ok or vac:
            bad += 1
        print(
            f"{'OK ' if ok else 'BAD'}{' VACUOUS' if vac else ''} {name} "
            f"({round(time.time() - t0, 1)}s)",
            flush=True,
        )
    print(f"DONE slice [{lo}:{hi}] bad_or_vacuous={bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
