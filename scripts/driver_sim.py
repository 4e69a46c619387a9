#!/usr/bin/env python
"""Replay the driver's correctness harness locally: run every DECLARED
query and its DuckDB oracle side-by-side at sf0.01 (the driver's scale)
and report rows/schema/hash matches, flagging vacuous (0-row) passes.

Usage: python scripts/driver_sim.py [sf_dir]   (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

import duckdb  # noqa: E402

from tests.conftest import TABLES, rows_of  # noqa: E402


def main() -> int:
    import __spark_entry__ as entry

    from mapreduce_project_spark.session import get_spark

    spark = get_spark("driver-sim")
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{name}.parquet')"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    results: dict[str, dict] = {}
    bad = 0
    for name, fn in queries.items():
        t0 = time.time()
        rec: dict = {}
        try:
            sdf = fn(spark, SF_DIR)
            # DRIVER-CANON LINT (round-9 red-row class): the driver's
            # canonicalizer sorts cell VALUES via pandas and crashes on
            # unhashable array/map/struct cells — our local rows_of
            # stringifies them, so without this check the sim passes
            # where the driver dies. Nested top-level columns are a
            # hard failure here; render them as comma-joined strings
            # (the inverted_index convention).
            nested = [
                f"{f.name}:{f.dataType.simpleString()}"
                for f in sdf.schema.fields
                if f.dataType.typeName() in ("array", "map", "struct")
            ]
            if nested:
                raise TypeError(
                    f"driver-canon lint: nested top-level columns {nested}"
                )
            got = sdf.toPandas()
            if name in oracles:
                want = con.sql(oracles[name]).df()
                rec["rows_match"] = len(got) == len(want)
                rec["schema_match"] = sorted(got.columns) == sorted(want.columns)
                rec["hash_match"] = (
                    rec["rows_match"]
                    and rec["schema_match"]
                    and rows_of(got) == rows_of(want)
                )
                rec["spark_rows"] = len(got)
                rec["oracle_rows"] = len(want)
            else:
                rec["rows_match"] = len(got) >= 0
                rec["spark_rows"] = len(got)
            rec["err"] = None
        except Exception as exc:  # noqa: BLE001
            rec = {"err": f"{type(exc).__name__}: {exc}"[:300]}
        rec["sec"] = round(time.time() - t0, 2)
        spark.catalog.clearCache()  # bound memory: builders may .cache()
        results[name] = rec
        ok = rec.get("hash_match", rec.get("rows_match", False)) and not rec["err"]
        vac = rec.get("spark_rows") == 0
        if not ok or vac:
            bad += 1
        print(
            f"{'OK ' if ok else 'BAD'}{' VACUOUS' if vac else ''} "
            f"{name}: {rec}",
            flush=True,
        )
    print(json.dumps({"total": len(results), "bad_or_vacuous": bad}))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
