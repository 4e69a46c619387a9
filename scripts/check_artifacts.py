#!/usr/bin/env python
"""Artifact-freshness gate (VERDICT r8 task 3 — sweep staleness recurred
three rounds running; a mechanical check, not a reminder, is the fix).

Asserts that the NEWEST committed sweep artifact (SWEEP_r*.json) covers
every oracle-equipped query in the current registry — i.e. nobody added
or rotated a query without regenerating the sweep. Exits non-zero and
lists the uncovered names otherwise.

Usage: python scripts/check_artifacts.py [sweep_json]
(default: the highest-numbered SWEEP_r*.json in the repo root)

Wire into the cadence: run AFTER the round's sweep regeneration and
before the end-of-round commit; also safe to run any time as a dry
staleness probe.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def newest_sweep(repo_root: str) -> str | None:
    paths = glob.glob(os.path.join(repo_root, "SWEEP_r*.json"))
    if not paths:
        return None

    def round_no(p: str) -> int:
        m = re.search(r"SWEEP_r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1

    return max(paths, key=round_no)


def main() -> int:
    from mapreduce_project_spark import queries_registry as R

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sweep_path = sys.argv[1] if len(sys.argv) > 1 else newest_sweep(repo_root)
    if not sweep_path or not os.path.exists(sweep_path):
        print("GATE FAIL: no SWEEP_r*.json artifact found")
        return 1

    sweep = json.load(open(sweep_path, encoding="utf-8"))
    swept = set(sweep.get("results", {}))
    oracle_equipped = set(R.ALL_ORACLES)

    missing = sorted(oracle_equipped - swept)
    stale_extra = sorted(swept - set(R.ALL_QUERIES))
    bad = sweep.get("bad_or_vacuous", None)

    print(
        f"sweep={os.path.basename(sweep_path)} swept={len(swept)} "
        f"oracle_equipped={len(oracle_equipped)} bad_or_vacuous={bad}"
    )
    ok = True
    if missing:
        ok = False
        print(f"GATE FAIL: {len(missing)} oracle-equipped queries missing "
              f"from {os.path.basename(sweep_path)}:")
        for n in missing:
            print(f"  - {n}")
    if stale_extra:
        # names swept but no longer registered — renames/deletions that
        # make the artifact describe queries that don't exist
        ok = False
        print(f"GATE FAIL: {len(stale_extra)} swept names not in the "
              "current registry (renamed/removed?):")
        for n in stale_extra:
            print(f"  - {n}")
    if bad:
        ok = False
        print(f"GATE FAIL: sweep records bad_or_vacuous={bad}")
    print("GATE OK" if ok else "GATE FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
