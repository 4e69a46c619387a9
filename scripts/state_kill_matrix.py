"""Kill-placement matrix for the `applyInPandasWithState` quartet
(VERDICT r12 task 5) — transitions, EWMA, conformal monitor, and
Holt-Winters carry REAL cross-batch state in Spark's state store, and
until round 13 each had only a single-placement soak row (one timed
stop at depth 8). This matrix stops each stream at EVERY batch depth
(1..N-1), restarts from its checkpoint, runs to completion, and
compares the final sink against the stream's batch/prefix oracle —
the same discipline `ann_kill_matrix.py`/`crawl_kill_matrix.py` apply
to the foreachBatch sinks. These streams have NO foreachBatch
boundary to plant a crash inside (the parquet sink + state store
commit is Spark-internal), so every-batch timed stops are the
strongest available placement sweep, per the round-12 verdict.

Runs under deliberate CPU load (STATE_MATRIX_LOAD spinners, default
8). Writes SPARK_GRAFT_STATEKILL_OUT (default KILLMATRIX_STATE.json);
exit 0 iff every run is green.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "STATE_MATRIX_SF_DIR", "/root/testdata/sf0.01"
)
OUT = os.environ.get("SPARK_GRAFT_STATEKILL_OUT", "KILLMATRIX_STATE.json")
N_BATCHES = int(os.environ.get("STATE_MATRIX_BATCHES", "20"))
LOAD_PROCS = int(os.environ.get("STATE_MATRIX_LOAD", "8"))
DEPTHS = [
    int(x)
    for x in os.environ.get(
        "STATE_MATRIX_DEPTHS", ",".join(str(k) for k in range(1, N_BATCHES))
    ).split(",")
]


def loadavg() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def stamp_batch_dir(path: str, idx: int) -> None:
    t = 1_600_000_000 + idx * 10
    for root, _dirs, files in os.walk(path):
        for f in files:
            os.utime(os.path.join(root, f), (t, t))


def main() -> int:
    from pyspark.sql import functions as F

    from mapreduce_project_spark.operators.windows import ewma_fixed
    from mapreduce_project_spark.queries_registry import ALL_QUERIES
    from mapreduce_project_spark.session import get_spark
    from mapreduce_project_spark.sources import load_table
    from mapreduce_project_spark.streaming.events import (
        conformal_stream,
        ewma_stream,
        holt_winters_stream,
        transition_stream,
    )

    spark = get_spark("state-kill-matrix")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="statematrix_")
    report: dict = {
        "sf_dir": SF_DIR,
        "n_batches": N_BATCHES,
        "load_procs": LOAD_PROCS,
        "depths": DEPTHS,
        "runs": [],
    }
    spinners = [
        subprocess.Popen(
            [sys.executable, "-c", "while True: pass"],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        for _ in range(LOAD_PROCS)
    ]
    try:
        ev = load_table(spark, SF_DIR, "events")

        # ---- shared 20-slice event source (the soak's construction) ----
        cuts = [
            ev.selectExpr(
                f"percentile(unix_micros(ts), {i / N_BATCHES})"
            ).collect()[0][0]
            for i in range(1, N_BATCHES)
        ]
        bounds = [float("-inf"), *cuts, float("inf")]
        ev_src = os.path.join(work, "evsrc")
        os.makedirs(ev_src)
        for i in range(N_BATCHES):
            lo, hi = bounds[i], bounds[i + 1]
            sl = ev.filter(
                (F.unix_micros("ts") > F.lit(lo))
                & (F.unix_micros("ts") <= F.lit(hi))
                if lo != float("-inf")
                else (F.unix_micros("ts") <= F.lit(hi))
            )
            d = os.path.join(ev_src, f"b{i:02d}.parquet")
            sl.coalesce(1).write.parquet(d)
            stamp_batch_dir(d, i)

        # ---- per-stream sources + references, built once ----
        want_tr = {
            (r["event_type"], r["next_type"]): r["n"]
            for r in ALL_QUERIES["event_transition_matrix"](
                spark, SF_DIR
            ).collect()
        }

        want_ew = {
            (r["user_id"], r["ts"], r["x"], r["ewma_fx"])
            for r in ewma_fixed(
                ev.selectExpr(
                    "event_id", "user_id", "ts",
                    "cast(floor(value * 100.0 + 0.5) as bigint) as xc",
                ),
                "user_id", ["ts"], "xc", 1, 2,
            ).collect()
        }

        tdaily = (
            ev.groupBy(
                F.col("event_type").alias("series"),
                F.unix_date(F.col("ts").cast("date")).cast("bigint").alias("d"),
            )
            .agg(
                F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint"))
                .cast("bigint")
                .alias("y")
            )
            .orderBy("series", "d")
            .collect()
        )
        hw_src = os.path.join(work, "hwsrc")
        os.makedirs(hw_src)
        hw_batches = min(N_BATCHES, len(tdaily))
        days_sorted = sorted({r["d"] for r in tdaily})
        day_of_batch = {
            d: min(i // max(1, len(days_sorted) // hw_batches), hw_batches - 1)
            for i, d in enumerate(days_sorted)
        }
        for i in range(hw_batches):
            chunk = [r for r in tdaily if day_of_batch[r["d"]] == i]
            if not chunk:
                continue
            d = os.path.join(hw_src, f"b{i:02d}.parquet")
            spark.createDataFrame(
                [(r["series"], r["d"], r["y"]) for r in chunk],
                "series string, d long, y long",
            ).coalesce(1).write.parquet(d)
            stamp_batch_dir(d, i)
        want_hw: set = set()
        hw_state: dict = {}
        for r in tdaily:
            s, d, y = r["series"], int(r["d"]), int(r["y"])
            buf, slist, l, b = hw_state.get(s, ([], [], 0, 0))
            if len(slist) < 7:
                buf = buf + [y]
                if len(buf) == 7:
                    l = sum(buf) // 7
                    b = 0
                    slist = [v - l for v in buf]
                hw_state[s] = (buf, slist, l, b)
                continue
            s_old = slist[0]
            resid = y - (l + b + s_old)
            l_new = (y - s_old + 3 * (l + b)) // 4
            b_new = (l_new - l + 3 * b) // 4
            s_new = (y - l_new + 3 * s_old) // 4
            slist = slist[1:] + [s_new]
            l, b = l_new, b_new
            hw_state[s] = (buf, slist, l, b)
            want_hw.add((s, d, y, l, b, s_new, resid, l + b + slist[0]))

        conf_params = {
            r["event_type"]: (r["pred_cents"], r["qhat_cents"])
            for r in ALL_QUERIES["conformal_value_intervals"](
                spark, SF_DIR
            ).collect()
        }
        cf_src = os.path.join(work, "cfsrc")
        os.makedirs(cf_src)
        cf_slices = []
        for i in range(N_BATCHES):
            sl = spark.read.parquet(
                os.path.join(ev_src, f"b{i:02d}.parquet")
            ).selectExpr(
                "event_type",
                "cast(floor(value * 100.0 + 0.5) AS bigint) AS cents",
            )
            rows_cf = sorted(
                (r["event_type"], int(r["cents"])) for r in sl.collect()
            )
            if not rows_cf:
                continue
            cf_slices.append(rows_cf)
            d = os.path.join(cf_src, f"b{i:02d}.parquet")
            spark.createDataFrame(
                rows_cf, "event_type string, cents long"
            ).coalesce(1).write.parquet(d)
            stamp_batch_dir(d, i)
        cf_map: dict = {}
        cf_final: dict = {}
        cf_counts: dict = {}
        for chunk in cf_slices:
            for typ, c in chunk:
                if typ not in conf_params:
                    continue
                pred, qhat = conf_params[typ]
                n, cov = cf_counts.get(typ, (0, 0))
                n, cov = n + 1, cov + (1 if abs(c - pred) <= qhat else 0)
                cf_counts[typ] = (n, cov)
                ppm = cov * 1000000 // n
                gen = (typ, n, cov, ppm, 1 if n >= 100 and ppm < 850000 else 0)
                cf_map[(typ, n)] = gen
                cf_final[typ] = gen

        # ---- compare functions (final sink vs reference) ----
        def cmp_transition(out):
            got = {
                (r["event_type"], r["next_type"]): r["n"]
                for r in spark.read.parquet(out)
                .groupBy("event_type", "next_type")
                .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
                .collect()
            }
            return got == want_tr and bool(got), len(got)

        def cmp_ewma(out):
            got = {
                (r["user_id"], r["ts"], r["x"], r["ewma_fx"])
                for r in spark.read.parquet(out).collect()
            }
            return got == want_ew and bool(got), len(got)

        def cmp_hw(out):
            got = {
                (r["series"], r["d"], r["y"], r["l"], r["b"], r["s"],
                 r["resid"], r["fc"])
                for r in spark.read.parquet(out).collect()
            }
            return got == want_hw and bool(got), len(got)

        def cmp_cf(out):
            got = {
                (r["event_type"], r["n_seen"], r["n_covered"],
                 r["coverage_ppm"], r["alarm"])
                for r in spark.read.parquet(out).collect()
            }
            match = (
                bool(got)
                and all(r == cf_map.get((r[0], r[1])) for r in got)
                and all(
                    max((r for r in got if r[0] == t2), key=lambda r: r[1])
                    == fin
                    for t2, fin in cf_final.items()
                )
            )
            return match, len(got)

        # ---- stream factories ----
        def src_ev():
            return (
                spark.readStream.schema(ev.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(ev_src + "/*/")
            )

        STREAMS = {
            "transition": (
                lambda out, ck: transition_stream(src_ev())
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ck)
                .outputMode("append")
                .trigger(availableNow=True)
                .start(),
                cmp_transition,
            ),
            "ewma": (
                lambda out, ck: ewma_stream(
                    src_ev().select(
                        "event_id", "user_id", "ts",
                        F.floor(F.col("value") * 100 + F.lit(0.5))
                        .cast("bigint")
                        .alias("x"),
                    )
                )
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ck)
                .outputMode("append")
                .trigger(availableNow=True)
                .start(),
                cmp_ewma,
            ),
            "holt_winters": (
                lambda out, ck: holt_winters_stream(
                    spark.readStream.schema("series string, d long, y long")
                    .option("maxFilesPerTrigger", 1)
                    .parquet(hw_src + "/*/")
                )
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ck)
                .outputMode("append")
                .trigger(availableNow=True)
                .start(),
                cmp_hw,
            ),
            "conformal": (
                lambda out, ck: conformal_stream(
                    spark.readStream.schema("event_type string, cents long")
                    .option("maxFilesPerTrigger", 1)
                    .parquet(cf_src + "/*/"),
                    conf_params,
                )
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ck)
                .outputMode("append")
                .trigger(availableNow=True)
                .start(),
                cmp_cf,
            ),
        }

        def run(name: str, depth: int) -> dict:
            make, cmp = STREAMS[name]
            base = os.path.join(work, f"{name}_{depth:02d}")
            out, ck = os.path.join(base, "out"), os.path.join(base, "ck")
            os.makedirs(base)
            t0, l0 = time.time(), loadavg()
            q = make(out, ck)
            killed_after = None
            while q.isActive:
                lp = q.lastProgress
                if lp is not None and lp.get("batchId", -1) + 1 >= depth:
                    killed_after = lp["batchId"] + 1
                    q.stop()
                    break
                time.sleep(0.02)
            q.awaitTermination()
            make(out, ck).awaitTermination()  # restart from checkpoint
            match, rows = cmp(out)
            row = {
                "stream": name,
                "kill_depth": depth,
                "killed_after_batches": killed_after,
                "restarted": killed_after is not None,
                "state_equal_reference": match,
                "rows": rows,
                "loadavg_start": l0,
                "sec": round(time.time() - t0, 2),
            }
            shutil.rmtree(base, ignore_errors=True)
            return row

        ok = True
        kills_landed = {n: 0 for n in STREAMS}
        for name in STREAMS:
            for depth in DEPTHS:
                row = run(name, depth)
                # a too-deep depth on a fast stream means the stop raced
                # completion — the row must still be state-equal, but only
                # LANDED kills count toward placement coverage
                ok &= row["state_equal_reference"]
                kills_landed[name] += 1 if row["restarted"] else 0
                report["runs"].append(row)
                print(json.dumps(row), flush=True)
        for name, n in kills_landed.items():
            ok &= n >= max(1, len(DEPTHS) // 2)
        report["kills_landed"] = kills_landed
        report["all_green"] = ok
        with open(OUT, "w") as f:
            json.dump(report, f, indent=1)
        print(("MATRIX GREEN" if ok else "MATRIX RED"), "->", OUT)
        return 0 if ok else 1
    finally:
        for p in spinners:
            p.kill()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
