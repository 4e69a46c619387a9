"""Adversarial kill-placement matrix for `crawl_dedup_stream`
(VERDICT r12 task 1) — the committed-red STREAMSOAK_r12 `crawl_dedup`
mismatch (226 pairs, 19 triggers, intermittent) gets the exact
treatment that retired the ann_ingest watch item in round 12, plus
the two regimes the soak only hit by luck:

1. PLANTED crashes: for EVERY batch index k and BOTH write boundaries
   ('after_pairs', 'after_sig') the fault injector raises inside
   foreachBatch; restart from the checkpoint; final state must equal
   the sequential batch replay over the stream's OWN observed
   boundaries.
2. FORCED trigger-coalescing restart: planted crash, then the restart
   reads with maxFilesPerTrigger=2 — deterministically reproducing
   the 19-triggers-for-20-files regime the r12 soak saw once under
   load (source options may legally change across restarts).
3. ZOMBIE stop: timed q.stop() + immediate restart. stop() interrupts
   the JVM micro-batch thread but a Python foreachBatch callback
   already executing keeps running (Py4J callback-server thread) —
   awaitTermination() returns while the superseded attempt can still
   write. Root cause of the r12 mismatch; the generation fence
   (streaming/events.py `_fence_register`/`_fenced_write`) now refuses
   the stale write, and these rows prove the final state stays
   consistent anyway.

The whole matrix runs under deliberate CPU load (CRAWL_MATRIX_LOAD
busy-loop spinners, default 8). Writes SPARK_GRAFT_CRAWLKILL_OUT
(default KILLMATRIX_CRAWL.json); exit 0 iff every run is green.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "CRAWL_MATRIX_SF_DIR", "/root/testdata/sf0.01"
)
OUT = os.environ.get("SPARK_GRAFT_CRAWLKILL_OUT", "KILLMATRIX_CRAWL.json")
N_BATCHES = int(os.environ.get("CRAWL_MATRIX_BATCHES", "20"))
LOAD_PROCS = int(os.environ.get("CRAWL_MATRIX_LOAD", "8"))
PLACEMENTS = ("after_pairs", "after_sig")


def loadavg() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def stamp_batch_dir(path: str, idx: int) -> None:
    # widely-spaced mtimes => deterministic 1-file-per-trigger grouping
    # on the FIRST run (the file source orders by mtime); restarts then
    # re-group only where the matrix forces it
    t = 1_600_000_000 + idx * 10
    for root, _dirs, files in os.walk(path):
        for f in files:
            os.utime(os.path.join(root, f), (t, t))


def main() -> int:
    from pyspark.sql import functions as F

    from mapreduce_project_spark.operators.dedup import minhash_index_build
    from mapreduce_project_spark.session import get_spark
    from mapreduce_project_spark.sources import load_table
    from mapreduce_project_spark.streaming.events import (
        _crawl_dedup_batch,
        crawl_dedup_stream,
        read_signature_tree,
    )

    spark = get_spark("crawl-kill-matrix")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="crawlmatrix_")
    report: dict = {
        "sf_dir": SF_DIR,
        "n_batches": N_BATCHES,
        "load_procs": LOAD_PROCS,
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
        # ---- the soak's 20-batch crawl corpus (same construction) ----
        docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
        corpus = docs.filter(F.col("doc_id") % 2 == 0)
        fresh = docs.filter(F.col("doc_id") % 2 == 1).withColumn(
            "doc_id", F.col("doc_id") + 1_000_000
        )
        n_fresh = fresh.count()
        per = max(1, n_fresh // N_BATCHES)
        corpus_rows = corpus.orderBy("doc_id").limit(2 * N_BATCHES).collect()
        fresh_rows = fresh.orderBy("doc_id").collect()
        crawl_src = os.path.join(work, "crawlsrc")
        os.makedirs(crawl_src)
        crawl_text: dict[int, str] = {}
        prev_copy = None
        for i in range(N_BATCHES):
            chunk = (
                fresh_rows[i * per : (i + 1) * per]
                if i < N_BATCHES - 1
                else fresh_rows[(N_BATCHES - 1) * per :]
            )
            rows = [(r["doc_id"], r["text"]) for r in chunk]
            rows.append((2_000_000 + i, corpus_rows[i]["text"]))
            if prev_copy is not None:
                rows.append((3_000_000 + i, prev_copy))
            prev_copy = rows[0][1]
            for did, txt in rows:
                crawl_text[did] = txt
            bdf = spark.createDataFrame(rows, "doc_id long, text string")
            d = os.path.join(crawl_src, f"b{i:02d}.parquet")
            bdf.coalesce(1).write.parquet(d)
            stamp_batch_dir(d, i)

        seed_sig = minhash_index_build(corpus, "doc_id", "text", 3, 64).cache()
        seed_sig.count()

        def observed_groups(idx_tree: str):
            groups = {}
            for d in os.listdir(idx_tree):
                m = re.match(r"batch-(\d+)$", d)
                if not m:
                    continue
                groups[int(m.group(1))] = [
                    r["id"]
                    for r in spark.read.parquet(os.path.join(idx_tree, d))
                    .select("id")
                    .collect()
                ]
            return sorted(groups.items())

        def pair_set(path: str):
            return frozenset(
                (r["new_id"], r["index_id"], round(r["jac"], 9))
                for r in read_signature_tree(spark, path).collect()
            )

        def replay(groups, base: str):
            # sequential no-stream reference over the OBSERVED boundaries
            ridx, rpairs = os.path.join(base, "ridx"), os.path.join(base, "rpairs")
            seed_sig.write.parquet(ridx)
            for bid, ids in groups:
                bdf = spark.createDataFrame(
                    [(i, crawl_text[i]) for i in ids], "doc_id long, text string"
                )
                _crawl_dedup_batch(spark, bdf, bid, ridx, rpairs)
            return pair_set(rpairs), read_signature_tree(spark, ridx).count()

        def run(tag: str, kill_batch: int, placement: str | None,
                restart_mfpt: int = 1) -> dict:
            base = os.path.join(work, tag)
            os.makedirs(base)
            idx = os.path.join(base, "idx")
            seed_sig.write.parquet(idx)
            pairs = os.path.join(base, "pairs")
            ck = os.path.join(base, "ck")
            t0, l0 = time.time(), loadavg()
            fired = {"n": 0}

            def injector(point, batch_id):
                if (
                    placement is not None
                    and point == placement
                    and batch_id == kill_batch
                    and fired["n"] == 0
                ):
                    fired["n"] += 1
                    raise RuntimeError(f"planted crash: batch {batch_id} {point}")

            def start(inj, mfpt: int):
                stream = (
                    spark.readStream.schema("doc_id long, text string")
                    .option("maxFilesPerTrigger", mfpt)
                    .parquet(crawl_src + "/*/")
                )
                return crawl_dedup_stream(
                    spark, stream, idx, pairs, ck, fault_injector=inj
                )

            crashed = False
            if placement is not None:
                q = start(injector, 1)
                try:
                    q.awaitTermination()
                except Exception:
                    crashed = True
            else:  # zombie stop: no waiting for the Python callback
                q = start(None, 1)
                while q.isActive:
                    lp = q.lastProgress
                    if lp is not None and lp.get("batchId", -1) + 1 >= kill_batch:
                        q.stop()
                        crashed = True
                        break
                    time.sleep(0.02)
                # deliberately NOT awaiting anything further: restart races
                # the (possibly still-running) superseded attempt — the
                # generation fence must keep the state consistent
            start(None, restart_mfpt).awaitTermination()
            groups = observed_groups(idx)
            got = (pair_set(pairs), read_signature_tree(spark, idx).count())
            want = replay(groups, base)
            n_triggers = len(groups)
            row = {
                "tag": tag,
                "kill_batch": kill_batch,
                "placement": placement or "zombie_stop",
                "restart_max_files_per_trigger": restart_mfpt,
                "crash_fired": crashed,
                "observed_triggers": n_triggers,
                "coalesced": n_triggers < N_BATCHES,
                "state_equal_replay": got == want,
                "pairs": len(got[0]),
                "index_rows": got[1],
                "loadavg_start": l0,
                "sec": round(time.time() - t0, 2),
            }
            shutil.rmtree(base, ignore_errors=True)
            return row

        ok = True
        seen_coalesced = False
        for k in range(N_BATCHES):
            for placement in PLACEMENTS:
                row = run(f"b{k:02d}_{placement}", k, placement)
                ok &= row["crash_fired"] and row["state_equal_replay"]
                report["runs"].append(row)
                print(json.dumps(row), flush=True)
        for k in (3, 9, 15):  # forced-coalescing restarts
            row = run(f"coalesce{k:02d}", k, "after_pairs", restart_mfpt=2)
            ok &= (
                row["crash_fired"]
                and row["state_equal_replay"]
                and row["coalesced"]
            )
            seen_coalesced |= row["coalesced"]
            report["runs"].append(row)
            print(json.dumps(row), flush=True)
        for k in (5, 13):  # zombie stop + immediate restart
            row = run(f"zombie{k:02d}", k, None)
            ok &= row["crash_fired"] and row["state_equal_replay"]
            report["runs"].append(row)
            print(json.dumps(row), flush=True)

        report["all_green"] = ok
        report["coalescing_regime_exercised"] = seen_coalesced
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
