#!/usr/bin/env python
"""Streaming soak (round-5 artifact): drive the hardest stateful
streams — `crawl_dedup_stream`, `heavy_hitters_stream`,
`anomaly_stream`, `twap_stream`, `cusum_stream`, `ann_ingest_stream`
— over >=20 micro-batches each at sf0.1, KILL the
query mid-run and RESTART it from the same checkpoint, then assert the
final result equals the batch reference:

- crawl dedup: streamed pairs + signature index == a sequential BATCH
  replay of the same 20 crawl batches through `_crawl_dedup_batch`
  (same deterministic code, no streaming machinery), and the original
  corpus index files stay byte-stable;
- heavy hitters: the final Space-Saving generation per key == exact
  batch groupBy counts (budget >= distinct items, so zero error);
- anomaly: the parquet-sink flag set (pre-kill rows survive the
  restart via the file-sink commit log) == the batch scoring pass with
  the same integer thresholds.

Usage: SPARK_GRAFT_SOAK_OUT=STREAMSOAK_r5.json python scripts/stream_soak.py [sf_dir]
Writes one JSON object; exits non-zero on any mismatch.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = os.environ.get("SPARK_GRAFT_SOAK_OUT", "STREAMSOAK_r5.json")
N_BATCHES = 20
KILL_AFTER = 8  # stop the query once this many micro-batches completed


def stamp_batch_dir(path: str, idx: int) -> None:
    """Force a strictly-increasing, widely-spaced mtime onto every file
    of a just-written batch directory. The parquet file source orders
    batches by modification time; under load a sleep-based scheme can
    produce equal-to-the-granularity mtimes, letting two source files
    coalesce into one micro-batch — harmless for order-insensitive
    streams, but it shifts batch BOUNDARIES for the crawl-dedup stream
    whose within-batch vs cross-batch dedup semantics the soak compares
    against a 20-batch sequential replay (observed once: 19 triggers,
    pair-set mismatch). Explicit 10-second spacing makes the grouping
    deterministic."""
    t = 1_600_000_000 + idx * 10
    for root, _dirs, files in os.walk(path):
        for f in files:
            os.utime(os.path.join(root, f), (t, t))


def drive_with_kill(make_query, label: str) -> dict:
    """Start the streaming query, stop it after KILL_AFTER completed
    micro-batches, restart from the same checkpoint, run to completion.
    Returns run metadata. `make_query` must build a FRESH query (new
    readStream + writeStream) each call, against the same checkpoint."""
    t0 = time.time()
    q = make_query()
    killed_after = None
    while q.isActive:
        lp = q.lastProgress
        if lp is not None and lp.get("batchId", -1) + 1 >= KILL_AFTER:
            killed_after = lp["batchId"] + 1
            q.stop()
            break
        time.sleep(0.05)
    q.awaitTermination()
    restarted = killed_after is not None
    q2 = make_query()  # resume from the same checkpoint
    q2.awaitTermination()
    batches = 0
    for p in q2.recentProgress:
        if p.get("numInputRows", 0) >= 0:
            batches = max(batches, p.get("batchId", -1) + 1)
    return {
        "label": label,
        "killed_after_batches": killed_after,
        "restarted": restarted,
        "total_batches": batches,
        "sec": round(time.time() - t0, 2),
    }


def main() -> int:
    from pyspark.sql import functions as F

    from mapreduce_project_spark.session import get_spark
    from mapreduce_project_spark.sources import load_table

    spark = get_spark("stream-soak")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="soak_")
    report: dict = {"sf_dir": SF_DIR, "n_batches_target": N_BATCHES, "streams": {}}
    ok = True

    # ---- shared event micro-batches: 20 time-ordered slices ----
    ev = load_table(spark, SF_DIR, "events")
    cuts = [
        ev.selectExpr(f"percentile(unix_micros(ts), {i / N_BATCHES})").collect()[0][0]
        for i in range(1, N_BATCHES)
    ]
    bounds = [float("-inf"), *cuts, float("inf")]
    ev_src = os.path.join(work, "evsrc")
    os.makedirs(ev_src)
    for i in range(N_BATCHES):
        lo, hi = bounds[i], bounds[i + 1]
        sl = ev.filter(
            (F.unix_micros("ts") > F.lit(lo)) & (F.unix_micros("ts") <= F.lit(hi))
            if lo != float("-inf")
            else (F.unix_micros("ts") <= F.lit(hi))
        )
        sl.coalesce(1).write.parquet(os.path.join(ev_src, f"b{i:02d}.parquet"))
        stamp_batch_dir(os.path.join(ev_src, f"b{i:02d}.parquet"), i)

    # ---------- 1. heavy hitters (Space-Saving), budget covers ----------
    from mapreduce_project_spark.streaming.events import heavy_hitters_stream

    hh_cols = ["event_id", "ts", "user_id", "event_type"]
    hh_out, hh_ck = os.path.join(work, "hh_out"), os.path.join(work, "hh_ck")

    def make_hh():
        stream = (
            spark.readStream.schema(ev.select(*hh_cols).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(ev_src + "/*/")
            .select(*hh_cols)
        )
        return (
            heavy_hitters_stream(stream, budget=4096)
            .writeStream.format("parquet")
            .option("path", hh_out)
            .option("checkpointLocation", hh_ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    meta = drive_with_kill(make_hh, "heavy_hitters_stream")
    rows = spark.read.parquet(hh_out).collect()
    latest_n: dict = {}
    for r in rows:
        latest_n[r["event_type"]] = max(latest_n.get(r["event_type"], 0), r["n_seen"])
    final = {
        (r["event_type"], r["item"]): (r["count_est"], r["err"])
        for r in rows
        if r["n_seen"] == latest_n[r["event_type"]]
    }
    truth = {
        (r["event_type"], r["user_id"]): r["n"]
        for r in ev.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .collect()
    }
    hh_match = (
        set(final) == set(truth)
        and all(final[k] == (truth[k], 0) for k in truth)
    )
    meta.update(
        {"final_rows": len(final), "exact_match_vs_batch": hh_match}
    )
    report["streams"]["heavy_hitters"] = meta
    ok &= hh_match and meta["restarted"]

    # ---------- 2. anomaly flags (EWMA residual vs MAD thresholds) ----------
    from pyspark.sql import Window

    from mapreduce_project_spark.operators.windows import ewma_fixed
    from mapreduce_project_spark.streaming.events import anomaly_stream

    evx = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("x"),
    )
    sm = ewma_fixed(evx.withColumnRenamed("x", "xc"), "user_id", ["ts"], "xc", 1, 2)
    w = Window.partitionBy("user_id").orderBy("ts")
    resid = sm.withColumn("r", F.col("x") - F.lag("ewma_fx").over(w)).filter(
        F.col("r").isNotNull()
    )
    med = int(resid.selectExpr("percentile(r, 0.50)").collect()[0][0])
    mad = int(resid.selectExpr(f"percentile(abs(r - {med}), 0.50)").collect()[0][0])
    an_out, an_ck = os.path.join(work, "an_out"), os.path.join(work, "an_ck")

    def make_an():
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(ev_src + "/*/")
            .select(
                "event_id",
                "user_id",
                "ts",
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("x"),
            )
        )
        return (
            anomaly_stream(stream, med, mad, 5)
            .writeStream.format("parquet")
            .option("path", an_out)
            .option("checkpointLocation", an_ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    meta = drive_with_kill(make_an, "anomaly_stream")
    got = {
        (r["user_id"], r["ts"], r["x"], r["resid"])
        for r in spark.read.parquet(an_out).collect()
    }
    want = {
        (r["user_id"], r["ts"], r["x"], r["resid"])
        for r in resid.filter(F.abs(F.col("r") - med) > 5 * mad)
        .select("user_id", "ts", "x", F.col("r").alias("resid"))
        .collect()
    }
    an_match = got == want and bool(got)
    meta.update({"flagged_rows": len(got), "match_vs_batch": an_match})
    report["streams"]["anomaly"] = meta
    ok &= an_match and meta["restarted"]

    # ---------- 2b. streaming TWAP (LOCF integral across batches) ----------
    from mapreduce_project_spark.streaming.events import twap_stream

    evt = ev.select(
        "event_id",
        "user_id",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        F.unix_micros("ts").alias("us"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    tw_out, tw_ck = os.path.join(work, "tw_out"), os.path.join(work, "tw_ck")

    def make_tw():
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(ev_src + "/*/")
            .select(
                "event_id",
                "user_id",
                F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
                F.unix_micros("ts").alias("us"),
                F.floor(F.col("value") * 100 + F.lit(0.5))
                .cast("bigint")
                .alias("cents"),
            )
        )
        return (
            twap_stream(stream)
            .writeStream.format("parquet")
            .option("path", tw_out)
            .option("checkpointLocation", tw_ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    meta = drive_with_kill(make_tw, "twap_stream")
    latest: dict = {}
    for r in spark.read.parquet(tw_out).collect():
        kk = (r["user_id"], r["day"])
        if kk not in latest or r["n_seen"] > latest[kk][0]:
            latest[kk] = (r["n_seen"], r["span_us"], r["twap"])
    from pyspark.sql import Window as _W

    seq = evt.withColumn(
        "next_us", F.lead("us").over(_W.partitionBy("user_id", "day").orderBy("us"))
    )
    want_rows = (
        seq.groupBy("user_id", "day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(
                F.when(F.col("next_us").isNull(), F.lit(0)).otherwise(
                    F.col("cents") * (F.col("next_us") - F.col("us"))
                )
            )
            .cast("bigint")
            .alias("wsum"),
            (F.max("us") - F.min("us")).cast("bigint").alias("span_us"),
            F.min("cents").alias("first_only"),
        )
        .collect()
    )
    want = {}
    for r in want_rows:
        tw = (
            r["first_only"] / 100.0
            if r["span_us"] == 0
            else r["wsum"] / r["span_us"] / 100.0
        )
        want[(r["user_id"], r["day"])] = (r["n"], r["span_us"], tw)
    tw_match = latest == want and bool(latest)
    meta.update({"keys": len(latest), "match_vs_batch": tw_match})
    report["streams"]["twap"] = meta
    ok &= tw_match and meta["restarted"]

    # ---------- 2c. streaming CUSUM (S+/S- recursion across batches) ----------
    from mapreduce_project_spark.streaming.events import cusum_stream

    daily = ev.groupBy(
        F.unix_date(F.col("ts").cast("date")).cast("bigint").alias("ed")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    dtot, dnd = daily.agg(F.sum("n"), F.count(F.lit(1))).collect()[0]
    mean_fp = int(dtot * 1000 // dnd)
    slack_fp = mean_fp // 4
    day_rows = (
        daily.withColumn("series", F.lit("all"))
        .select("series", "ed", "n")
        .orderBy("ed")
        .collect()
    )
    cu_src = os.path.join(work, "cusrc")
    os.makedirs(cu_src)
    cu_batches = min(N_BATCHES, len(day_rows))
    per_day = max(1, len(day_rows) // cu_batches)
    for i in range(cu_batches):
        chunk = (
            day_rows[i * per_day : (i + 1) * per_day]
            if i < cu_batches - 1
            else day_rows[(cu_batches - 1) * per_day :]
        )
        spark.createDataFrame(
            [(r["series"], r["ed"], r["n"]) for r in chunk],
            "series string, ed long, n long",
        ).coalesce(1).write.parquet(os.path.join(cu_src, f"b{i:02d}.parquet"))
        stamp_batch_dir(os.path.join(cu_src, f"b{i:02d}.parquet"), i)
    cu_out, cu_ck = os.path.join(work, "cu_out"), os.path.join(work, "cu_ck")

    def make_cu():
        stream = (
            spark.readStream.schema("series string, ed long, n long")
            .option("maxFilesPerTrigger", 1)
            .parquet(cu_src + "/*/")
        )
        return (
            cusum_stream(stream, mean_fp, slack_fp)
            .writeStream.format("parquet")
            .option("path", cu_out)
            .option("checkpointLocation", cu_ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    meta = drive_with_kill(make_cu, "cusum_stream")
    got_cu = {
        (r["ed"], r["n"], r["s_up"], r["s_dn"], r["changepoint"])
        for r in spark.read.parquet(cu_out).collect()
    }
    s_up = s_dn = 0
    want_cu = set()
    for r in day_rows:
        n = int(r["n"])
        s_up = max(0, s_up + n * 1000 - mean_fp - slack_fp)
        s_dn = max(0, s_dn + mean_fp - n * 1000 - slack_fp)
        want_cu.add(
            (r["ed"], n, s_up, s_dn, 1 if (s_up > mean_fp or s_dn > mean_fp) else 0)
        )
    cu_match = got_cu == want_cu and bool(got_cu)
    meta.update({"days": len(got_cu), "match_vs_batch": cu_match})
    report["streams"]["cusum"] = meta
    ok &= cu_match and meta["restarted"]

    # ---------- 2d. streaming Holt (level+trend recursion, D238) ----------
    from mapreduce_project_spark.streaming.events import holt_stream

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
    ho_src = os.path.join(work, "hosrc")
    os.makedirs(ho_src)
    ho_batches = min(N_BATCHES, len(tdaily))
    # split by DAY so every series advances in-order across batches
    days_sorted = sorted({r["d"] for r in tdaily})
    day_of_batch = {
        d: min(i // max(1, len(days_sorted) // ho_batches), ho_batches - 1)
        for i, d in enumerate(days_sorted)
    }
    for i in range(ho_batches):
        chunk = [r for r in tdaily if day_of_batch[r["d"]] == i]
        if not chunk:
            continue
        spark.createDataFrame(
            [(r["series"], r["d"], r["y"]) for r in chunk],
            "series string, d long, y long",
        ).coalesce(1).write.parquet(os.path.join(ho_src, f"b{i:02d}.parquet"))
        stamp_batch_dir(os.path.join(ho_src, f"b{i:02d}.parquet"), i)
    ho_out, ho_ck = os.path.join(work, "ho_out"), os.path.join(work, "ho_ck")

    def make_ho():
        stream = (
            spark.readStream.schema("series string, d long, y long")
            .option("maxFilesPerTrigger", 1)
            .parquet(ho_src + "/*/")
        )
        return (
            holt_stream(stream)
            .writeStream.format("parquet")
            .option("path", ho_out)
            .option("checkpointLocation", ho_ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    meta = drive_with_kill(make_ho, "holt_stream")
    got_ho = {
        (r["series"], r["d"], r["y"], r["l"], r["b"], r["resid"])
        for r in spark.read.parquet(ho_out).collect()
    }
    want_ho = set()
    state: dict = {}
    for r in tdaily:
        s, d, y = r["series"], int(r["d"]), int(r["y"])
        if s not in state:
            l, b, resid = y, 0, 0
        else:
            lp, bp = state[s]
            resid = y - (lp + bp)
            l = (y + 3 * (lp + bp)) // 4
            b = (l - lp + 3 * bp) // 4
        state[s] = (l, b)
        want_ho.add((s, d, y, l, b, resid))
    ho_match = got_ho == want_ho and bool(got_ho)
    meta.update({"rows": len(got_ho), "match_vs_batch": ho_match})
    report["streams"]["holt"] = meta
    ok &= ho_match and meta["restarted"]

    # ---------- 2e. streaming Holt-Winters (seasonal ring buffer, D251) ----------
    from mapreduce_project_spark.streaming.events import holt_winters_stream

    hw_src = os.path.join(work, "hwsrc")
    os.makedirs(hw_src)
    for i in range(ho_batches):
        chunk = [r for r in tdaily if day_of_batch[r["d"]] == i]
        if not chunk:
            continue
        spark.createDataFrame(
            [(r["series"], r["d"], r["y"]) for r in chunk],
            "series string, d long, y long",
        ).coalesce(1).write.parquet(os.path.join(hw_src, f"b{i:02d}.parquet"))
        stamp_batch_dir(os.path.join(hw_src, f"b{i:02d}.parquet"), i)
    hw_out, hw_ck = os.path.join(work, "hw_out"), os.path.join(work, "hw_ck")

    def make_hw():
        stream = (
            spark.readStream.schema("series string, d long, y long")
            .option("maxFilesPerTrigger", 1)
            .parquet(hw_src + "/*/")
        )
        return (
            holt_winters_stream(stream)
            .writeStream.format("parquet")
            .option("path", hw_out)
            .option("checkpointLocation", hw_ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    meta = drive_with_kill(make_hw, "holt_winters_stream")
    got_hw = {
        (r["series"], r["d"], r["y"], r["l"], r["b"], r["s"], r["resid"], r["fc"])
        for r in spark.read.parquet(hw_out).collect()
    }
    want_hw = set()
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
    hw_match = got_hw == want_hw and bool(got_hw)
    meta.update({"rows": len(got_hw), "match_vs_batch": hw_match})
    report["streams"]["holt_winters"] = meta
    ok &= hw_match and meta["restarted"]

    # ---------- 3. growing-corpus crawl dedup ----------
    from mapreduce_project_spark.operators.dedup import minhash_index_build
    from mapreduce_project_spark.streaming.events import (
        _crawl_dedup_batch,
        crawl_dedup_stream,
        read_signature_tree,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    fresh = docs.filter(F.col("doc_id") % 2 == 1).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    n_fresh = fresh.count()
    per = max(1, n_fresh // N_BATCHES)
    corpus_rows = corpus.orderBy("doc_id").limit(2 * N_BATCHES).collect()
    crawl_src = os.path.join(work, "crawlsrc")
    os.makedirs(crawl_src)
    batch_dfs = []
    prev_copy = None
    fresh_rows = fresh.orderBy("doc_id").collect()
    for i in range(N_BATCHES):
        chunk = fresh_rows[i * per : (i + 1) * per] if i < N_BATCHES - 1 else fresh_rows[(N_BATCHES - 1) * per :]
        rows = [(r["doc_id"], r["text"]) for r in chunk]
        # plant a dup vs the ORIGINAL corpus index...
        c = corpus_rows[i]
        rows.append((2_000_000 + i, c["text"]))
        # ...and a dup vs a doc that entered the index via the PREVIOUS
        # micro-batch (the growing-index proof, every batch)
        if prev_copy is not None:
            rows.append((3_000_000 + i, prev_copy))
        prev_copy = rows[0][1]
        bdf = spark.createDataFrame(rows, "doc_id long, text string")
        batch_dfs.append(bdf)
        bdf.coalesce(1).write.parquet(os.path.join(crawl_src, f"b{i:02d}.parquet"))
        stamp_batch_dir(os.path.join(crawl_src, f"b{i:02d}.parquet"), i)

    idx_s = os.path.join(work, "idx_stream")
    idx_b = os.path.join(work, "idx_batch")
    sig = minhash_index_build(corpus, "doc_id", "text", 3, 64)
    sig.write.parquet(idx_s)
    sig.write.parquet(idx_b)
    orig_files = {
        f: os.stat(os.path.join(idx_s, f)).st_mtime_ns
        for f in os.listdir(idx_s)
        if f.endswith(".parquet")
    }
    pairs_s = os.path.join(work, "pairs_stream")
    pairs_b = os.path.join(work, "pairs_batch")
    cd_ck = os.path.join(work, "cd_ck")

    def make_cd():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(crawl_src + "/*/")
        )
        return crawl_dedup_stream(spark, stream, idx_s, pairs_s, cd_ck)

    meta = drive_with_kill(make_cd, "crawl_dedup_stream")

    # Batch reference: the same docs through the same handler,
    # sequentially, without any streaming machinery — grouped by the
    # STREAM'S OWN observed batches (read back from its batch-<id>/
    # index dirs). The intended grouping is one file per trigger, but
    # a q.stop()/restart can legally coalesce two source files into
    # one trigger (observed: 19 triggers for 20 files), and crawl
    # dedup's within-batch vs cross-batch semantics depend on the
    # boundaries — the soak's claim is determinism + exactly-once for
    # whatever boundaries the engine chose, so the replay must use
    # the observed ones.
    crawl_text = {}
    for bdf in batch_dfs:
        for r in bdf.collect():
            crawl_text[r["doc_id"]] = r["text"]

    def observed_groups(idx_tree):
        import re as _re

        groups = {}
        for d in os.listdir(idx_tree):
            m = _re.match(r"batch-(\d+)$", d)
            if not m:
                continue
            ids = [
                r["id"]
                for r in spark.read.parquet(os.path.join(idx_tree, d))
                .select("id").collect()
            ]
            groups[int(m.group(1))] = ids
        return sorted(groups.items())

    # NOTE: index batch dirs hold dedup SURVIVOR signatures only for
    # the ann pipeline but FULL batch signatures here (crawl appends
    # every doc's signature) — so the crawl grouping is total.
    for bid, ids in observed_groups(idx_s):
        bdf = spark.createDataFrame(
            [(i, crawl_text[i]) for i in ids], "doc_id long, text string"
        )
        _crawl_dedup_batch(spark, bdf, bid, idx_b, pairs_b)

    def pair_set(path):
        return {
            (r["new_id"], r["index_id"], round(r["jac"], 9))
            for r in read_signature_tree(spark, path).collect()
        }

    ps, pb = pair_set(pairs_s), pair_set(pairs_b)
    idx_rows_s = read_signature_tree(spark, idx_s).count()
    idx_rows_b = read_signature_tree(spark, idx_b).count()
    cross_batch = sum(1 for (nid, iid, _) in ps if iid >= 1_000_000 or iid >= 2_000_000)
    index_stable = all(
        os.stat(os.path.join(idx_s, f)).st_mtime_ns == m for f, m in orig_files.items()
    )
    cd_match = ps == pb and bool(ps) and idx_rows_s == idx_rows_b and index_stable
    meta.update(
        {
            "pairs": len(ps),
            "pairs_vs_batch_replay_equal": ps == pb,
            "cross_batch_pairs": cross_batch,
            "index_rows": idx_rows_s,
            "original_index_files_byte_stable": index_stable,
        }
    )
    report["streams"]["crawl_dedup"] = meta
    ok &= cd_match and meta["restarted"] and cross_batch > 0

    # ---------- 4. composed ANN ingestion (dedup -> featurize -> IVF) ----------
    # Reuses stream 3's 20 crawl batches: each batch is deduped against
    # the growing index, survivors are hash-featurized and upserted
    # into the cell-partitioned IVF index. Kill/restart mid-run; the
    # final IVF index must equal the sequential batch replay's.
    from pyspark.sql import Window as _W2

    from mapreduce_project_spark.operators.text import hashed_doc_vectors
    from mapreduce_project_spark.streaming.events import (
        _ann_ingest_batch,
        ann_ingest_stream,
        read_ivf_tree,
    )

    DIM = 32

    def dense(df):
        sparse = hashed_doc_vectors(df, "doc_id", "text", DIM)
        return (
            sparse.groupBy("doc_id")
            .agg(F.map_from_arrays(F.collect_list("dim"), F.collect_list("val")).alias("m"))
            .select(
                "doc_id",
                F.expr(
                    f"transform(sequence(0, {DIM - 1}), "
                    "d -> coalesce(element_at(m, cast(d as bigint)), cast(0.0 as double)))"
                ).alias("embedding"),
            )
        )

    cents = dense(corpus.orderBy("doc_id").limit(8)).select(
        (F.row_number().over(_W2.orderBy("doc_id")) - 1).alias("cid"),
        F.col("embedding").alias("cv"),
    )
    ai_idx_s = os.path.join(work, "ai_idx_stream")
    ai_idx_b = os.path.join(work, "ai_idx_batch")
    sig.write.parquet(ai_idx_s)
    sig.write.parquet(ai_idx_b)
    ai_pairs_s = os.path.join(work, "ai_pairs_stream")
    ai_pairs_b = os.path.join(work, "ai_pairs_batch")
    ai_ivf_s = os.path.join(work, "ai_ivf_stream")
    ai_ivf_b = os.path.join(work, "ai_ivf_batch")
    ai_ck = os.path.join(work, "ai_ck")

    def make_ai():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(crawl_src + "/*/")
        )
        return ann_ingest_stream(
            spark, stream, ai_idx_s, ai_pairs_s, ai_ivf_s, ai_ck, cents, dim=DIM
        )

    meta = drive_with_kill(make_ai, "ann_ingest_stream")
    # same observed-grouping replay as the crawl section (the dedup
    # step signs the FULL batch, so its index dirs record the stream's
    # actual batch membership)
    for bid, ids in observed_groups(ai_idx_s):
        bdf = spark.createDataFrame(
            [(i, crawl_text[i]) for i in ids], "doc_id long, text string"
        )
        _ann_ingest_batch(
            spark, bdf, bid, ai_idx_b, ai_pairs_b, ai_ivf_b, cents, dim=DIM
        )

    def ivf_state(path):
        return {
            (r["id"], r["cell"], tuple(r["v"]))
            for r in read_ivf_tree(spark, path).collect()
        }

    vs, vb = ivf_state(ai_ivf_s), ivf_state(ai_ivf_b)
    ai_pairs_eq = pair_set(ai_pairs_s) == pair_set(ai_pairs_b)
    ai_match = vs == vb and bool(vs) and ai_pairs_eq
    meta.update(
        {
            "ivf_rows": len(vs),
            "ivf_vs_batch_replay_equal": vs == vb,
            "pairs_vs_batch_replay_equal": ai_pairs_eq,
        }
    )
    report["streams"]["ann_ingest"] = meta
    ok &= ai_match and meta["restarted"]

    # ---------- 8. watermark-sizing monitor (D272) ----------
    from mapreduce_project_spark.streaming.events import watermark_stream

    wm_src = os.path.join(work, "wmsrc")
    os.makedirs(wm_src)
    wm_slices = []
    # event_id is REASSIGNED as a global arrival counter across slices:
    # the monitor's semantics are a function of arrival order (it sorts
    # each micro-batch by event_id), and availableNow is entitled to
    # merge adjacent files into one trigger on a restart — sequential
    # ids make the processing trajectory invariant to wherever the
    # engine places batch boundaries (one observed 19-trigger run
    # diverged from the 20-slice replay for exactly this reason).
    _wm_seq = 0
    for i in range(N_BATCHES):
        sl = (
            spark.read.parquet(os.path.join(ev_src, f"b{i:02d}.parquet"))
            .select("event_id", "event_type", F.unix_micros("ts").alias("us"))
        )
        rows = sorted(
            ((r["event_id"], r["event_type"], r["us"]) for r in sl.collect()),
        )
        if not rows:
            continue
        rows = [
            (_wm_seq + j, et, us) for j, (_eid, et, us) in enumerate(rows)
        ]
        _wm_seq += len(rows)
        wm_slices.append(rows)
        spark.createDataFrame(
            rows, "event_id long, event_type string, us long"
        ).coalesce(1).write.parquet(os.path.join(wm_src, f"b{i:02d}.parquet"))
        stamp_batch_dir(os.path.join(wm_src, f"b{i:02d}.parquet"), i)
    wm_out, wm_ck = os.path.join(work, "wm_out"), os.path.join(work, "wm_ck")

    def make_wm():
        stream = (
            spark.readStream.schema("event_id long, event_type string, us long")
            .option("maxFilesPerTrigger", 1)
            .parquet(wm_src + "/*/")
        )
        return (
            watermark_stream(stream)
            .writeStream.format("parquet")
            .option("path", wm_out)
            .option("checkpointLocation", wm_ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    meta = drive_with_kill(make_wm, "watermark_stream")
    got_wm = {
        (
            r["event_type"], r["n_events"], r["on_time_ppm"],
            r["p50_100x"], r["p95_100x"], r["p99_100x"], r["max_late_s"],
        )
        for r in spark.read.parquet(wm_out).collect()
    }

    def wm_pct(items, n, p):
        idx100 = (n - 1) * p
        lo, frac = divmod(idx100, 100)
        flat_lo = flat_hi = items[-1][0]
        seen = 0
        for val, cnt in items:
            if seen + cnt > lo:
                flat_lo = val
                flat_hi = val if seen + cnt > lo + 1 else None
                break
            seen += cnt
        if flat_hi is None:
            seen2 = 0
            for val, cnt in items:
                if seen2 + cnt > lo + 1:
                    flat_hi = val
                    break
                seen2 += cnt
            else:
                flat_hi = flat_lo
        return flat_lo * 100 + (flat_hi - flat_lo) * (frac if frac else 0)

    # Boundary-agnostic prefix oracle: a type's reading after its n-th
    # event is a pure function of the global arrival prefix ending at
    # that event (later other-type events only move rm, which cannot
    # retroactively change this type's recorded lateness values) — so
    # EVERY emitted generation must appear in the per-event prefix map,
    # whatever batch boundaries the engine chose, and each type's
    # final generation must be the full-corpus one.
    want_map: dict = {}
    finals: dict = {}
    rm = -(1 << 62)
    hists: dict = {}
    wmaxs: dict = {}
    for chunk in wm_slices:
        for _eid, et, us in chunk:
            us = int(us)
            rm = max(rm, us)
            late = (rm - us) // 1000000
            h = hists.setdefault(et, {})
            b = min(late, 86400)
            h[b] = h.get(b, 0) + 1
            wmaxs[et] = max(wmaxs.get(et, 0), late)
            items = sorted(h.items())
            n = sum(c for _, c in items)
            gen = (
                et, n, h.get(0, 0) * 1000000 // n,
                wm_pct(items, n, 50), wm_pct(items, n, 95),
                wm_pct(items, n, 99), wmaxs[et],
            )
            want_map[(et, n)] = gen
            finals[et] = gen
    wm_match = (
        bool(got_wm)
        and all(r == want_map.get((r[0], r[1])) for r in got_wm)
        and all(
            max((r for r in got_wm if r[0] == et), key=lambda r: r[1]) == fin
            for et, fin in finals.items()
        )
    )
    meta.update({"rows": len(got_wm), "match_vs_replay": wm_match})
    report["streams"]["watermark"] = meta
    ok &= wm_match and meta["restarted"]

    # ---------- 9. causal burst alarm (D282) ----------
    import math

    from mapreduce_project_spark.streaming.events import burst_stream

    bu_src = os.path.join(work, "busrc")
    os.makedirs(bu_src)
    bu_l0 = max(
        1,
        sum(int(r["y"]) for r in tdaily) * 1000000
        // max(1, len(tdaily)),
    )
    bu_tr = round(math.log(max(2, len(tdaily))) * 1000000)
    for i in range(ho_batches):
        chunk = [r for r in tdaily if day_of_batch[r["d"]] == i]
        if not chunk:
            continue
        spark.createDataFrame(
            [(r["series"], r["d"], r["y"]) for r in chunk],
            "series string, d long, y long",
        ).coalesce(1).write.parquet(os.path.join(bu_src, f"b{i:02d}.parquet"))
        stamp_batch_dir(os.path.join(bu_src, f"b{i:02d}.parquet"), i)
    bu_out, bu_ck = os.path.join(work, "bu_out"), os.path.join(work, "bu_ck")

    def make_bu():
        stream = (
            spark.readStream.schema("series string, d long, y long")
            .option("maxFilesPerTrigger", 1)
            .parquet(bu_src + "/*/")
        )
        return (
            burst_stream(stream, bu_l0, bu_tr)
            .writeStream.format("parquet")
            .option("path", bu_out)
            .option("checkpointLocation", bu_ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    meta = drive_with_kill(make_bu, "burst_stream")
    got_bu = {
        (r["series"], r["d"], r["y"], r["d0"], r["d1"], r["in_burst"])
        for r in spark.read.parquet(bu_out).collect()
    }
    bc0 = round(math.log(bu_l0) * 1000000) - 13815511
    bc1 = round(math.log(3 * bu_l0) * 1000000) - 13815511
    want_bu = set()
    bstate: dict = {}
    for r in tdaily:
        s, d, y = r["series"], int(r["d"]), int(r["y"])
        f0 = bu_l0 - y * bc0
        f1 = 3 * bu_l0 - y * bc1
        if s not in bstate:
            f1 += bu_tr
        else:
            pd0, pd1 = bstate[s]
            f0 += min(pd0, pd1)
            f1 += min(pd0 + bu_tr, pd1)
        m = min(f0, f1)
        bstate[s] = (f0 - m, f1 - m)
        want_bu.add(
            (s, d, y, bstate[s][0], bstate[s][1],
             1 if bstate[s][1] < bstate[s][0] else 0)
        )
    bu_match = got_bu == want_bu and bool(got_bu)
    meta.update({"rows": len(got_bu), "match_vs_replay": bu_match})
    report["streams"]["burst"] = meta
    ok &= bu_match and meta["restarted"]

    # ---------- 10. PSI drift monitor (D261) ----------
    # the last state-class stream without kill/restart evidence
    # (VERDICT r10 task 4): frozen reference deciles/bins from the FULL
    # value distribution (the model-artifact deployment shape), current
    # counts accumulating in state; every per-batch reading must equal
    # the sequential prefix replay bit-for-bit across the kill.
    from mapreduce_project_spark.streaming.events import psi_stream

    ps_src = os.path.join(work, "pssrc")
    os.makedirs(ps_src)
    ps_slices = []
    for i in range(N_BATCHES):
        sl = spark.read.parquet(os.path.join(ev_src, f"b{i:02d}.parquet")).selectExpr(
            "event_type AS series",
            "cast(floor(value * 100.0 + 0.5) AS bigint) AS cents",
        )
        rows = sorted((r["series"], int(r["cents"])) for r in sl.collect())
        if not rows:
            continue
        ps_slices.append(rows)
        spark.createDataFrame(rows, "series string, cents long").coalesce(
            1
        ).write.parquet(os.path.join(ps_src, f"b{i:02d}.parquet"))
        stamp_batch_dir(os.path.join(ps_src, f"b{i:02d}.parquet"), i)

    all_cents = sorted(c for chunk in ps_slices for _s, c in chunk)
    ps_edges = [all_cents[(len(all_cents) - 1) * d // 10] for d in range(1, 10)]
    ps_ref = [0] * 10
    for c in all_cents:
        ps_ref[sum(1 for e in ps_edges if e < c)] += 1
    ps_out, ps_ck = os.path.join(work, "ps_out"), os.path.join(work, "ps_ck")

    def make_ps():
        stream = (
            spark.readStream.schema("series string, cents long")
            .option("maxFilesPerTrigger", 1)
            .parquet(ps_src + "/*/")
        )
        return (
            psi_stream(stream, ps_edges, ps_ref)
            .writeStream.format("parquet")
            .option("path", ps_out)
            .option("checkpointLocation", ps_ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    meta = drive_with_kill(make_ps, "psi_stream")
    got_ps = {
        (r["series"], r["n_cur"], r["bins"], r["psi_micro"])
        for r in spark.read.parquet(ps_out).collect()
    }

    def _lnu(x: int) -> int:
        return round(math.log(x) * 1000000)

    ps_na10 = sum(ps_ref) + 10
    # Boundary-agnostic prefix oracle (the watermark section's round-12
    # pattern): a series' reading after its n-th row is a pure function
    # of that prefix, so every emission must appear in the per-row
    # prefix map and each series' max-n emission must be the full one —
    # valid for WHATEVER batch boundaries availableNow chose.
    ps_map: dict = {}
    ps_final: dict = {}
    ps_counts: dict = {}
    for chunk in ps_slices:
        for s, c in chunk:
            cs = ps_counts.setdefault(s, [0] * 10)
            cs[sum(1 for e in ps_edges if e < c)] += 1
            nb10 = sum(cs) + 10
            psi = 0
            for ca, cb in zip(ps_ref, cs):
                pa = (ca + 1) * 1000000 // ps_na10
                pb = (cb + 1) * 1000000 // nb10
                term = _lnu(ca + 1) - _lnu(ps_na10) - _lnu(cb + 1) + _lnu(nb10)
                raw = (pa - pb) * term
                psi += raw // 1000000 if raw >= 0 else -((-raw) // 1000000)
            gen = (s, sum(cs), ",".join(map(str, cs)), psi)
            ps_map[(s, sum(cs))] = gen
            ps_final[s] = gen
    ps_match = (
        bool(got_ps)
        and all(r == ps_map.get((r[0], r[1])) for r in got_ps)
        and all(
            max((r for r in got_ps if r[0] == s), key=lambda r: r[1]) == fin
            for s, fin in ps_final.items()
        )
    )
    meta.update({"rows": len(got_ps), "match_vs_replay": ps_match})
    report["streams"]["psi"] = meta
    ok &= ps_match and meta["restarted"]

    # ---------- 12. cross-batch transitions (applyInPandasWithState) ----------
    # The carrier of real per-user state the round-11 verdict named as
    # the top missing soak row: last-event-type state spans batches, so
    # a kill must neither drop nor duplicate a boundary transition.
    from mapreduce_project_spark.queries_registry import ALL_QUERIES
    from mapreduce_project_spark.streaming.events import transition_stream

    tr_out, tr_ck = os.path.join(work, "tr_out"), os.path.join(work, "tr_ck")

    def make_tr():
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(ev_src + "/*/")
        )
        return (
            transition_stream(stream)
            .writeStream.format("parquet")
            .option("path", tr_out)
            .option("checkpointLocation", tr_ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    meta = drive_with_kill(make_tr, "transition_stream")
    got_tr = {
        (r["event_type"], r["next_type"]): r["n"]
        for r in spark.read.parquet(tr_out)
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .collect()
    }
    want_tr = {
        (r["event_type"], r["next_type"]): r["n"]
        for r in ALL_QUERIES["event_transition_matrix"](spark, SF_DIR).collect()
    }
    tr_match = got_tr == want_tr and bool(got_tr)
    meta.update({"cells": len(got_tr), "match_vs_batch": tr_match})
    report["streams"]["transitions"] = meta
    ok &= tr_match and meta["restarted"]

    # ---------- 13. per-user EWMA (carried integer state) ----------
    from mapreduce_project_spark.operators.windows import ewma_fixed
    from mapreduce_project_spark.streaming.events import ewma_stream

    ew_out, ew_ck = os.path.join(work, "ew_out"), os.path.join(work, "ew_ck")

    def make_ew():
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(ev_src + "/*/")
            .select(
                "event_id", "user_id", "ts",
                F.floor(F.col("value") * 100 + F.lit(0.5))
                .cast("bigint").alias("x"),
            )
        )
        return (
            ewma_stream(stream)
            .writeStream.format("parquet")
            .option("path", ew_out)
            .option("checkpointLocation", ew_ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    meta = drive_with_kill(make_ew, "ewma_stream")
    got_ew = {
        (r["user_id"], r["ts"], r["x"], r["ewma_fx"])
        for r in spark.read.parquet(ew_out).collect()
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
    ew_match = got_ew == want_ew and bool(got_ew)
    meta.update({"rows": len(got_ew), "match_vs_batch": ew_match})
    report["streams"]["ewma"] = meta
    ok &= ew_match and meta["restarted"]

    # ---------- 14. running per-user totals (applyInPandasWithState) ----------
    from mapreduce_project_spark.streaming.events import (
        running_user_totals_stream,
    )

    rt_out, rt_ck = os.path.join(work, "rt_out"), os.path.join(work, "rt_ck")
    os.makedirs(rt_out)

    # the operator emits in UPDATE mode (applyInPandasWithState), which
    # the parquet sink cannot take — land each trigger's updated rows
    # in a batch-scoped dir (overwrite ⇒ replay-idempotent)
    def rt_sink(bdf, bid):
        bdf.write.mode("overwrite").parquet(
            os.path.join(rt_out, f"batch-{bid}")
        )

    def make_rt():
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(ev_src + "/*/")
        )
        return (
            running_user_totals_stream(stream)
            .writeStream.foreachBatch(rt_sink)
            .option("checkpointLocation", rt_ck)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )

    meta = drive_with_kill(make_rt, "running_user_totals_stream")
    rt_rows = (
        spark.read.option("recursiveFileLookup", "true").parquet(rt_out).collect()
    )
    rt_final: dict = {}
    for r in rt_rows:  # the per-user count is monotone: max = final
        cur = rt_final.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            rt_final[r["user_id"]] = (r["n_events"], round(r["total_value"], 6))
    want_rt = {
        r["user_id"]: (r["n"], round(r["tv"], 6))
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    rt_match = rt_final == want_rt and bool(rt_final)
    meta.update({"users": len(rt_final), "match_vs_batch": rt_match})
    report["streams"]["running_user_totals"] = meta
    ok &= rt_match and meta["restarted"]

    # ---------- 15/16. streaming dedup, both variants ----------
    # Exact global-distinct parity requires the watermark to exceed the
    # corpus's event-time span (otherwise eviction legitimately
    # re-admits a key recurring later — production tunes the delay to
    # its real lateness bound); the soak pins the parity configuration.
    from mapreduce_project_spark.streaming.events import (
        dedup_stream,
        dedup_within_watermark_stream,
    )

    for nm, fn in (
        ("dedup", dedup_stream),
        ("dedup_within_watermark", dedup_within_watermark_stream),
    ):
        dd_out = os.path.join(work, f"{nm}_out")
        dd_ck = os.path.join(work, f"{nm}_ck")

        def make_dd(fn=fn, dd_out=dd_out, dd_ck=dd_ck):
            stream = (
                spark.readStream.schema(ev.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(ev_src + "/*/")
            )
            return (
                fn(stream, ["user_id", "event_type"], watermark="87600 hours")
                .writeStream.format("parquet")
                .option("path", dd_out)
                .option("checkpointLocation", dd_ck)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )

        meta = drive_with_kill(make_dd, f"{nm}_stream")
        got_dd = {
            (r["user_id"], r["event_type"])
            for r in spark.read.parquet(dd_out)
            .select("user_id", "event_type")
            .collect()
        }
        n_out = spark.read.parquet(dd_out).count()
        want_dd = {
            (r["user_id"], r["event_type"])
            for r in ev.select("user_id", "event_type").distinct().collect()
        }
        # set equality AND row count: a replayed duplicate would keep
        # the set identical but inflate the emitted row count
        dd_match = got_dd == want_dd and n_out == len(want_dd) and bool(got_dd)
        meta.update(
            {"keys": len(got_dd), "rows_emitted": n_out, "match_vs_batch": dd_match}
        )
        report["streams"][nm] = meta
        ok &= dd_match and meta["restarted"]

    # ---------- 17. session windows (native session_window state) ----------
    # complete-mode aggregation through a batch-scoped foreachBatch
    # sink (parquet sinks cannot take complete mode; the memory sink
    # cannot recover a checkpoint): each trigger overwrites its own
    # batch-<id> dir with the FULL result, the max-id dir is the final
    # answer, and a replayed trigger is idempotent by construction.
    from mapreduce_project_spark.operators.events import session_window_agg
    from mapreduce_project_spark.streaming.events import session_stream

    ss_out, ss_ck = os.path.join(work, "ss_out"), os.path.join(work, "ss_ck")

    def write_complete(out_dir):
        def h(bdf, bid):
            bdf.write.mode("overwrite").parquet(
                os.path.join(out_dir, f"batch-{bid}")
            )

        return h

    def make_ss():
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(ev_src + "/*/")
        )
        return (
            session_stream(stream)
            .writeStream.foreachBatch(write_complete(ss_out))
            .option("checkpointLocation", ss_ck)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )

    meta = drive_with_kill(make_ss, "session_stream")
    last = max(
        (d for d in os.listdir(ss_out) if d.startswith("batch-")),
        key=lambda d: int(d.split("-")[1]),
    )
    got_ss = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in spark.read.parquet(os.path.join(ss_out, last)).collect()
    }
    want_ss = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in session_window_agg(
            ev, "ts", "30 minutes", ["user_id"], n_events=F.count(F.lit(1))
        ).collect()
    }
    ss_match = got_ss == want_ss and bool(got_ss)
    meta.update({"sessions": len(got_ss), "match_vs_batch": ss_match})
    report["streams"]["sessions"] = meta
    ok &= ss_match and meta["restarted"]

    # ---------- 18. conformal-coverage monitor (D297) ----------
    # Frozen (pred, qhat) from the batch D293 fit; the stream's running
    # per-type coverage must equal the closed-form prefix replay at
    # every emission across the kill/restart.
    from mapreduce_project_spark.streaming.events import conformal_stream

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
        sl = spark.read.parquet(os.path.join(ev_src, f"b{i:02d}.parquet")).selectExpr(
            "event_type",
            "cast(floor(value * 100.0 + 0.5) AS bigint) AS cents",
        )
        rows_cf = sorted((r["event_type"], int(r["cents"])) for r in sl.collect())
        if not rows_cf:
            continue
        cf_slices.append(rows_cf)
        spark.createDataFrame(rows_cf, "event_type string, cents long").coalesce(
            1
        ).write.parquet(os.path.join(cf_src, f"b{i:02d}.parquet"))
        stamp_batch_dir(os.path.join(cf_src, f"b{i:02d}.parquet"), i)
    cf_out, cf_ck = os.path.join(work, "cf_out"), os.path.join(work, "cf_ck")

    def make_cf():
        stream = (
            spark.readStream.schema("event_type string, cents long")
            .option("maxFilesPerTrigger", 1)
            .parquet(cf_src + "/*/")
        )
        return (
            conformal_stream(stream, conf_params)
            .writeStream.format("parquet")
            .option("path", cf_out)
            .option("checkpointLocation", cf_ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    meta = drive_with_kill(make_cf, "conformal_stream")
    got_cf = {
        (r["event_type"], r["n_seen"], r["n_covered"], r["coverage_ppm"],
         r["alarm"])
        for r in spark.read.parquet(cf_out).collect()
    }
    # boundary-agnostic prefix oracle (same pattern as psi/watermark)
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
    cf_match = (
        bool(got_cf)
        and all(r == cf_map.get((r[0], r[1])) for r in got_cf)
        and all(
            max((r for r in got_cf if r[0] == t2), key=lambda r: r[1]) == fin
            for t2, fin in cf_final.items()
        )
    )
    meta.update({"rows": len(got_cf), "match_vs_replay": cf_match})
    report["streams"]["conformal"] = meta
    ok &= cf_match and meta["restarted"]

    # ---------- 19. tumbling windowed aggregation ----------
    # complete-mode through the batch-scoped foreachBatch sink (same
    # contract as sessions): final full result == the batch twin.
    from mapreduce_project_spark.operators.events import tumbling_window_agg
    from mapreduce_project_spark.streaming.events import tumbling_counts_stream

    # NOTE: path names must be unique per section — the TWAP section
    # owns work/tw_out + work/tw_ck, and a second query pointed at the
    # same checkpoint dir resumes it (same source pattern, every file
    # already committed -> ZERO triggers; caught in round 12).
    tb_out, tb_ck = os.path.join(work, "tb_out"), os.path.join(work, "tb_ck")

    def make_tw():
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(ev_src + "/*/")
        )
        return (
            tumbling_counts_stream(stream)
            .writeStream.foreachBatch(write_complete(tb_out))
            .option("checkpointLocation", tb_ck)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )

    meta = drive_with_kill(make_tw, "tumbling_counts_stream")
    last_tw = max(
        (d for d in os.listdir(tb_out) if d.startswith("batch-")),
        key=lambda d: int(d.split("-")[1]),
    )
    got_tw = {
        (r["window_start"], r["event_type"], r["n_events"],
         round(r["sum_value"], 6))
        for r in spark.read.parquet(os.path.join(tb_out, last_tw)).collect()
    }
    want_tw = {
        (r["window_start"], r["event_type"], r["n_events"],
         round(r["sum_value"], 6))
        for r in tumbling_window_agg(
            ev, "ts", "1 hour", ["event_type"],
            n_events=F.count(F.lit(1)), sum_value=F.sum("value"),
        ).collect()
    }
    tw_match = got_tw == want_tw and bool(got_tw)
    meta.update({"windows": len(got_tw), "match_vs_batch": tw_match})
    report["streams"]["tumbling"] = meta
    ok &= tw_match and meta["restarted"]

    # ---------- 20. stream-static broadcast join ----------
    from mapreduce_project_spark.streaming.events import stream_static_join

    sj_dim = spark.createDataFrame(
        [("click", "engagement"), ("view", "engagement"),
         ("purchase", "revenue"), ("signup", "growth"), ("error", "ops")],
        "event_type string, category string",
    )
    sj_out, sj_ck = os.path.join(work, "sj_out"), os.path.join(work, "sj_ck")

    def make_sj():
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(ev_src + "/*/")
        )
        return (
            stream_static_join(stream, sj_dim, "event_type")
            .select("event_id", "category")
            .writeStream.format("parquet")
            .option("path", sj_out)
            .option("checkpointLocation", sj_ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    meta = drive_with_kill(make_sj, "stream_static_join")
    sj_rows = spark.read.parquet(sj_out).collect()
    got_sj = {(r["event_id"], r["category"]) for r in sj_rows}
    want_sj = {
        (r["event_id"], r["category"])
        for r in ev.join(sj_dim, "event_type").select("event_id", "category")
        .collect()
    }
    # set AND count: a replayed batch leaking past the sink's metadata
    # log would duplicate rows without changing the set
    sj_match = (
        got_sj == want_sj and len(sj_rows) == len(want_sj) and bool(got_sj)
    )
    meta.update({"rows": len(sj_rows), "match_vs_batch": sj_match})
    report["streams"]["stream_static_join"] = meta
    ok &= sj_match and meta["restarted"]

    # ---------- 21. stream-stream LEFT OUTER interval join ----------
    # The last unsoaked operator: both sides buffered + watermarked,
    # outer rows emitted only once the watermark clears their window.
    # Outer results for left rows inside the final watermark delay are
    # NEVER emitted by a terminating availableNow run (measured: the
    # last 2 h of purchases, 64 rows at sf0.1, stayed buffered), so a
    # far-future SENTINEL event per side advances the watermark past
    # every real event before termination; sentinels are excluded from
    # both sides of the comparison. This section must stay LAST: the
    # sentinel file lands in the shared ev_src AFTER every other
    # section has consumed it.
    from mapreduce_project_spark.streaming.events import (
        stream_stream_interval_join,
    )

    SENT_ID = 1_000_000_000
    max_us = ev.selectExpr("max(unix_micros(ts))").collect()[0][0]
    sent = spark.createDataFrame(
        [
            (SENT_ID, "purchase"),
            (SENT_ID + 1, "view"),
        ],
        "event_id long, event_type string",
    ).selectExpr(
        "event_id",
        f"timestamp_micros({max_us} + 86400000000L) AS ts",
        "cast(-1 as long) AS user_id",
        "event_type",
        "cast(0.0 as double) AS value",
        "cast(null as string) AS props",
    ).select(*ev.columns)
    sent.coalesce(1).write.parquet(os.path.join(ev_src, "b20.parquet"))
    stamp_batch_dir(os.path.join(ev_src, "b20.parquet"), N_BATCHES)

    ij_out, ij_ck = os.path.join(work, "ij_out"), os.path.join(work, "ij_ck")

    def make_ij():
        def side(t):
            return (
                spark.readStream.schema(ev.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(ev_src + "/*/")
                .filter(F.col("event_type") == t)
            )

        return (
            stream_stream_interval_join(
                side("purchase"), side("view"), how="left_outer"
            )
            .select("l_event_id", "r_event_id")
            .writeStream.format("parquet")
            .option("path", ij_out)
            .option("checkpointLocation", ij_ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    meta = drive_with_kill(make_ij, "stream_stream_interval_join")
    got_ij = {
        (r["l_event_id"], r["r_event_id"])
        for r in spark.read.parquet(ij_out).collect()
        if r["l_event_id"] < SENT_ID
    }
    bp = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("l_event_id"),
        F.col("ts").alias("l_ts"),
    )
    bv = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("r_key"),
        F.col("event_id").alias("r_event_id"), F.col("ts").alias("r_ts"),
    )
    want_ij = {
        (r["l_event_id"], r["r_event_id"])
        for r in bp.join(
            bv,
            (F.col("user_id") == F.col("r_key"))
            & (F.col("r_ts") >= F.col("l_ts") - F.expr("INTERVAL 1 hour"))
            & (F.col("r_ts") <= F.col("l_ts")),
            "left_outer",
        ).collect()
    }
    ij_match = got_ij == want_ij and bool(got_ij)
    ij_outer = sum(1 for _l, r in got_ij if r is None)
    meta.update(
        {"rows": len(got_ij), "outer_rows": ij_outer, "match_vs_batch": ij_match}
    )
    report["streams"]["stream_stream_interval_join"] = meta
    ok &= ij_match and meta["restarted"] and ij_outer > 0

    report["all_green"] = bool(ok)
    with open(OUT, "w") as fh:
        json.dump(report, fh, indent=2)
    print(json.dumps(report))
    shutil.rmtree(work, ignore_errors=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
