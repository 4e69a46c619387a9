"""Round-13 operator tests.

Centerpiece: the zombie-attempt write fence (VERDICT r12 task 1).
`StreamingQuery.stop()` interrupts the JVM micro-batch thread but a
Python foreachBatch callback already executing keeps running on the
Py4J callback-server thread — so a same-process restart can re-run a
batch (possibly with re-grouped source files) while the superseded
attempt's late writes clobber the live run's directories. These tests
reproduce that interleaving DETERMINISTICALLY (a blocking injector
stands in for the load-dependent scheduling the r12 soak hit once in
~20 runs) and pin both halves: the unfenced choreography corrupts the
state, the fenced one refuses the stale write and stays consistent.
"""

import os
import threading

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _mk_batches(spark):
    from mapreduce_project_spark.sources import load_table

    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(12)
        .collect()
    )
    corpus = [(r["doc_id"], r["text"]) for r in docs[:4]]
    f0 = [(1_000_000 + r["doc_id"], r["text"]) for r in docs[4:6]]
    # f1 contains a copy of a corpus doc (a cross-index pair must exist)
    f1 = [(2_000_000 + r["doc_id"], r["text"]) for r in docs[6:8]]
    f1.append((3_000_000, corpus[0][1]))
    f2 = [(4_000_000 + r["doc_id"], r["text"]) for r in docs[8:10]]
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    return mk(corpus), mk(f0), mk(f1), mk(f2)


def _tree_state(spark, idx, pairs):
    from mapreduce_project_spark.streaming.events import read_signature_tree

    ps = {
        (r["new_id"], r["index_id"], round(r["jac"], 9))
        for r in read_signature_tree(spark, pairs).collect()
    }
    ids = {r["id"] for r in read_signature_tree(spark, idx).collect()}
    return ps, ids


def _zombie_choreography(spark, tmp_path, fenced: bool):
    """batch 0 commits; a gen-1 attempt of batch 1 (file f1 only) writes
    its pairs then stalls before the signature write; the 'restarted'
    gen-2 query re-runs batch 1 with COALESCED files {f1, f2}; the
    zombie then wakes and tries its stale signature write."""
    from mapreduce_project_spark.operators.dedup import minhash_index_build
    from mapreduce_project_spark.streaming.events import (
        StaleAttemptError,
        _crawl_dedup_batch,
        _fence_register,
    )

    corpus, f0, f1, f2 = _mk_batches(spark)
    base = str(tmp_path / ("fenced" if fenced else "raw"))
    idx, pairs, ck = f"{base}/idx", f"{base}/pairs", f"{base}/ck"
    minhash_index_build(corpus, "doc_id", "text", 3, 64).write.parquet(idx)

    gen1 = _fence_register(ck) if fenced else None
    _crawl_dedup_batch(spark, f0, 0, idx, pairs, fence_token=gen1)

    stall = threading.Event()
    release = threading.Event()
    zombie_err: list = []

    def injector(point, batch_id):
        if point == "after_pairs" and batch_id == 1:
            stall.set()
            assert release.wait(120), "choreography deadlock"

    def zombie():
        try:
            _crawl_dedup_batch(
                spark, f1, 1, idx, pairs,
                fault_injector=injector, fence_token=gen1,
            )
        except BaseException as e:  # noqa: BLE001 — recorded for assertion
            zombie_err.append(e)

    zt = threading.Thread(target=zombie)
    zt.start()
    assert stall.wait(120), "zombie never reached after_pairs"

    # the "restart": a new query generation re-runs batch 1, and the
    # file source legally coalesced f1+f2 into the one trigger
    gen2 = _fence_register(ck) if fenced else None
    coalesced = f1.unionAll(f2)
    _crawl_dedup_batch(spark, coalesced, 1, idx, pairs, fence_token=gen2)

    release.set()
    zt.join(120)
    assert not zt.is_alive()

    # the consistent reference: same boundaries, no zombie
    ref = str(tmp_path / ("ref_f" if fenced else "ref_r"))
    ridx, rpairs = f"{ref}/idx", f"{ref}/pairs"
    minhash_index_build(corpus, "doc_id", "text", 3, 64).write.parquet(ridx)
    _crawl_dedup_batch(spark, f0, 0, ridx, rpairs)
    _crawl_dedup_batch(spark, coalesced, 1, ridx, rpairs)

    got = _tree_state(spark, idx, pairs)
    want = _tree_state(spark, ridx, rpairs)
    return got, want, zombie_err, StaleAttemptError


def test_unfenced_zombie_write_corrupts_state(spark, tmp_path):
    # the planted bug: without fencing, the stale signature write lands
    # AFTER the restarted run's and the trees go inconsistent (f2's
    # signatures vanish from the index) — this is the r12 soak failure,
    # reproduced deterministically.
    got, want, zombie_err, _ = _zombie_choreography(spark, tmp_path, fenced=False)
    assert not zombie_err  # unfenced zombie completes "successfully"
    assert got != want
    assert not {i for i in want[1] if i >= 4_000_000} <= got[1]


def test_fence_refuses_stale_write_and_state_stays_consistent(spark, tmp_path):
    got, want, zombie_err, StaleAttemptError = _zombie_choreography(
        spark, tmp_path, fenced=True
    )
    assert len(zombie_err) == 1 and isinstance(zombie_err[0], StaleAttemptError)
    assert got == want
    assert got[0], "vacuous: no pairs found"


def test_fence_generations_are_monotonic_per_checkpoint(tmp_path):
    from mapreduce_project_spark.streaming.events import _fence_register

    ck_a, ck_b = str(tmp_path / "a"), str(tmp_path / "b")
    k1, g1 = _fence_register(ck_a)
    k2, g2 = _fence_register(ck_a)
    k3, g3 = _fence_register(ck_b)
    assert k1 == k2 and g2 == g1 + 1
    assert k3 != k1 and g3 >= 1


def test_fenced_write_noop_without_token(spark, tmp_path):
    # production path (no same-process restarts): token None must be a
    # pass-through, not a hidden global lock
    from mapreduce_project_spark.streaming.events import _fenced_write

    hit = []
    _fenced_write(None, "x", lambda: hit.append(1))
    assert hit == [1]
