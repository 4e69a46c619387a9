"""Property-based tests (hypothesis) — invariants the example-based
suites can't sweep: partitioning-invariance of results, facade vs
native equivalence on arbitrary inputs, salted-join equivalence for
arbitrary salt counts, union-find ground truth for connected
components, and packing/split invariants.

The reference ships no property testing (SURVEY.md §5); this layer is
the "results must not depend on physical execution" guarantee that
matters at 100 TB, where partition counts differ from every test run.

Examples are kept small (Spark job latency dominates, not data size)
and deadlines disabled — a local[8] job takes ~0.5 s, far above
hypothesis's default 200 ms deadline.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# (key, value) rows with repeated keys, including negatives and empties
kv_rows = st.lists(
    st.tuples(st.integers(0, 9), st.integers(-100, 100)), min_size=1, max_size=40
)
# undirected edge lists over a small id space (dups + self-loops allowed)
edge_lists = st.lists(
    st.tuples(st.integers(0, 14), st.integers(0, 14)), min_size=1, max_size=30
)


@given(rows=kv_rows, parts=st.integers(1, 5))
@settings(**SETTINGS)
def test_grouped_agg_partition_invariance(spark, rows, parts):
    """Sums/counts per key are identical under any repartitioning —
    the map-side-combine + shuffle path may not depend on the physical
    split of the input."""
    df = spark.createDataFrame(rows, "k int, v int")
    base = {
        (r["k"], r["s"], r["c"])
        for r in df.groupBy("k").agg(F.sum("v").alias("s"), F.count("v").alias("c")).collect()
    }
    re = {
        (r["k"], r["s"], r["c"])
        for r in df.repartition(parts)
        .groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("v").alias("c"))
        .collect()
    }
    assert base == re


@given(rows=kv_rows, n_salt=st.integers(1, 6), how=st.sampled_from(["inner", "left"]))
@settings(**SETTINGS)
def test_salted_join_equals_plain_join(spark, rows, n_salt, how):
    """salted_join must be output-identical to the plain join for every
    salt count and supported how — including unmatched left rows and
    duplicate keys on both sides."""
    from mapreduce_project_spark.operators.join import salted_join

    left = spark.createDataFrame(rows, "k int, v int")
    right = spark.createDataFrame(
        [(k, k * 10) for k in range(0, 7)], "k int, w int"
    )
    plain = sorted(
        (r["k"], r["v"], r["w"]) for r in left.join(right, "k", how).collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["w"])
        for r in salted_join(left, right, "k", n_salt=n_salt, how=how).collect()
    )
    assert plain == salted


@given(edges=edge_lists)
@settings(**SETTINGS)
def test_connected_components_matches_union_find(spark, edges):
    """The distributed min-label propagation must agree with a plain
    union-find on every graph shape (chains, stars, cycles, self-loops,
    parallel edges)."""
    from mapreduce_project_spark.operators.dedup import connected_components

    # ground truth: union-find with min-id representative
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    truth = {x: find(x) for x in parent}

    df = spark.createDataFrame(edges, "id_a int, id_b int")
    got = {r["id"]: r["comp"] for r in connected_components(df).collect()}
    assert got == truth


@given(rows=kv_rows, parts=st.integers(1, 4))
@settings(**SETTINGS)
def test_facade_reduce_matches_native(spark, rows, parts):
    """The MapReduce facade's arbitrary reduce contract must agree with
    the native grouped aggregation for a sum job, for any reduce
    partition count (the reference's num_reducers knob)."""
    from mapreduce_project_spark.mapreduce import run_job

    df = spark.createDataFrame(rows, "key int, value int")
    native = {(r["key"], r["s"]) for r in df.groupBy("key").agg(F.sum("value").alias("s")).collect()}

    def map_fn(k, v):
        yield k, v

    def reduce_fn(k, values):
        yield k, sum(int(x) for x in values)

    out = run_job(spark, df, map_fn, reduce_fn, num_partitions=parts)
    got = {(int(r["key"]), int(r["value"])) for r in out.collect()}
    assert got == native


@given(budget=st.integers(1, 50), toks=st.lists(st.integers(0, 30), min_size=1, max_size=25))
@settings(**SETTINGS)
def test_pack_sequences_bin_invariants(spark, budget, toks):
    """Packing invariants for any budget and token-count sequence:
    bins are assigned by the exclusive running sum, so (a) bin ids are
    non-decreasing in doc order, (b) a doc's bin equals its exclusive
    prefix sum // budget."""
    from mapreduce_project_spark.operators.sampling import pack_sequences

    rows = [(i, "s", t) for i, t in enumerate(toks)]
    df = spark.createDataFrame(rows, "doc_id int, source string, n_tok int")
    out = sorted(
        (r["doc_id"], r["bin"]) for r in
        pack_sequences(df, "source", "doc_id", F.col("n_tok"), budget).collect()
    )
    prefix = 0
    expect = []
    for i, t in enumerate(toks):
        expect.append((i, prefix // budget))
        prefix += t
    assert out == expect


@given(frac=st.sampled_from([0.0625, 0.125, 0.25, 0.5]), subset=st.integers(1, 40))
@settings(**SETTINGS)
def test_hash_split_stability_under_corpus_growth(spark, frac, subset):
    """A doc's split assignment may depend only on its id — never on
    which other docs are present (corpus growth must not reshuffle
    existing splits)."""
    from mapreduce_project_spark.operators.sampling import hash_split

    full = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    part = full.filter(F.col("doc_id") < subset)
    full_map = {r["doc_id"]: r["split"] for r in hash_split(full, "doc_id", frac).collect()}
    part_map = {r["doc_id"]: r["split"] for r in hash_split(part, "doc_id", frac).collect()}
    assert all(full_map[k] == v for k, v in part_map.items())


@given(
    rates=st.dictionaries(
        st.sampled_from(["a", "b", "c"]),
        st.sampled_from([0.0, 0.25, 0.5, 0.9, 1.0]),
        min_size=1,
    ),
    n=st.integers(10, 60),
)
@settings(**SETTINGS)
def test_mix_sources_deterministic_and_growth_stable(spark, rates, n):
    # keep/drop is a pure function of (source, key): growing the corpus
    # never flips existing decisions, rate 1.0 keeps every row and 0.0
    # none, and two runs agree exactly
    from mapreduce_project_spark.operators.sampling import mix_sources

    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept1 = {r["doc_id"] for r in mix_sources(df, "doc_id", "source", rates).collect()}
    kept2 = {r["doc_id"] for r in mix_sources(df, "doc_id", "source", rates).collect()}
    assert kept1 == kept2
    for src, rate in rates.items():
        ids = {i for i, s in rows if s == src}
        if rate == 1.0:
            assert ids <= kept1
        elif rate == 0.0:
            assert not (ids & kept1)
    # growth stability: doubling the corpus leaves old decisions intact
    bigger = spark.createDataFrame(
        rows + [(i + 10_000, ["a", "b", "c"][i % 3]) for i in range(n)],
        "doc_id long, source string",
    )
    kept_big = {
        r["doc_id"] for r in mix_sources(bigger, "doc_id", "source", rates).collect()
    }
    assert {i for i in kept_big if i < 10_000} == kept1


_intervals = st.lists(
    st.tuples(
        st.integers(0, 3),          # key
        st.integers(0, 500_000),    # start offset seconds
        st.integers(0, 90_000),     # duration seconds
    ),
    min_size=1,
    max_size=12,
)


@given(a_rows=_intervals, b_rows=_intervals, bucket=st.sampled_from([3600, 7200]))
@settings(**SETTINGS)
def test_interval_join_equals_naive_overlap(spark, a_rows, b_rows, bucket):
    """interval_join (bucketized equi-join + refine + first-shared-
    bucket filter) must equal the naive quadratic overlap join for ANY
    interval sets, keys, and bucket width — each matching pair emitted
    EXACTLY once (the multiset check below catches any multi-bucket
    duplicate the filter failed to suppress)."""
    from mapreduce_project_spark.operators.join import interval_join

    def mk(rows, s, e, idc):
        data = [
            (k, f"2024-01-01 00:00:00", st_off, dur, i)
            for i, (k, st_off, dur) in enumerate(rows)
        ]
        df = spark.createDataFrame(
            data, f"k int, base string, off long, dur long, {idc} long"
        )
        return df.select(
            "k",
            F.expr("timestamp(base) + make_interval(0,0,0,0,0,0,off)").alias(s),
            F.expr("timestamp(base) + make_interval(0,0,0,0,0,0,off + dur)").alias(e),
            idc,
        )

    a = mk(a_rows, "s", "e", "aid")
    b = mk(b_rows, "s2", "e2", "bid")
    got_rows = [
        (r["aid"], r["bid"])
        for r in interval_join(a, b, ("s", "e"), ("s2", "e2"), bucket, keys=["k"]).collect()
    ]
    got = set(got_rows)
    # exactly-once: no pair may surface once per co-covered bucket
    assert len(got_rows) == len(got)
    naive = a.join(b, "k").filter(
        (F.col("s") <= F.col("e2")) & (F.col("s2") <= F.col("e"))
    )
    want = {(r["aid"], r["bid"]) for r in naive.collect()}
    assert got == want


# small token alphabet so random docs share passages often
_doc_lists = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=12),
    min_size=1,
    max_size=8,
)


@given(docs=_doc_lists, p=st.integers(2, 4))
@settings(**SETTINGS)
def test_passage_dedup_matches_sequential_reference(spark, docs, p):
    """passage_dedup ≡ the obvious sequential algorithm: walk documents
    in id order, split into p-token passages, keep a passage iff its
    text was never seen before (anywhere, including earlier in the same
    doc). Distributed first-wins + reassembly may not depend on
    partitioning or hash grouping."""
    from mapreduce_project_spark.operators.dedup import passage_dedup

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(3)
    got = {
        r["doc_id"]: (r["text_deduped"], r["n_passages_kept"])
        for r in passage_dedup(df, "doc_id", "text", p).collect()
    }

    seen: set[str] = set()
    want = {}
    for i, toks in enumerate(docs):
        kept = []
        for s in range(0, len(toks), p):
            passage = " ".join(toks[s : s + p])
            if passage and passage not in seen:
                seen.add(passage)
                kept.append(passage)
        if kept:
            want[i] = (" ".join(kept), len(kept))
    assert got == want


@given(
    w=st.integers(min_value=1, max_value=9),
    h=st.integers(min_value=1, max_value=9),
    seed=st.integers(min_value=0, max_value=2**31),
    top_down=st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_image_decoders_roundtrip_random_rasters(w, h, seed, top_down):
    # pure-Python property check (no Spark per example): any RGB raster
    # survives PPM encode→decode and BMP encode→decode (both row
    # orders, with row padding) byte-for-byte
    import random

    from mapreduce_project_spark.operators.multimodal import _decode_bmp, _decode_ppm
    from tests.test_multimodal import _encode_bmp, _encode_ppm

    rng = random.Random(seed)
    rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
    assert _decode_ppm(_encode_ppm(w, h, rgb)) == (w, h, rgb)
    assert _decode_bmp(_encode_bmp(w, h, rgb, top_down=top_down)) == (w, h, rgb)


@given(
    n=st.integers(min_value=0, max_value=40),
    channels=st.integers(min_value=1, max_value=2),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=60, deadline=None)
def test_wav_decoder_roundtrip_random_pcm(n, channels, rate, seed):
    # random signed 16-bit PCM (full range incl. -32768/32767) survives
    # encode→decode exactly, through the chunk-walking path
    import random

    from mapreduce_project_spark.operators.multimodal import _decode_wav
    from tests.test_multimodal import _encode_wav_pcm

    rng = random.Random(seed)
    pcm = b"".join(
        rng.randrange(-32768, 32768).to_bytes(2, "little", signed=True)
        for _ in range(n)
    )
    got = _decode_wav(_encode_wav_pcm(channels, rate, 16, pcm))
    assert got == (channels, rate, 16, pcm)
