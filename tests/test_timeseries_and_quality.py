"""Continuation-batch operators: OHLC bars (D175), CCNet-style quality
terciles (D173), mojibake audit (D176).  Each is oracle-checked by
tests/test_oracle.py; these tests pin the SEMANTICS against independent
pure-Python reimplementations and invariants."""

from __future__ import annotations

import re
from collections import defaultdict

import mapreduce_project_spark.queries_registry as R  # noqa: F401 — must precede plans.*
from tests.conftest import SF_DIR


def test_ohlc_matches_pure_python(spark):
    from mapreduce_project_spark.sources import load_table

    ev = (
        load_table(spark, SF_DIR, "events")
        .filter("user_id < 30")
        .select("user_id", "ts", "value")
        .collect()
    )
    bars = defaultdict(list)
    for r in ev:
        cents = int(r["value"] * 100 + 0.5)  # floor(x*100+0.5), x>0
        bars[(r["user_id"], r["ts"].strftime("%Y-%m-%d"))].append((r["ts"], cents))
    got = {
        (r["user_id"], r["day"]): r
        for r in R.ALL_QUERIES["events_ohlc_daily"](spark, SF_DIR)
        .filter("user_id < 30")
        .collect()
    }
    assert set(got) == set(bars)
    for key, ticks in bars.items():
        ticks.sort()
        r = got[key]
        cs = [c for _, c in ticks]
        assert r["open_c"] == cs[0] and r["close_c"] == cs[-1]
        assert r["high_c"] == max(cs) and r["low_c"] == min(cs)
        assert r["n_trades"] == len(cs) and r["volume_c"] == sum(cs)
        assert r["low_c"] <= r["open_c"] <= r["high_c"]
        assert r["low_c"] <= r["close_c"] <= r["high_c"]


def test_ccnet_terciles_per_source_invariants(spark):
    rows = R.ALL_QUERIES["ccnet_quality_buckets"](spark, SF_DIR).collect()
    by_src = defaultdict(list)
    for r in rows:
        by_src[r["source"]].append(r)
        assert r["bucket"] == {1: "head", 2: "middle", 3: "tail"}[r["tercile"]]
    assert len(by_src) > 1
    for src, rs in by_src.items():
        sizes = defaultdict(int)
        for r in rs:
            sizes[r["tercile"]] += 1
        # ntile invariant: bucket sizes differ by at most 1, earlier
        # buckets take the remainder
        assert max(sizes.values()) - min(sizes.values()) <= 1
        assert sizes[1] >= sizes[2] >= sizes[3]
        # the tercile order IS the (score desc, doc_id asc) order
        rs.sort(key=lambda r: (-r["score_fp"], r["doc_id"]))
        tcs = [r["tercile"] for r in rs]
        assert tcs == sorted(tcs)
        # head scores dominate tail scores within every source
        head_min = min(r["score_fp"] for r in rs if r["tercile"] == 1)
        tail_max = max(r["score_fp"] for r in rs if r["tercile"] == 3)
        assert head_min >= tail_max


def test_mojibake_planted_counts(spark):
    rows = R.ALL_QUERIES["text_mojibake_audit"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        if r["doc_id"] % 7 == 0:
            # the planted marker carries exactly one latin-1 artifact,
            # two punctuation-mojibake prefixes, one U+FFFD and one C1
            assert r["n_utf8_latin1"] == 1
            assert r["n_punct_mojibake"] == 2
            assert r["n_replacement"] == 1
            assert r["n_c1_control"] == 1
            assert r["clean"] == 0
        else:
            # untouched testdata text is pure ASCII
            assert r["n_utf8_latin1"] == 0
            assert r["n_punct_mojibake"] == 0
            assert r["n_replacement"] == 0
            assert r["n_c1_control"] == 0
            assert r["clean"] == 1


def test_mojibake_detects_real_double_encode(spark):
    # the detector (not the plant): UTF-8 bytes of real non-ASCII text
    # re-read as Latin-1 must trip the latin-1 artifact counter
    s = "caffè crème brûlée"
    garbled = s.encode("utf-8").decode("latin-1")
    hits = re.findall("Ã[^\x00-\x7f]", garbled)
    assert len(hits) == 4  # è, è, û, é each become Ã + continuation


def test_attribution_position_planted_credit_split(spark, tmp_path):
    # Planted journeys pin the U-shaped credit rules exactly:
    #  u1: 4 touches in window  -> 4000/1000/1000/4000
    #  u2: 1 touch              -> 10000
    #  u3: 2 touches            -> 5000/5000
    #  u4: 5 touches            -> 4000/667/667/666/4000 (remainder to
    #      the EARLIEST middles)
    #  u5: touch 25h before and touch AFTER purchase -> excluded, no row
    import datetime as dt

    base = dt.datetime(2024, 3, 10, 12, 0, 0)

    def e(eid, uid, typ, minutes_before_purchase):
        return (eid, base - dt.timedelta(minutes=minutes_before_purchase),
                uid, typ, 0.0, "{}")

    rows = []
    # u1: views at -240,-180 clicks at -120,-60, purchase at 0
    rows += [e(101, 1, "view", 240), e(102, 1, "view", 180),
             e(103, 1, "click", 120), e(104, 1, "click", 60),
             e(105, 1, "purchase", 0)]
    rows += [e(201, 2, "click", 30), e(202, 2, "purchase", 0)]
    rows += [e(301, 3, "view", 90), e(302, 3, "click", 45),
             e(303, 3, "purchase", 0)]
    rows += [e(401, 4, "view", 300), e(402, 4, "view", 250),
             e(403, 4, "view", 200), e(404, 4, "click", 150),
             e(405, 4, "click", 100), e(406, 4, "purchase", 0)]
    rows += [e(501, 5, "view", 25 * 60), e(502, 5, "purchase", 0),
             e(503, 5, "click", -10)]  # after the purchase
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    got = {
        r["channel"]: r
        for r in R.ALL_QUERIES["events_attribution_position"](
            spark, str(tmp_path)
        ).collect()
    }
    # u1: view 4000+1000, click 1000+4000; u2: click 10000;
    # u3: view 5000, click 5000;
    # u4: view 4000+667+667, click 666+4000; u5 contributes nothing
    assert got["view"]["credit_bp_total"] == 4000 + 1000 + 5000 + 4000 + 667 + 667
    assert got["click"]["credit_bp_total"] == 1000 + 4000 + 10000 + 5000 + 666 + 4000
    assert got["view"]["n_conversions_touched"] == 3
    assert got["click"]["n_conversions_touched"] == 4
    # conservation: total credit = 10000 x attributed conversions (4)
    assert sum(r["credit_bp_total"] for r in got.values()) == 40000


def test_cusum_flags_planted_level_shift_only(spark, tmp_path):
    # 18 baseline days at 300 events, then a 2-day spike at 900:
    # mean = 360, slack = 90 -> baseline deviations never accumulate
    # (300 - 360 - 90 < 0 both sides), the spike adds 450k milli/day so
    # S+ crosses h = mean_fp = 360000 on the FIRST spike day; no other
    # day alarms.
    import datetime as dt

    rows = []
    eid = 0
    for d in range(20):
        n = 900 if d >= 18 else 300
        for j in range(n):
            eid += 1
            rows.append(
                (eid, dt.datetime(2024, 5, 1 + d, j // 60 % 24, j % 60, 0),
                 j % 50, "view", 1.0, "{}")
            )
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {
        r["day"]: r
        for r in R.ALL_QUERIES["events_cusum_changepoints"](
            spark, str(tmp_path)
        ).collect()
    }
    assert len(got) == 20
    for d in range(20):
        day = f"2024-05-{1 + d:02d}"
        if d >= 18:
            assert got[day]["changepoint"] == 1, (day, dict(got[day].asDict()))
        else:
            assert got[day]["changepoint"] == 0, (day, dict(got[day].asDict()))


def test_session_path_mining_planted_journeys(spark, tmp_path):
    # Three planted journeys pin the gap split, the first-5 truncation
    # and the conversion tag:
    #  u1: view>click>purchase in one session, then (>30 min later) a
    #      lone view session
    #  u2: the same view>click>purchase shape
    #  u3: seven events -> path truncates to the first five types
    import datetime as dt

    base = dt.datetime(2024, 5, 1, 9, 0, 0)
    rows = []

    def e(eid, uid, typ, minutes):
        rows.append((eid, base + dt.timedelta(minutes=minutes), uid, typ,
                     0.0, "{}"))

    e(1, 1, "view", 0); e(2, 1, "click", 5); e(3, 1, "purchase", 10)
    e(4, 1, "view", 60)  # > 30 min gap -> new session
    e(5, 2, "view", 0); e(6, 2, "click", 4); e(7, 2, "purchase", 8)
    for i, typ in enumerate(
        ["view", "view", "click", "view", "click", "view", "purchase"]
    ):
        e(100 + i, 3, typ, i)
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    got = {
        r["path"]: r
        for r in R.ALL_QUERIES["session_path_mining"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(got) == {
        "view>click>purchase", "view", "view>view>click>view>click"
    }
    vcp = got["view>click>purchase"]
    assert vcp["n_sessions"] == 2 and vcp["n_converted"] == 2
    lone = got["view"]
    assert lone["n_sessions"] == 1 and lone["n_converted"] == 0
    # u3's purchase is event 6 of 7: the path truncates to five types
    # but the conversion tag still sees the whole session
    trunc = got["view>view>click>view>click"]
    assert trunc["n_sessions"] == 1 and trunc["n_converted"] == 1
    # shares are exact micro-units of the 4 total sessions
    assert vcp["share_micro"] == 2 * 1000000 // 4
    assert lone["share_micro"] == 1000000 // 4


def test_mann_kendall_planted_trends(spark, tmp_path):
    # Three hand-checkable regimes in one table is impossible (the
    # query is global), so plant the cleanest: a strictly increasing
    # series with ONE tied day pair. 6 days: cents 100,200,300,300,
    # 400,500 (days 0..5, one order per day, price = cents/100).
    import datetime as dt

    cents = [10000, 20000, 30000, 30000, 40000, 50000]
    rows = [
        (k + 1, 1, cents[k] / 100.0, dt.datetime(2024, 1, 1) + dt.timedelta(days=k))
        for k in range(6)
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_totalprice double,"
        " o_orderdate timestamp",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    r = R.ALL_QUERIES["trend_mann_kendall"](spark, str(tmp_path)).collect()[0]
    assert r["n_days"] == 6 and r["n_pairs"] == 15
    # S: every pair ascending except the (300,300) tie -> 14 - 0 + tie 0
    assert r["s_stat"] == 14
    # var*18 = n(n-1)(2n+5) - t(t-1)(2t+5) with one tie group of 2
    assert r["var_x18"] == 6 * 5 * 17 - 2 * 1 * 9
    # z = (S-1)/sqrt(var), one pinned expression
    import math

    assert abs(r["z_score"] - 13.0 / math.sqrt(r["var_x18"] / 18.0)) < 1e-12
    # Sen: pairwise slopes in micro-cents/day; the lower median of the
    # 15 slopes computed independently
    slopes = sorted(
        (cents[j] - cents[i]) * 1000000 // (j - i)
        for i in range(6)
        for j in range(i + 1, 6)
    )
    m = len(slopes)
    # lower median = smallest value whose cumulative count reaches m/2
    assert r["sen_slope_micro"] == slopes[(m - 1) // 2]


def test_benford_audit_planted_digits(spark, tmp_path):
    # 6 orders whose cents start with digits 1,1,1,2,3,9: shares are
    # exact micro-units of 6; digits with zero mass still emit rows.
    import datetime as dt

    prices = [1.00, 150.00, 19.99, 2.50, 34.00, 90.01]
    rows = [
        (k + 1, 1, p, dt.datetime(2024, 2, 1)) for k, p in enumerate(prices)
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_totalprice double,"
        " o_orderdate timestamp",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    got = {
        r["digit"]: r
        for r in R.ALL_QUERIES["benford_first_digit_audit"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(got) == set(range(1, 10))
    assert got[1]["n_obs"] == 3 and got[2]["n_obs"] == 1
    assert got[3]["n_obs"] == 1 and got[9]["n_obs"] == 1
    assert all(got[d]["n_obs"] == 0 for d in (4, 5, 6, 7, 8))
    assert got[1]["share_micro"] == 3 * 1000000 // 6
    assert got[1]["dev_micro"] == 500000 - 301030
    assert got[4]["share_micro"] == 0 and got[4]["dev_micro"] == -96910


def test_l_diversity_flags_homogeneous_cell(spark, tmp_path):
    # cell (AUTO, 1): three customers, all in balance band 0 -> l = 1
    # cell (AUTO, 2): two customers in bands 0 and 5 -> l = 2
    # cell (BLDG, 1): three customers in bands 0, 5, 9 -> l = 3
    rows = [
        (1, "AUTO", 1, 100.0), (2, "AUTO", 1, 200.0), (3, "AUTO", 1, 300.0),
        (4, "AUTO", 2, 100.0), (5, "AUTO", 2, 5500.0),
        (6, "BLDG", 1, 100.0), (7, "BLDG", 1, 5500.0), (8, "BLDG", 1, 9500.0),
    ]
    spark.createDataFrame(
        rows,
        "c_custkey bigint, c_mktsegment string, c_nationkey bigint,"
        " c_acctbal double",
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    r = R.ALL_QUERIES["l_diversity_audit"](spark, str(tmp_path)).collect()[0]
    assert r["n_cells"] == 3
    assert r["min_l"] == 1
    assert r["n_cells_below_l3"] == 2
    assert r["n_rows_below_l3"] == 5


def test_markov_attribution_planted_two_paths(spark, tmp_path):
    # D211: 6 email->purchase sessions, 6 display-only dead ends,
    # 2 display->purchase. Removing email must erase ~3/4 of the
    # conversion mass, display ~1/4 — the removal ranking is the
    # operator's contract, and the oracle must agree cell-for-cell.
    import duckdb

    from tests.conftest import rows_of

    rows, eid = [], 0
    def session(uid, day, types):
        nonlocal eid
        for i, et in enumerate(types):
            rows.append((eid, uid, f"2024-02-{day:02d} 10:{i:02d}:00", et))
            eid += 1
    for u in range(6):
        session(100 + u, 1 + u % 3, ["email", "purchase"])
    for u in range(6):
        session(200 + u, 1 + u % 3, ["display"])
    for u in range(2):
        session(300 + u, 1 + u, ["display", "purchase"])
    import pyspark.sql.functions as F
    spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))

    got = R.ALL_QUERIES["events_markov_attribution"](spark, str(tmp_path)).toPandas()
    m = {r["channel"]: r for _, r in got.iterrows()}
    assert set(m) == {"display", "email"}
    # true base conversion: 8 of 14 sessions
    assert abs(m["email"]["p_base_fp"] - 571_428_000) <= 2_000
    assert m["email"]["removal_micro"] > m["display"]["removal_micro"]
    assert abs(m["email"]["removal_micro"] - 750_000) <= 10
    assert abs(m["display"]["removal_micro"] - 250_000) <= 10

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    want = con.sql(R.ALL_ORACLES["events_markov_attribution"]).df()
    assert rows_of(got) == rows_of(want)


def test_seasonal_baseline_flags_only_the_spike(spark, tmp_path):
    # D214: a flat weekday profile absorbs the pattern; only the one
    # planted spike day deviates > 50% from its own dow baseline.
    rows, eid = [], 0
    # 3 weeks; dow pattern via epoch-day % 7; day 0 = 1970-01-01 aligned
    import datetime
    base = datetime.date(2024, 3, 4)
    for w in range(3):
        for d in range(7):
            day = base + datetime.timedelta(days=w * 7 + d)
            n = 10 if d == 2 else 2
            if w == 1 and d == 2:
                n = 30  # the spike
            for i in range(n):
                rows.append((eid, 1 + i, f"{day} 0{i % 10}:00:00", "view"))
                eid += 1
    import pyspark.sql.functions as F
    spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))
    got = R.ALL_QUERIES["events_seasonal_baseline"](spark, str(tmp_path)).toPandas()
    anomalies = got[got["is_anomaly"] == 1]
    spike_day = str(base + datetime.timedelta(days=9))
    assert list(anomalies["day"]) == [spike_day]
    # the spike dow's baseline is the contaminated mean (10+30+10)/3
    assert anomalies.iloc[0]["dow_mean_micro"] == (10 + 30 + 10) * 1_000_000 // 3


def test_sequential_pairs_order_vs_presence(spark, tmp_path):
    # D215: [b, a, b] supports BOTH a->b and b->a (span semantics);
    # a session with only 'a' counts toward n_a but no pair.
    rows = [
        (0, 1, "2024-05-01 10:00:00", "click"),
        (1, 1, "2024-05-01 10:01:00", "view"),
        (2, 1, "2024-05-01 10:02:00", "click"),   # session [b,a,b]
        (3, 2, "2024-05-01 10:00:00", "view"),    # session [a]
        (4, 3, "2024-05-01 10:00:00", "view"),
        (5, 3, "2024-05-01 10:01:00", "click"),   # session [a,b]
    ]
    import pyspark.sql.functions as F
    spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))
    got = {
        (r["antecedent"], r["consequent"]): (r["n_ab"], r["n_a"], r["support_micro"])
        for r in R.ALL_QUERIES["events_sequential_pairs"](spark, str(tmp_path)).collect()
    }
    # 3 sessions total; view precedes click in u1 (span) and u3
    assert got[("view", "click")] == (2, 3, 2 * 1_000_000 // 3)
    assert got[("click", "view")] == (1, 2, 1 * 1_000_000 // 3)


def test_cuped_planted_correlated_covariate(spark, tmp_path):
    # D217: y ~= 2x per user -> theta near 2, variance reduction near 1,
    # and the adjustment pulls covariate-imbalanced arm means together.
    rows, eid = [], 0
    for u in range(1, 17):
        x_cents = u * 1000          # pre-period spend
        y_cents = 2 * x_cents + (u % 3) * 7  # strongly correlated
        rows.append((eid, u, "2024-01-05 10:00:00", "view", x_cents / 100.0)); eid += 1
        rows.append((eid, u, "2024-01-20 10:00:00", "view", y_cents / 100.0)); eid += 1
    import pyspark.sql.functions as F
    spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))
    got = R.ALL_QUERIES["abtest_cuped_adjust"](spark, str(tmp_path)).toPandas()
    assert sorted(got["arm"]) == ["A", "B"]
    th = got.iloc[0]["theta"]
    assert abs(th - 2.0) < 0.01
    assert got.iloc[0]["var_reduction"] > 0.99
    a = got[got["arm"] == "A"].iloc[0]
    b = got[got["arm"] == "B"].iloc[0]
    raw_gap = abs(a["mean_y"] - b["mean_y"])
    adj_gap = abs(a["mean_y_adj"] - b["mean_y_adj"])
    assert adj_gap < raw_gap * 0.2  # the covariate explained the gap
