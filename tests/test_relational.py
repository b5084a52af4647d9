from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from nido_spark.relational import asof_join, session_stats, sessionize


def _ts(minute: int, second: int = 0):
    return datetime(2024, 1, 1, 0, minute, second)


@pytest.fixture()
def quotes_trades(spark):
    quotes = spark.createDataFrame(
        [
            (1, _ts(0), 100.0),
            (1, _ts(10), 101.0),
            (2, _ts(5), 50.0),
        ],
        "key long, ts timestamp, px double",
    )
    trades = spark.createDataFrame(
        [
            (1, _ts(0), "at-quote"),      # equal ts -> inclusive match
            (1, _ts(9, 59), "pre-2nd"),   # just before the 2nd quote
            (1, _ts(10), "at-2nd"),
            (2, _ts(4), "too-early"),     # no prior quote -> null
            (3, _ts(1), "no-key"),        # key absent on right -> null
        ],
        "key long, ts timestamp, tag string",
    )
    return quotes, trades


def test_asof_join_backward_inclusive(quotes_trades):
    quotes, trades = quotes_trades
    out = {
        r["tag"]: r["px_asof"]
        for r in asof_join(trades, quotes, on="key", right_cols=["px"]).collect()
    }
    assert out == {
        "at-quote": 100.0,
        "pre-2nd": 100.0,
        "at-2nd": 101.0,
        "too-early": None,
        "no-key": None,
    }


def test_asof_join_suffix_collision_raises(quotes_trades):
    quotes, trades = quotes_trades
    with pytest.raises(ValueError):
        asof_join(
            trades.withColumnRenamed("tag", "px_asof"), quotes,
            on="key", right_cols=["px"],
        )


def test_sessionize_gap_boundaries(spark):
    rows = [
        (0, 7, _ts(0)),
        (1, 7, _ts(10)),      # 600 s gap, same session at gap=900
        (2, 7, _ts(30)),      # 1200 s gap -> new session
        (3, 8, _ts(0)),       # other user independent
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {
        r["event_id"]: r["session_idx"]
        for r in sessionize(df, gap_seconds=900).collect()
    }
    assert got == {0: 0, 1: 0, 2: 1, 3: 0}

    stats = {
        (r["user_id"], r["session_idx"]): (r["n_events"], r["duration_us"])
        for r in session_stats(df, gap_seconds=900).collect()
    }
    assert stats[(7, 0)] == (2, 600 * 1_000_000)
    assert stats[(7, 1)] == (1, 0)
    assert stats[(8, 0)] == (1, 0)


def test_asof_join_null_right_ts_never_matches(spark):
    """Review regression: a NULL-timestamp right row must never match (it
    used to sort first and poison every earlier left row of its key)."""
    right = spark.createDataFrame(
        [(1, None, 42.0), (1, _ts(5), 7.0)], "key long, ts timestamp, px double"
    )
    left = spark.createDataFrame(
        [(1, _ts(1), "early"), (1, _ts(6), "late")],
        "key long, ts timestamp, tag string",
    )
    out = {r["tag"]: r["px_asof"] for r in
           asof_join(left, right, on="key", right_cols=["px"]).collect()}
    assert out == {"early": None, "late": 7.0}


# ---------------------------------------------------------------------------
# hot-key pre-split (coarse-time-range bucketing + boundary stitch)
# ---------------------------------------------------------------------------


@pytest.fixture()
def skewed_events(spark):
    """One mega-hot key (~2000 rows, bursty gaps) + a handful of cold keys;
    deterministic timestamps so both renderings are exactly comparable."""
    rows = []
    eid = 0
    t = 0
    for i in range(2000):
        # bursts of ~7 events 1s apart, then a gap alternating above/below
        # the 30-minute session threshold; exercises session boundaries
        # falling ON and OFF bucket boundaries
        t += 1_000_000 if i % 7 else (2_000_000_000 if i % 14 else 1_500_000_000)
        rows.append((eid, 999, t)); eid += 1
    for k in range(5):
        for i in range(10):
            rows.append((eid, k, i * 2_000_000_000 + k)); eid += 1
    df = spark.createDataFrame(rows, "event_id long, user_id long, us long")
    return df.select(
        "event_id", "user_id",
        F.timestamp_micros(F.col("us")).alias("ts"),
    )


def test_sessionize_hot_key_split_equals_single_window(skewed_events):
    base = sessionize(skewed_events).select("event_id", "session_idx")
    split = sessionize(
        skewed_events, hot_key_threshold=100, hot_key_buckets=16
    ).select("event_id", "session_idx")
    assert split.schema == base.schema
    got = {r["event_id"]: r["session_idx"] for r in split.collect()}
    want = {r["event_id"]: r["session_idx"] for r in base.collect()}
    assert got == want


def test_sessionize_hot_key_split_bounds_partition_size(skewed_events):
    """The point of the split: no (key, bucket) window partition sees the
    hot key's full row count."""
    from nido_spark.relational import _with_time_buckets

    us = F.unix_micros(F.col("ts"))
    bucketed, hot = _with_time_buckets(
        skewed_events, "user_id", us, threshold=100, n_buckets=16, bucket_name="_b"
    )
    assert [r["user_id"] for r in hot.collect()] == [999]
    sizes = (
        bucketed.where(F.col("user_id") == 999)
        .groupBy("_b").count().collect()
    )
    assert len(sizes) > 4  # genuinely split across many time ranges
    assert max(r["count"] for r in sizes) < 2000 / 2  # bounded per-task input


def test_session_stats_hot_key_split_equals_single_window(skewed_events):
    cols = ["user_id", "session_idx", "n_events", "duration_us"]
    base = sorted(session_stats(skewed_events).select(cols).collect())
    split = sorted(
        session_stats(skewed_events, hot_key_threshold=100, hot_key_buckets=16)
        .select(cols).collect()
    )
    assert split == base


def test_asof_join_hot_key_split_equals_single_window(spark, skewed_events):
    """Right side sparse (every ~50th event is a 'click'): most buckets have
    NO right row, so the carry-in must stitch across several empty buckets."""
    left = skewed_events
    right = (
        skewed_events.where(F.col("event_id") % 50 == 0)
        .select("user_id", "ts", F.col("event_id").alias("click_id"))
    )
    kw = dict(on="user_id", right_cols=["click_id"])
    base = asof_join(left, right, **kw).select("event_id", "click_id_asof")
    split = asof_join(
        left, right, hot_key_threshold=100, hot_key_buckets=16, **kw
    ).select("event_id", "click_id_asof")
    assert split.schema == base.schema
    got = {r["event_id"]: r["click_id_asof"] for r in split.collect()}
    want = {r["event_id"]: r["click_id_asof"] for r in base.collect()}
    assert got == want


def test_asof_join_internal_name_clash_tolerated(spark):
    """Left tables may legitimately contain _k/_ts/_pay/... — internal
    working names must be derived clash-free (review finding)."""
    left = spark.createDataFrame(
        [(1, _ts(5), "x", "y", "z")],
        "key long, ts timestamp, _k string, _pay string, _b string",
    )
    right = spark.createDataFrame(
        [(1, _ts(0), 7.0)], "key long, ts timestamp, px double"
    )
    for thr in (None, 0):
        out = asof_join(
            left, right, on="key", right_cols=["px"],
            hot_key_threshold=thr,
        ).collect()
        assert len(out) == 1 and out[0]["px_asof"] == 7.0
        assert out[0]["_k"] == "x" and out[0]["_pay"] == "y"


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_sessionize_hot_split_equality_randomized(spark, seed):
    """Randomized stitch check: duplicated timestamps, gaps straddling
    bucket boundaries, several keys above/below the threshold — the split
    rendering must equal the single window on every draw."""
    import numpy as np

    rng = np.random.default_rng(seed)
    rows = []
    eid = 0
    for k in range(4):
        n = int(rng.integers(5, 120))
        t = int(rng.integers(0, 10**6))
        for _ in range(n):
            # gaps cluster near 0 and near the 1800s threshold; repeat a
            # timestamp with ~20% probability (tiebreak coverage)
            if rng.random() > 0.2:
                t += int(rng.choice([0, 1, 1000, 1799, 1800, 1801, 4000])) * 1_000_000
            rows.append((eid, k, t)); eid += 1
    df = spark.createDataFrame(rows, "event_id long, user_id long, us long").select(
        "event_id", "user_id", F.timestamp_micros(F.col("us")).alias("ts")
    )
    base = {r["event_id"]: r["session_idx"] for r in sessionize(df).collect()}
    split = {
        r["event_id"]: r["session_idx"]
        for r in sessionize(df, hot_key_threshold=20, hot_key_buckets=7).collect()
    }
    assert split == base


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_asof_hot_split_equality_randomized(spark, seed):
    import numpy as np

    rng = np.random.default_rng(seed)
    left_rows, right_rows = [], []
    eid = 0
    for k in range(3):
        n = int(rng.integers(10, 150))
        for _ in range(n):
            left_rows.append((eid, k, int(rng.integers(0, 10**5)) * 1_000_000)); eid += 1
        # (k, ts) uniqueness is an asof_join precondition — draw without
        # replacement so duplicate right timestamps can't make the carried
        # payload choice ambiguous (and the test flaky)
        for us in rng.choice(10**5, size=int(rng.integers(0, 8)), replace=False):
            right_rows.append((k, int(us) * 1_000_000, float(rng.random())))
    left = spark.createDataFrame(left_rows, "event_id long, k long, us long").select(
        "event_id", "k", F.timestamp_micros(F.col("us")).alias("ts"))
    right = spark.createDataFrame(right_rows, "k long, us long, px double").select(
        "k", F.timestamp_micros(F.col("us")).alias("ts"), "px")
    kw = dict(on="k", right_cols=["px"])
    base = {r["event_id"]: r["px_asof"]
            for r in asof_join(left, right, **kw).collect()}
    split = {r["event_id"]: r["px_asof"]
             for r in asof_join(left, right, hot_key_threshold=25,
                                hot_key_buckets=6, **kw).collect()}
    assert split == base


def test_asof_join_forward_inclusive(quotes_trades):
    quotes, trades = quotes_trades
    out = {
        r["tag"]: r["px_asof"]
        for r in asof_join(
            trades, quotes, on="key", right_cols=["px"], direction="forward"
        ).collect()
    }
    assert out == {
        "at-quote": 100.0,   # equal ts -> inclusive
        "pre-2nd": 101.0,    # next quote at :10
        "at-2nd": 101.0,     # equal ts -> inclusive
        "too-early": 50.0,   # quote at :05 follows
        "no-key": None,
    }


def test_asof_join_nearest_ties_backward(spark):
    right = spark.createDataFrame(
        [(1, _ts(0), 10.0), (1, _ts(10), 20.0)],
        "key long, ts timestamp, px double",
    )
    left = spark.createDataFrame(
        [
            (1, 1, _ts(5)),       # exact midpoint: tie -> backward (10.0)
            (2, 1, _ts(4)),       # closer to :00 -> 10.0
            (3, 1, _ts(6)),       # closer to :10 -> 20.0
            (4, 1, _ts(12)),      # after last -> backward only 20.0
            (5, 2, _ts(5)),       # no right rows for key -> null
        ],
        "event_id long, key long, ts timestamp",
    )
    out = {
        r["event_id"]: r["px_asof"]
        for r in asof_join(
            left, right, on="key", right_cols=["px"], direction="nearest"
        ).collect()
    }
    assert out == {1: 10.0, 2: 10.0, 3: 20.0, 4: 20.0, 5: None}


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("seed", [17, 29])
def test_asof_directions_vs_bruteforce(spark, direction, seed):
    """Randomized cross-check of all three directions against a brute-force
    per-row scan implementing the documented semantics (inclusive both
    ways; nearest ties to backward)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    left_rows, right_by_key = [], {}
    eid = 0
    for k in range(4):
        for us in rng.choice(2000, size=60, replace=True):
            left_rows.append((eid, k, int(us) * 1_000_000)); eid += 1
        rts = rng.choice(2000, size=int(rng.integers(0, 12)), replace=False)
        right_by_key[k] = sorted((int(us) * 1_000_000, float(us)) for us in rts)
    right_rows = [(k, us, px) for k, v in right_by_key.items() for us, px in v]

    def brute(k, us):
        back = [(t, p) for t, p in right_by_key.get(k, []) if t <= us]
        fwd = [(t, p) for t, p in right_by_key.get(k, []) if t >= us]
        pb = max(back)[1] if back else None
        pf = min(fwd)[1] if fwd else None
        if direction == "backward":
            return pb
        if direction == "forward":
            return pf
        if pb is None or pf is None:
            return pb if pf is None else pf
        db = us - max(back)[0]; df = min(fwd)[0] - us
        return pb if db <= df else pf

    left = spark.createDataFrame(left_rows, "event_id long, k long, us long").select(
        "event_id", "k", F.timestamp_micros(F.col("us")).alias("ts"))
    right = spark.createDataFrame(right_rows, "k long, us long, px double").select(
        "k", F.timestamp_micros(F.col("us")).alias("ts"), "px")
    got = {r["event_id"]: r["px_asof"]
           for r in asof_join(left, right, on="k", right_cols=["px"],
                              direction=direction).collect()}
    want = {e: brute(k, us) for e, k, us in left_rows}
    assert got == want
    # split path: identical output on the same draw
    got_split = {r["event_id"]: r["px_asof"]
                 for r in asof_join(left, right, on="k", right_cols=["px"],
                                    direction=direction, hot_key_threshold=25,
                                    hot_key_buckets=6).collect()}
    assert got_split == want


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_plan_is_single_shuffle(spark, direction):
    """The claimed plan shape: ONE hash-partition exchange for every
    direction (nearest adds a second in-partition sort, never a second
    shuffle), and no nested-loop/cartesian fallback."""
    left = spark.createDataFrame(
        [(1, 1, _ts(5))], "event_id long, key long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts(0), 1.0)], "key long, ts timestamp, px double"
    )
    plan = (
        asof_join(left, right, on="key", right_cols=["px"], direction=direction)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_rolling_zscore_python_replay(spark):
    """Rolling mu/sigma/z over the 10 strictly-preceding rows in (ts, id)
    order == a pure-Python replay; z NULL below min_obs and at sigma 0
    (constant history); no self-leak (the row's own value never enters
    its frame)."""
    import datetime as dt
    import statistics

    from nido_spark.relational import rolling_zscore

    t0 = dt.datetime(2026, 1, 1)
    rows = []
    vals = {
        1: [1.0, 1.0, 1.0, 1.0, 50.0, 1.0],     # constant history then spike
        2: [1.0, 2.0, 3.0, 4.0, 5.0, 100.0, 6.0, 7.0],
    }
    eid = 0
    for u, vs in vals.items():
        for i, v in enumerate(vs):
            rows.append((eid, t0 + dt.timedelta(seconds=i), u, v))
            eid += 1
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    got = {r["event_id"]: r.asDict() for r in rolling_zscore(
        events, window_rows=10, min_obs=3
    ).collect()}
    eid = 0
    for u, vs in vals.items():
        for i, v in enumerate(vs):
            prior = vs[max(0, i - 10):i]
            r = got[eid]
            assert r["n_prior"] == len(prior)
            if len(prior) >= 2:
                sd = statistics.stdev(prior)
                assert abs(r["sigma"] - sd) < 1e-7
                if len(prior) >= 3 and sd > 0:
                    want = (v - statistics.fmean(prior)) / sd
                    assert abs(r["z"] - want) < 1e-6, eid
                else:
                    assert r["z"] is None
            else:
                assert r["z"] is None
            eid += 1
    # the spike over a CONSTANT history has sigma 0 -> z NULL by contract
    assert got[4]["sigma"] == 0.0 and got[4]["z"] is None
    # the spike over a varying history is a loud outlier
    assert got[11]["z"] > 10


def test_funnel_ordered_steps_hand_cases(spark):
    """Strictly-ordered funnel: full completion, out-of-order steps don't
    count, same-instant events don't progress, steps can't be skipped,
    users without step 1 emit nothing."""
    import datetime as dt

    from nido_spark.relational import funnel

    t0 = dt.datetime(2026, 1, 1)

    def ev(eid, u, secs, typ):
        return (eid, t0 + dt.timedelta(seconds=secs), u, typ)

    rows = [
        ev(1, 1, 0, "view"), ev(2, 1, 10, "click"), ev(3, 1, 20, "purchase"),
        ev(4, 2, 10, "view"), ev(5, 2, 5, "click"),          # click before view
        ev(6, 3, 0, "view"), ev(7, 3, 0, "click"),           # same instant
        ev(8, 4, 5, "view"), ev(9, 4, 0, "purchase"),        # skip click
        ev(10, 5, 0, "click"), ev(11, 5, 1, "purchase"),     # never viewed
        ev(12, 6, 0, "view"), ev(13, 6, 10, "click"), ev(14, 6, 5, "purchase"),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {
        r["user_id"]: (r["depth"], r["t1_us"], r["t2_us"], r["t3_us"])
        for r in funnel(events, ["view", "click", "purchase"]).collect()
    }
    us = lambda s: int((t0 + dt.timedelta(seconds=s)).timestamp() * 1_000_000)
    assert got[1] == (3, us(0), us(10), us(20))
    assert got[2] == (1, us(10), None, None)
    assert got[3] == (1, us(0), None, None)
    assert got[4] == (1, us(5), None, None)
    assert 5 not in got
    assert got[6] == (2, us(0), us(10), None)


def test_retention_triangle_hand_cases(spark):
    """Offset-0 rows equal cohort sizes (the retention-triangle
    invariant); a user active in multiple periods counts once per
    period; weekly and daily granularities truncate correctly; bad
    period raises."""
    import datetime as dt

    import pytest as _pt

    from nido_spark.relational import retention

    mon = dt.datetime(2026, 1, 5)  # a Monday
    rows = [
        # user 1: first week 0, active weeks 0 and 2
        (1, mon),
        (1, mon + dt.timedelta(days=1)),
        (1, mon + dt.timedelta(days=15)),
        # user 2: first week 0 only
        (2, mon + dt.timedelta(days=3)),
        # user 3: first week 1, active weeks 1 and 2
        (3, mon + dt.timedelta(days=8)),
        (3, mon + dt.timedelta(days=14)),
    ]
    events = spark.createDataFrame(
        [(i, ts, u) for i, (u, ts) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long",
    )
    got = {
        (r["cohort_day"], r["period_offset"]): r["n_active"]
        for r in retention(events).collect()
    }
    d0 = (mon.date() - dt.date(1970, 1, 1)).days
    assert got == {
        (d0, 0): 2,          # users 1, 2 in cohort week 0
        (d0, 2): 1,          # user 1 returns in week 2
        (d0 + 7, 0): 1,      # user 3 cohort week 1
        (d0 + 7, 1): 1,      # user 3 active week 2
    }
    daily = {
        (r["cohort_day"], r["period_offset"]): r["n_active"]
        for r in retention(events, period="day").collect()
    }
    assert daily[(d0, 0)] == 1 and daily[(d0, 1)] == 1  # users 1 and 2 split
    with _pt.raises(ValueError):
        retention(events, period="month")


def test_conversation_analytics_hand_cases(spark):
    """Role Markov chain counts/probabilities and per-conv shape stats on
    a hand fixture; tool-free conversations get first_tool_turn NULL and
    zero distinct tools."""
    import datetime as dt

    from nido_spark.conversation import conversation_stats, role_transitions

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        ("A", 0, "user", "x", None), ("A", 1, "assistant", "x", None),
        ("A", 2, "tool", "x", "t1"), ("A", 3, "assistant", "x", None),
        ("A", 4, "user", "x", None),
        ("B", 0, "user", "x", None), ("B", 1, "assistant", "x", None),
    ]
    tr = spark.createDataFrame(
        [(c, i, r, x, tl, t0 + dt.timedelta(seconds=i)) for c, i, r, x, tl in rows],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    got = {
        (r["from_role"], r["to_role"]): (r["n"], r["p"])
        for r in role_transitions(tr).collect()
    }
    assert got == {
        ("user", "assistant"): (2, 1.0),
        ("assistant", "tool"): (1, 0.5),
        ("assistant", "user"): (1, 0.5),
        ("tool", "assistant"): (1, 1.0),
    }
    st = {r["conv_id"]: r.asDict() for r in conversation_stats(tr).collect()}
    assert st["A"] == {
        "conv_id": "A", "n_turns": 5, "n_user": 2, "n_assistant": 2,
        "n_tool": 1, "n_distinct_tools": 1, "first_tool_turn": 2,
    }
    assert st["B"]["n_tool"] == 0
    assert st["B"]["n_distinct_tools"] == 0
    assert st["B"]["first_tool_turn"] is None


# ---------------------------------------------------------------------------
# heavy hitters (Misra-Gries candidates + exact verify)
# ---------------------------------------------------------------------------


def _exact_heavies(rows, k):
    from collections import Counter

    c = Counter(r for r in rows if r is not None)
    n = len([r for r in rows])
    return {key: v for key, v in c.items() if v * (k + 1) > n}


def test_heavy_hitters_exact_and_partition_invariant(spark):
    """Output == the exact groupBy-HAVING answer, for ANY partitioning —
    the MG sketch only proposes candidates; the verify pass is exact."""
    import random

    from nido_spark.relational import heavy_hitters

    rng = random.Random(7)
    # zipf-ish: key i drawn with weight ~ 1/(i+1)
    keys = [int(rng.paretovariate(1.1)) % 50 for _ in range(5000)]
    want = _exact_heavies(keys, k=8)
    assert want, "fixture must produce at least one heavy hitter"
    df = spark.createDataFrame([(x,) for x in keys], "user_id long")
    for nparts in (1, 7, 32):
        got = {
            r["user_id"]: r["cnt"]
            for r in heavy_hitters(
                df.repartition(nparts), ["user_id"], k=8
            ).collect()
        }
        assert got == want, f"nparts={nparts}"


def test_heavy_hitters_majority_survives_tiny_k(spark):
    """k=1 (the Boyer-Moore majority case): a strict-majority element is
    guaranteed; minority elements must NOT appear."""
    from nido_spark.relational import heavy_hitters

    rows = [(1,)] * 60 + [(2,)] * 25 + [(3,)] * 15
    df = spark.createDataFrame(rows, "user_id long").repartition(13)
    got = heavy_hitters(df, ["user_id"], k=1).collect()
    assert {(r["user_id"], r["cnt"]) for r in got} == {(1, 60)}


def test_heavy_hitters_null_keys_ignored_and_composite(spark):
    from nido_spark.relational import heavy_hitters

    rows = (
        [(None, "a")] * 40
        + [(1, "a")] * 30
        + [(1, "b")] * 20
        + [(2, "a")] * 10
    )
    df = spark.createDataFrame(rows, "user_id long, et string").repartition(5)
    got = {
        (r["user_id"], r["et"]): r["cnt"]
        for r in heavy_hitters(df, ["user_id", "et"], k=3).collect()
    }
    # N=100 (nulls still count toward N: they are rows of the table);
    # threshold cnt*4 > 100 => cnt >= 26
    assert got == {(1, "a"): 30}


def test_heavy_hitters_k_contract(spark):
    import pytest as _pt

    from nido_spark.relational import heavy_hitters

    df = spark.createDataFrame([(1,)], "user_id long")
    with _pt.raises(ValueError):
        heavy_hitters(df, ["user_id"], k=0)


# ---------------------------------------------------------------------------
# approx_distinct (deterministic HLL on the Feistel mixer)
# ---------------------------------------------------------------------------


def _py_hll(values, b=9, seed=42):
    """Bit-exact pure-Python replay of relational.approx_distinct's math."""
    import math

    KS = [(1103515245, 12345), (48271, 11213),
          (1583458089, 54321), (784588716, 98765)]
    M30 = (1 << 30) - 1
    m = 1 << b
    wbits = 60 - b
    regs = {}
    for v in values:
        if v is None:
            continue
        x = (v + seed) % (1 << 60)
        L, R = x >> 30, x & M30
        for a, c in KS:
            f = ((a * R + c) >> 15) & M30
            L, R = R, L ^ f
        h = (L << 30) + R
        bkt = h >> wbits
        w = h & ((1 << wbits) - 1)
        rho = 32 if w == 0 else min(wbits - w.bit_length() + 1, 32)
        regs[bkt] = max(regs.get(bkt, 0), rho)
    V = m - len(regs)
    s = sum(1.0 / (1 << M) for M in regs.values()) + float(V)
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1.0 + 1.079 / m))
    raw = (alpha * m * m) / s
    est = m * math.log(m / V) if (raw <= 2.5 * m and V > 0) else raw
    return round(est, 9)


def test_approx_distinct_bitexact_python_replay_and_invariance(spark):
    from nido_spark.relational import approx_distinct

    rows = [(i % 3, i * 7 % 997) for i in range(4000)] + [(0, None)] * 5
    df = spark.createDataFrame(rows, "g int, v long")
    want = {
        g: _py_hll([v for gg, v in rows if gg == g]) for g in (0, 1, 2)
    }
    for nparts in (1, 32):
        got = {
            r["g"]: r["est"]
            for r in approx_distinct(df.repartition(nparts), ["g"], "v").collect()
        }
        assert got == want, f"nparts={nparts}"


def test_approx_distinct_accuracy_bands(spark):
    """Relative error within 3 sigma (1.04/sqrt(m)) across regimes —
    consecutive ids (the adversarial-lattice case the Feistel exists for),
    strided ids, and large-n."""
    from nido_spark.relational import approx_distinct

    cases = [
        (list(range(150)), 150),
        (list(range(0, 97 * 3000, 97)), 3000),
        ([i * 1000003 % (1 << 45) for i in range(20000)], 20000),
    ]
    for vals, exact in cases:
        df = spark.createDataFrame([(v,) for v in vals], "v long").withColumn(
            "g", __import__("pyspark.sql.functions", fromlist=["lit"]).lit(1)
        )
        est = approx_distinct(df, ["g"], "v").collect()[0]["est"]
        tol = 3 * 1.04 / (512 ** 0.5)
        assert abs(est / exact - 1) < max(tol, 0.05), (exact, est)


def test_approx_distinct_b_contract(spark):
    import pytest as _pt

    from nido_spark.relational import approx_distinct

    df = spark.createDataFrame([(1, 1)], "g int, v long")
    with _pt.raises(ValueError):
        approx_distinct(df, ["g"], "v", b=3)


# ---------------------------------------------------------------------------
# interval_join (bucketized range join)
# ---------------------------------------------------------------------------


def test_interval_join_matches_bruteforce_any_bucket(spark):
    """Exact pair-set equality with the O(n^2) filter join, across bucket
    widths spanning 'interval >> bucket' to 'interval << bucket' — the
    owner-bucket dedup must emit each pair exactly once."""
    import random

    from nido_spark.relational import interval_join

    rng = random.Random(11)
    us = 1_000_000
    ivals = [
        (i, rng.randrange(0, 4000) * us, 0)
        for i in range(300)
    ]
    ivals = [(i, s, s + rng.randrange(0, 900) * us) for i, s, _ in ivals]
    df = spark.createDataFrame(ivals, "id long, s long, e long")
    brute = {
        (a[0], b[0])
        for a in ivals
        for b in ivals
        if a[1] <= b[2] and b[1] <= a[2]
    }
    for bsec in (60, 600, 7200):
        got = {
            (r["id"], r["id_r"])
            for r in interval_join(
                df, df, "s", "e", "s", "e", bucket_seconds=bsec
            ).collect()
        }
        assert got == brute, f"bucket_seconds={bsec}"


def test_interval_join_point_in_interval(spark):
    from nido_spark.relational import interval_join

    us = 1_000_000
    pts = spark.createDataFrame(
        [(1, 100 * us), (2, 250 * us), (3, 999 * us)], "pid long, t long"
    )
    ivs = spark.createDataFrame(
        [(10, 50 * us, 150 * us), (11, 240 * us, 260 * us)],
        "iid long, s long, e long",
    )
    got = {
        (r["pid"], r["iid"])
        for r in interval_join(
            pts, ivs, "t", "t", "s", "e", bucket_seconds=30
        ).collect()
    }
    assert got == {(1, 10), (2, 11)}


def test_interval_join_inverted_and_null_never_match(spark):
    from nido_spark.relational import interval_join

    a = spark.createDataFrame(
        [(1, 100, 50), (2, None, 200), (3, 100, 200)], "id long, s long, e long"
    )
    b = spark.createDataFrame([(9, 0, 1_000_000_000)], "id long, s long, e long")
    got = {
        r["id"]
        for r in interval_join(a, b, "s", "e", "s", "e", bucket_seconds=1).collect()
    }
    assert got == {3}


def test_interval_join_span_guard_raises(spark):
    import pytest as _pt

    from nido_spark.relational import interval_join

    us = 1_000_000
    a = spark.createDataFrame([(1, 0, 10_000_000 * us)], "id long, s long, e long")
    with _pt.raises(Exception, match="interval_join"):
        interval_join(
            a, a, "s", "e", "s", "e", bucket_seconds=1, max_buckets_per_row=1000
        ).count()


def test_count_min_one_sided_and_collisions(spark):
    """CMS guarantee: est >= true count for EVERY key, for any
    partitioning; with b=4 (16 registers) over 40 distinct keys
    collisions are forced, so at least one key must strictly
    over-count — pinning that the sketch is genuinely lossy, not an
    exact count in disguise."""
    import random
    from collections import Counter

    from nido_spark.relational import count_min_query, count_min_sketch

    rng = random.Random(11)
    keys = [rng.randrange(40) for _ in range(3000)]
    true = Counter(keys)
    df = spark.createDataFrame([(x,) for x in keys], "k long")
    for nparts in (1, 13):
        sk = count_min_sketch(df.repartition(nparts), "k", d=3, b=4, seed=5)
        got = {
            r["k"]: r["est"]
            for r in count_min_query(sk, df, "k", d=3, b=4, seed=5).collect()
        }
        assert set(got) == set(true)
        assert all(got[k] >= true[k] for k in true)
        assert any(got[k] > true[k] for k in true), "b=4 must collide"


def test_count_min_absent_and_null_keys(spark):
    """Keys absent from the data estimate via untouched-register zeros
    (possibly inflated by collisions, never negative); NULLs are ignored
    on both build and query sides; registers never exceed d*2^b rows."""
    from nido_spark.relational import count_min_query, count_min_sketch

    df = spark.createDataFrame([(1,)] * 10 + [(2,)] * 5 + [(None,)] * 3, "k long")
    sk = count_min_sketch(df, "k", d=4, b=12, seed=42)
    assert sk.count() <= 4 * (1 << 12)
    probe = spark.createDataFrame([(1,), (2,), (999_999,), (None,)], "k long")
    got = {
        r["k"]: r["est"]
        for r in count_min_query(sk, probe, "k", d=4, b=12, seed=42).collect()
    }
    assert got[1] == 10 and got[2] == 5
    assert got[999_999] == 0  # 4096 buckets, 2 keys: no collision
    assert None not in got


def test_count_min_params_validated(spark):
    import pytest as _pt

    from nido_spark.relational import count_min_sketch

    df = spark.createDataFrame([(1,)], "k long")
    with _pt.raises(ValueError):
        count_min_sketch(df, "k", d=0)
    with _pt.raises(ValueError):
        count_min_sketch(df, "k", b=3)


def test_bloom_semi_join_exact_equals_plain_semi(spark):
    """exact=True output == the plain left_semi join, for any
    partitioning and for probe values far outside the key range
    (negative, huge) — the Bloom pass must be output-invisible."""
    import random

    from nido_spark.relational import bloom_semi_join

    rng = random.Random(3)
    vals = [rng.randrange(-1000, 1000) * 9999 for _ in range(2000)] + [None] * 5
    keyset = sorted({v for v in vals[:200] if v is not None})
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, v long")
    keys = spark.createDataFrame([(x,) for x in keyset], "v long")
    want = {
        (r["i"], r["v"])
        for r in df.join(keys, "v", "left_semi").select("i", "v").collect()
    }
    for nparts in (1, 11):
        got = {
            (r["i"], r["v"])
            for r in bloom_semi_join(df.repartition(nparts), "v", keys)
            .select("i", "v")
            .collect()
        }
        assert got == want, f"nparts={nparts}"


def test_bloom_prefilter_superset_and_no_false_negatives(spark):
    """exact=False returns a SUPERSET of the true members (never drops a
    member), and with b=22/k=4 over a tiny key set it should pass
    nothing else here (fp ~ 1e-6)."""
    from nido_spark.relational import bloom_semi_join

    df = spark.createDataFrame([(v,) for v in range(10_000)], "v long")
    keys = spark.createDataFrame([(v,) for v in range(0, 10_000, 500)], "v long")
    got = {r["v"] for r in bloom_semi_join(df, "v", keys, exact=False).collect()}
    member = set(range(0, 10_000, 500))
    assert member <= got
    assert len(got) <= len(member) + 2  # fp budget at these sizes


def test_bloom_bits_word_bound_and_params(spark):
    import pytest as _pt

    from nido_spark.relational import bloom_bits

    keys = spark.createDataFrame([(v,) for v in range(100)], "v long")
    wt = bloom_bits(keys, "v", b=10, k=3)
    rows = wt.collect()
    assert len(rows) <= 1 << (10 - 6)
    assert all(r["bits"] != 0 for r in rows)
    with _pt.raises(ValueError):
        bloom_bits(keys, "v", b=40)
    with _pt.raises(ValueError):
        bloom_bits(keys, "v", k=0)


def test_response_latency_exact_quantiles_random_gaps(spark):
    """Per-role-pair p50/p95 match a pure-Python PERCENTILE_DISC replay
    over RANDOM turn gaps (the driver fixture's gaps are constant, so
    the quantile machinery is only exercised here), and the mean is the
    exact integer-sum mean."""
    import math
    import random

    from nido_spark.conversation import response_latency

    rng = random.Random(31)
    rows = []
    for c in range(40):
        t = rng.randrange(10**9)
        roles = ["user"]
        while len(roles) < rng.randrange(3, 12):
            roles.append("assistant" if roles[-1] != "assistant" else
                         rng.choice(["user", "tool"]))
        for i, r in enumerate(roles):
            rows.append((f"c{c}", i, r, t))
            if i + 1 < len(roles):
                t += rng.randrange(1, 10**7)
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, us long"
    ).selectExpr("conv_id", "turn_idx", "role", "timestamp_micros(us) AS ts")
    got = {
        (r["from_role"], r["to_role"]): r
        for r in response_latency(df).collect()
    }
    want = {}
    by_conv = {}
    for conv, i, role, us in rows:
        by_conv.setdefault(conv, []).append((i, role, us))
    for conv, ts in by_conv.items():
        ts.sort()
        for (i, r1, u1), (_, r2, u2) in zip(ts, ts[1:]):
            want.setdefault((r1, r2), []).append(u2 - u1)
    assert set(got) == set(want)
    for pair, gaps in want.items():
        gaps.sort()
        n = len(gaps)
        def pdisc(p):
            for idx, g in enumerate(gaps, 1):
                if idx / n >= p:
                    return g
        row = got[pair]
        assert row["n"] == n
        assert row["p50_us"] == pdisc(0.5), pair
        assert row["p95_us"] == pdisc(0.95), pair
        assert math.isclose(row["mean_us"], round(sum(gaps) / n, 9),
                            rel_tol=0, abs_tol=1e-9)


def test_association_rules_hand_case(spark):
    """Exact counts + support/confidence/lift on a 4-basket fixture, and
    the hub-cap exclusion semantics (a key above the cap vanishes from
    pair counts AND marginals)."""
    from nido_spark.relational import association_rules

    rows = [("k1", "a"), ("k1", "b"), ("k1", "c"), ("k2", "a"),
            ("k2", "b"), ("k3", "a"), ("k3", "c"), ("k4", "d"),
            ("k2", "a")]  # duplicate membership collapses
    df = spark.createDataFrame(rows, "key string, item string")
    out = {(r["a"], r["b"]): r for r in association_rules(df).collect()}
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    r = out[("a", "b")]
    # n = 4 baskets; a in 3, b in 2, both in 2
    assert (r["n_ab"], r["n_a"], r["n_b"]) == (2, 3, 2)
    assert r["support"] == round(2 / 4, 9)
    assert r["conf_a_b"] == round(2 / 3, 9)
    assert r["conf_b_a"] == round(2 / 2, 9)
    assert r["lift"] == round((2 * 4) / (3 * 2), 9)

    # cap 2: k1 (3 distinct items) is excluded everywhere -> only the
    # 2-item baskets contribute; marginals shrink consistently
    capped = {(r["a"], r["b"]): r
              for r in association_rules(df, max_items_per_key=2).collect()}
    assert set(capped) == {("a", "b"), ("a", "c")}
    r2 = capped[("a", "b")]
    assert (r2["n_ab"], r2["n_a"], r2["n_b"]) == (1, 2, 1)
    assert r2["lift"] == round((1 * 3) / (2 * 1), 9)  # n drops to 3 keys

    # min_pair_keys prunes the tail
    pruned = association_rules(df, min_pair_keys=2).collect()
    assert {(r["a"], r["b"]) for r in pruned} == {("a", "b"), ("a", "c")}
