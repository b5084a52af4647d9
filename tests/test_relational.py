from __future__ import annotations

from datetime import datetime

import pytest

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
