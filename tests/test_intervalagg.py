"""Hierarchical interval-aggregation decomposition
(operators/intervalagg.py) — must be OUTPUT-IDENTICAL to the naive
equality+interval pair join it replaces, including on anchors placed
exactly on bucket boundaries and windows that are empty or end exactly
on an event."""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from alpaca_pyspark_spark.operators.intervalagg import trailing_interval_agg

T0 = datetime(2024, 1, 1, 0, 0, 0)
DAY = 86400


def _naive(s, f, window_seconds):
    j = s.join(
        f,
        (s.user_id == f.user_id)
        & (F.col("f_ts") > F.col("s_ts"))
        & (
            F.col("f_ts")
            <= F.col("s_ts") + F.expr(f"INTERVAL {window_seconds} SECONDS")
        ),
        "left",
    )
    return j.groupBy(s.user_id, "signup_id").agg(
        F.count("f_id").alias("n_follow"), F.sum("__cents").alias("sum_cents")
    )


def _rows(df):
    return sorted(
        (r["user_id"], r["signup_id"], r["n_follow"], r["sum_cents"])
        for r in df.collect()
    )


def _frames(spark, anchors, events):
    s = spark.createDataFrame(
        anchors, "user_id long, signup_id long, s_ts timestamp_ntz"
    )
    f = spark.createDataFrame(
        events, "user_id long, f_id long, f_ts timestamp_ntz, __cents long"
    )
    return s, f


EDGE_ANCHORS = [
    (1, 100, datetime(2024, 1, 1, 2, 0, 0)),        # exactly on an hour
    (1, 101, datetime(2024, 1, 1, 2, 15, 0)),       # exactly on a minute
    (1, 102, datetime(2024, 1, 1, 2, 15, 30, 500)), # sub-second offset
    (2, 200, datetime(2024, 1, 1, 23, 59, 59)),     # end-of-day straddle
    (3, 300, T0),                                   # empty window (no events)
]
EDGE_EVENTS = [
    (1, 1, datetime(2024, 1, 1, 2, 0, 0), 10),       # AT anchor 100 -> excluded (strict >)
    (1, 2, datetime(2024, 1, 1, 2, 0, 0, 1), 20),    # 1 us after -> included
    (1, 3, datetime(2024, 1, 2, 2, 0, 0), 30),       # exactly window end -> included
    (1, 4, datetime(2024, 1, 2, 2, 0, 0, 1), 40),    # 1 us past end -> excluded
    (1, 5, datetime(2024, 1, 1, 14, 30, 0), 50),     # mid-window full hour
    (1, 6, datetime(2024, 1, 1, 2, 59, 59, 999999), 60),  # last us of partial hour
    (2, 7, datetime(2024, 1, 2, 23, 59, 58), 70),    # inside straddle window
    (2, 8, datetime(2024, 1, 1, 23, 59, 59), 80),    # AT anchor 200 -> excluded
]


def test_decomposed_equals_naive_on_edges(spark):
    s, f = _frames(spark, EDGE_ANCHORS, EDGE_EVENTS)
    dec = trailing_interval_agg(
        s, f, key="user_id", anchor_ts="s_ts", event_ts="f_ts",
        window_seconds=DAY, sum_col="__cents",
    ).select("user_id", "signup_id", "n_follow", "sum_cents")
    assert _rows(dec) == _rows(_naive(s, f, DAY))
    got = {r[1]: (r[2], r[3]) for r in _rows(dec)}
    assert got[100] == (4, 160)   # events 2,3,5,6 (AT-anchor + past-end out)
    assert got[300] == (0, None)  # empty window keeps LEFT semantics


@pytest.mark.parametrize("window_seconds", [3600, 7200, DAY])
def test_decomposed_equals_naive_random(spark, window_seconds):
    rng = random.Random(11)
    anchors, events, eid = [], [], 0
    for k in range(1, 6):
        for a in range(rng.randint(1, 6)):
            anchors.append(
                (k, k * 1000 + a, T0 + timedelta(seconds=rng.randint(0, 2 * DAY)))
            )
        for _ in range(rng.randint(20, 150)):
            eid += 1
            events.append(
                (k, eid, T0 + timedelta(seconds=rng.randint(0, 3 * DAY),
                                        microseconds=rng.randint(0, 999999)),
                 rng.randint(-500, 500))
            )
    s, f = _frames(spark, anchors, events)
    dec = trailing_interval_agg(
        s, f, key="user_id", anchor_ts="s_ts", event_ts="f_ts",
        window_seconds=window_seconds, sum_col="__cents",
    ).select("user_id", "signup_id", "n_follow", "sum_cents")
    assert _rows(dec) == _rows(_naive(s, f, window_seconds))


def test_non_hour_window_rejected(spark):
    s, f = _frames(spark, EDGE_ANCHORS[:1], EDGE_EVENTS[:1])
    with pytest.raises(ValueError, match="whole number of hours"):
        trailing_interval_agg(
            s, f, key="user_id", anchor_ts="s_ts", event_ts="f_ts",
            window_seconds=5400, sum_col="__cents",
        )


def test_adaptive_dispatch_matches_naive_both_regimes(spark, monkeypatch):
    """The per-key dispatch (VERDICT r10 item 5) must be invisible to
    correctness: with no hot key it IS the naive join; with a forced
    hot key the union of naive(cold) + decomposed(hot) matches the
    all-naive answer row for row."""
    from alpaca_pyspark_spark.operators import intervalagg as ia

    rng = random.Random(7)
    anchors, events, eid = [], [], 0
    for k in range(1, 5):
        for a in range(3):
            anchors.append(
                (k, k * 1000 + a, T0 + timedelta(seconds=rng.randint(0, DAY)))
            )
        n = 300 if k == 1 else 20  # key 1 is the forced-hot key
        for _ in range(n):
            eid += 1
            events.append(
                (k, eid, T0 + timedelta(seconds=rng.randint(0, 2 * DAY)),
                 rng.randint(-500, 500))
            )
    s, f = _frames(spark, anchors, events)
    fe = f.select("user_id", F.col("f_ts").alias("__pets"))
    want = _rows(_naive(s, f, DAY))
    kw = dict(key="user_id", anchor_ts="s_ts", event_ts="f_ts",
              window_seconds=DAY, sum_col="__cents")

    # real floor: no key comes near 1e12 estimated pairs
    assert ia._pair_hot_keys(s.select("user_id"), fe, "user_id", DAY) == []
    cold = ia.trailing_interval_agg_adaptive(s, f, **kw).select(
        "user_id", "signup_id", "n_follow", "sum_cents"
    )
    assert _rows(cold) == want

    # key 1: 3 anchors x 300 events x (1d window / 2d span) ~ 450 pairs
    monkeypatch.setattr(ia, "PAIR_FLOOR", 200)
    assert ia._pair_hot_keys(s.select("user_id"), fe, "user_id", DAY) == [1]
    hot = ia.trailing_interval_agg_adaptive(s, f, **kw).select(
        "user_id", "signup_id", "n_follow", "sum_cents"
    )
    assert _rows(hot) == want


def test_adaptive_rejects_bad_contract_upfront(spark):
    """Precondition violations must fail at plan time every time, not
    the first night a key runs hot: non-hour windows and non-UTC
    session tz raise even when no key is hot."""
    from alpaca_pyspark_spark.operators.intervalagg import (
        trailing_interval_agg_adaptive,
    )

    s, f = _frames(spark, EDGE_ANCHORS[:1], EDGE_EVENTS[:1])
    with pytest.raises(ValueError, match="whole number of hours"):
        trailing_interval_agg_adaptive(
            s, f, key="user_id", anchor_ts="s_ts", event_ts="f_ts",
            window_seconds=5400, sum_col="__cents",
        )
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        with pytest.raises(ValueError, match="UTC session"):
            trailing_interval_agg_adaptive(
                s, f, key="user_id", anchor_ts="s_ts", event_ts="f_ts",
                window_seconds=DAY, sum_col="__cents",
            )
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_non_utc_session_tz_rejected(spark):
    """The bucket tiling needs a linear ntz→epoch map; a DST-bearing
    session tz would shift the hour/minute strata by the offset change
    (ADVICE r10) — correctness, not performance, so it must raise."""
    s, f = _frames(spark, EDGE_ANCHORS[:1], EDGE_EVENTS[:1])
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        with pytest.raises(ValueError, match="UTC session timeZone"):
            trailing_interval_agg(
                s, f, key="user_id", anchor_ts="s_ts", event_ts="f_ts",
                window_seconds=DAY, sum_col="__cents",
            )
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_null_payload_column_keeps_counts(spark):
    """A NULL anchor payload column (e.g. a NULL id) must keep its
    window counts: the join-back is null-safe per column — a plain
    equality join would silently zero it while the naive groupBy
    aggregates it normally."""
    anchors = [(1, None, datetime(2024, 1, 1, 2, 0, 0))]
    events = [(1, 2, datetime(2024, 1, 1, 2, 0, 0, 1), 20)]
    s, f = _frames(spark, anchors, events)
    dec = trailing_interval_agg(
        s, f, key="user_id", anchor_ts="s_ts", event_ts="f_ts",
        window_seconds=DAY, sum_col="__cents",
    )
    rows = dec.collect()
    assert len(rows) == 1
    assert rows[0]["n_follow"] == 1 and rows[0]["sum_cents"] == 20
    assert _rows(dec.select("user_id", "signup_id", "n_follow", "sum_cents")) == _rows(_naive(s, f, DAY))


def test_duplicate_anchor_rows_diverge_as_documented(spark):
    """The anchor-uniqueness CONTRACT (ADVICE r11): on duplicate anchor
    ROWS the two branches legitimately diverge — naive_interval_agg's
    groupBy merges the duplicates into ONE output row, while the
    decomposition's null-safe join-back emits one row PER duplicate,
    each carrying the merged group's totals.  Pin that exact shape so
    the documented contract stays true (a silent convergence OR a new
    divergence mode would both invalidate the docstrings)."""
    from alpaca_pyspark_spark.operators.intervalagg import naive_interval_agg

    dup = datetime(2024, 1, 1, 2, 0, 0)
    anchors = [(1, 100, dup), (1, 100, dup)]  # identical rows
    events = [
        (1, 2, datetime(2024, 1, 1, 2, 0, 0, 1), 20),
        (1, 3, datetime(2024, 1, 1, 3, 0, 0), 5),
    ]
    s, f = _frames(spark, anchors, events)
    kw = dict(
        key="user_id", anchor_ts="s_ts", event_ts="f_ts",
        window_seconds=DAY, sum_col="__cents",
    )
    naive = naive_interval_agg(s, f, **kw).collect()
    dec = trailing_interval_agg(s, f, **kw).collect()
    assert len(naive) == 1  # groupBy merged the duplicates
    assert len(dec) == 2    # join-back emits one per duplicate
    # both agree on the merged group's totals per emitted row — and
    # those totals are DOUBLE-counted (each duplicate contributes its
    # own window pass to the merged group), a second reason duplicate
    # anchors are outside the contract
    for r in [*naive, *dec]:
        assert (r["n_follow"], r["sum_cents"]) == (4, 50)
