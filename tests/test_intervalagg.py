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
