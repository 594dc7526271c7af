"""NULL-semantics contracts, pinned at the unit level.

The full 217-query null-stress gate is the committed artifact
`ORACLE_NULLS_r9.json` (built via `tools/make_nullstress.py` +
`tools/driver_mimic.py`); these micro-tests pin the operator-level
fixes that sweep forced, so a regression fails in seconds:

- as-of join: a state row whose VALUE is NULL still matches (attach
  NULL), it must NOT fall back to an older state — the one-field
  struct wrap vs the bare ignorenulls fill (pandas.merge_asof /
  DuckDB ASOF semantics);
- bar construction drops unpriced ticks (Spark min_by keeps
  NULL-valued rows, SQL arg_min skips them — the filter makes the
  semantics engine-portable);
- sentinel post-filters use eqNullSafe (a plain != is three-valued
  and silently drops NULL-key rows).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from alpaca_pyspark_spark.operators.asof import asof_join
from alpaca_pyspark_spark.operators.bars import tumbling_bars_cents


def test_asof_null_state_value_matches_not_older(spark):
    probe = spark.createDataFrame(
        [("u", 10, datetime(2024, 1, 1, 12))], "k string, pid int, ts timestamp"
    )
    state = spark.createDataFrame(
        [
            ("u", datetime(2024, 1, 1, 9), 100.0),
            ("u", datetime(2024, 1, 1, 11), None),  # latest prior state
        ],
        "k string, ts timestamp, v double",
    )
    out = asof_join(
        probe,
        state.withColumnRenamed("ts", "sts"),
        on=["k"],
        probe_ts="ts",
        state_ts="sts",
        value_cols=["v"],
    ).collect()
    # the 11:00 state (v=NULL) is the match; 100.0 would mean the fill
    # silently skipped it and attached the 09:00 state
    assert len(out) == 1 and out[0]["v"] is None


def test_asof_no_state_yet_still_null(spark):
    probe = spark.createDataFrame(
        [("u", datetime(2024, 1, 1, 8))], "k string, ts timestamp"
    )
    state = spark.createDataFrame(
        [("u", datetime(2024, 1, 1, 9), 1.0)], "k string, sts timestamp, v double"
    )
    out = asof_join(
        probe, state, on=["k"], probe_ts="ts", state_ts="sts", value_cols=["v"]
    ).collect()
    assert len(out) == 1 and out[0]["v"] is None


def test_bars_drop_unpriced_ticks(spark):
    ticks = spark.createDataFrame(
        [
            ("s", datetime(2024, 1, 1, 1), None),
            ("s", datetime(2024, 1, 1, 2), 5.0),
            ("s", datetime(2024, 1, 1, 3), None),
        ],
        "sym string, ts timestamp, p double",
    )
    bars = tumbling_bars_cents(
        ticks, key="sym", ts="ts", price="p", interval="1 day"
    ).collect()
    assert len(bars) == 1
    b = bars[0]
    # a NULL-open (min_by picking the 01:00 unpriced tick) or volume 3
    # would mean NULL prices leaked into the bar
    assert b["open"] == 5.0 and b["close"] == 5.0 and b["volume"] == 1


def test_sentinel_filter_keeps_null_keys(spark):
    df = spark.createDataFrame(
        [("__sentinel",), ("click",), (None,)], "event_type string"
    )
    kept = df.filter(~F.col("event_type").eqNullSafe("__sentinel")).collect()
    assert {r["event_type"] for r in kept} == {"click", None}
    # the plain != contract this replaced drops the NULL row
    naive = df.filter(F.col("event_type") != "__sentinel").collect()
    assert {r["event_type"] for r in naive} == {"click"}
