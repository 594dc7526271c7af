"""Sessionization (gaps-and-islands) over an event stream.

The reference's trades table is stream-shaped (SURVEY.md §1.1) but the
reference itself is batch-only; sessionization is part of the analytic
surface we add (§2G q14).  Batch formulation is gaps-and-islands —
``lag`` + running sum of "new session" flags — chosen over
``session_window()`` because it is expressible in ANSI SQL for the
DuckDB oracle; the streaming twin (``streaming/sessions.py``) uses
``session_window`` + watermark.

Scale: one shuffle on the key; two window passes over the same
partitioning (Catalyst reuses the exchange) + a final hash agg on
(key, session_id) that also reuses it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    *,
    key: str,
    ts: str,
    gap: str = "30 minutes",
) -> DataFrame:
    """Assign session ids: a new session starts when the gap since the
    key's previous event exceeds ``gap``.

    Returns the input columns plus ``session_id`` (1-based per key).
    Comparison is done in pure timestamp arithmetic (``ts > prev_ts +
    INTERVAL gap``) — exact to the microsecond, no epoch casts.
    """
    w = Window.partitionBy(key).orderBy(ts)
    prev_ts = F.lag(F.col(ts)).over(w)
    new_session = F.when(
        prev_ts.isNull() | (F.col(ts) > prev_ts + F.expr(f"INTERVAL {gap}")), 1
    ).otherwise(0)
    run = Window.partitionBy(key).orderBy(ts).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn(
        "session_id", F.sum(new_session).over(run).cast("long")
    )


def session_summary(
    events: DataFrame,
    *,
    key: str,
    ts: str,
    gap: str = "30 minutes",
) -> DataFrame:
    """Per-session rollup: start, end, event count."""
    return (
        sessionize(events, key=key, ts=ts, gap=gap)
        .groupBy(key, "session_id")
        .agg(
            F.min(ts).alias("session_start"),
            F.max(ts).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
