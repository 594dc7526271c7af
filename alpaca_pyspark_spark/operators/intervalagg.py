"""Hierarchical interval-aggregation decomposition — the skew-safe
form of the per-anchor time-window aggregate (q03's shape: for each
anchor row, COUNT/SUM over the same key's events inside a fixed
trailing/leading interval).

The naive plan is an equality + interval theta join that MATERIALIZES
every (anchor, event) pair before aggregating.  On a hot key that is
O(anchors_hot × events_hot_per_window) — the one shape the round-9
skew study had to EXCLUDE from measurement because a 30%-hot key
yields ~1.5B pairs at sf1 (SCALE.md:519-528): not a straggler you
wait out, an intermediate you cannot afford at any parallelism.

The decomposition is the classic segment-tree/odometer argument: a
fixed-length window (s, s + L] tiles EXACTLY into
  - full HOURS strictly inside the window,
  - full MINUTES covering the partial first/last hours,
  - raw EVENTS in the two partial boundary minutes,
so a COUNT/SUM decomposes into three strata, each an EQUI join:

  1. events pre-aggregate once per (key, hour)  — combinable, skew-
     immune (map-side partials), reused by every anchor;
  2. events pre-aggregate once per (key, minute) — ditto;
  3. anchors explode to their ~23 hour keys + ≤118 minute keys +
     2 boundary-minute keys (a ~280-row fan-out PER ANCHOR, constant
     in data volume) and hash-join the pre-aggregates on
     (key, bucket) — the hot key's buckets spread over the hash
     space, so no task sees more than one bucket's slice.

Every stratum sums exact integers (counts and cent-sums), so the
result is bit-identical to the naive pair join at any execution order
— the oracle SQL is UNCHANGED.

Cost per anchor: ~280 joined rows + |events in 2 boundary minutes|,
versus |events in the window| for the naive join.  At a 30%-hot sf10
key that is ~280 + ~140 vs ~72,000 — the difference between an
un-runnable 3.6e10-pair shuffle and a ~1e8-row hash join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HOUR = 3600
MINUTE = 60


def _epoch(col: Column) -> Column:
    """Exact epoch seconds (truncated) of a timestamp[_ntz] column —
    session tz is pinned UTC (session.py), so this is a linear map."""
    return col.cast("timestamp").cast("long")


def trailing_interval_agg(
    anchors: DataFrame,
    events: DataFrame,
    *,
    key: str,
    anchor_ts: str = "s_ts",
    event_ts: str = "f_ts",
    window_seconds: int = 86400,
    sum_col: str = "__cents",
    count_alias: str = "n_follow",
    sum_alias: str = "sum_cents",
) -> DataFrame:
    """For each anchor row: COUNT(events) and SUM(events.sum_col) over
    the same ``key``'s events with ``anchor_ts < event_ts <=
    anchor_ts + window_seconds``, WITHOUT materializing the pairs.

    ``anchors`` must carry ``key``, ``anchor_ts`` and any pass-through
    columns (all preserved); ``events`` must carry ``key``,
    ``event_ts`` and integer ``sum_col``.  ``window_seconds`` must be
    a multiple of one hour (the tiling bottoms out at minutes).
    Returns one row per anchor with ``count_alias``/``sum_alias``
    (sum is NULL when the window is empty, like the naive LEFT join).
    """
    if window_seconds % HOUR != 0:
        raise ValueError("window_seconds must be a whole number of hours")
    n_hours = window_seconds // HOUR

    ev = events.select(
        F.col(key).alias("__k"),
        _epoch(F.col(event_ts)).alias("__es"),
        F.col(event_ts).alias("__ets"),
        F.col(sum_col).alias("__v"),
    )
    # floor (not long-cast truncation) so bucket indices stay
    # consistent for any epoch sign
    by_hour = ev.groupBy(
        "__k", F.floor(F.col("__es") / HOUR).alias("__h")
    ).agg(F.count(F.lit(1)).alias("__n"), F.sum("__v").alias("__s"))
    by_minute = ev.groupBy(
        "__k", F.floor(F.col("__es") / MINUTE).alias("__m")
    ).agg(F.count(F.lit(1)).alias("__n"), F.sum("__v").alias("__s"))

    a = anchors.select(
        "*",
        F.col(key).alias("__k"),
        _epoch(F.col(anchor_ts)).alias("__as"),
    )
    # minute/hour coordinates of the window (s, s+L]:
    #   m_lo = minute(s)           — partial: events with ts > s
    #   m_hi = m_lo + L/60         — partial: events with ts <= s+L
    #   full minutes (m_lo, m_hi) exclusive, EXCEPT those inside a
    #   full hour; full hours are (h_lo, h_hi) exclusive where
    #   h_lo = hour(s), h_hi = h_lo + L/3600.
    a = (
        a.withColumn("__m_lo", F.floor(F.col("__as") / MINUTE))
        .withColumn("__m_hi", F.col("__m_lo") + window_seconds // MINUTE)
        .withColumn("__h_lo", F.floor(F.col("__as") / HOUR))
        .withColumn("__h_hi", F.col("__h_lo") + n_hours)
    )

    akey = [F.col(c) for c in anchors.columns]

    def _seq(lo: Column, hi: Column) -> Column:
        # sequence() is inclusive AND generates a DESCENDING range
        # when lo > hi — an empty tiling stratum (anchor on an exact
        # hour/minute) must emit nothing, not a reversed range
        return F.when(lo <= hi, F.sequence(lo, hi)).otherwise(
            F.array().cast("array<bigint>")
        )

    # stratum 1: full hours strictly inside the window
    hours = a.select(
        *akey,
        "__k",
        F.explode(
            _seq(F.col("__h_lo") + 1, F.col("__h_hi") - 1)
        ).alias("__h"),
    ).join(by_hour, ["__k", "__h"])
    # stratum 2: full minutes covering the two partial hours — from
    # m_lo+1 to the end of hour h_lo, and from the start of hour h_hi
    # to m_hi-1
    head = a.select(
        *akey,
        "__k",
        F.explode(
            _seq(
                F.col("__m_lo") + 1,
                (F.col("__h_lo") + 1) * (HOUR // MINUTE) - 1,
            )
        ).alias("__m"),
    )
    tail = a.select(
        *akey,
        "__k",
        F.explode(
            _seq(F.col("__h_hi") * (HOUR // MINUTE), F.col("__m_hi") - 1)
        ).alias("__m"),
    )
    minutes = head.unionByName(tail).join(by_minute, ["__k", "__m"])
    # stratum 3: exact events in the two boundary minutes
    edges = (
        a.select(
            *akey,
            "__k",
            F.explode(F.array("__m_lo", "__m_hi")).alias("__m"),
        )
        .join(
            ev.withColumn("__m", F.floor(F.col("__es") / MINUTE)),
            ["__k", "__m"],
        )
        .filter(
            (F.col("__ets") > F.col(anchor_ts))
            & (
                F.col("__ets")
                <= F.col(anchor_ts)
                + F.expr(f"INTERVAL {window_seconds} SECONDS")
            )
        )
        .groupBy(*akey)
        .agg(F.count(F.lit(1)).alias("__n"), F.sum("__v").alias("__s"))
    )

    full = hours.select(*akey, "__n", "__s").unionByName(
        minutes.select(*akey, "__n", "__s")
    )
    strata = full.unionByName(edges.select(*akey, "__n", "__s"))
    per_anchor = strata.groupBy(*akey).agg(
        F.sum("__n").alias("__n_all"), F.sum("__s").alias("__s_all")
    )
    # LEFT semantics: anchors with zero window events keep count 0 and
    # a NULL sum, exactly like the naive LEFT join + count/sum.  The
    # join back is NULL-SAFE per column: a NULL payload column (e.g. a
    # NULL anchor id) groups fine in the strata aggregate, and a plain
    # equality join would silently drop its counts to zero.  Contract:
    # anchor ROWS must be unique — duplicate anchors would each carry
    # the merged group's total (the naive groupBy emits one row).
    import functools

    per_anchor = per_anchor.alias("__pa")
    left = anchors.alias("__an")
    cond = functools.reduce(
        lambda x, y: x & y,
        [
            F.col(f"__an.{c}").eqNullSafe(F.col(f"__pa.{c}"))
            for c in anchors.columns
        ],
    )
    return (
        left.join(per_anchor, cond, "left")
        .select(
            *[F.col(f"__an.{c}") for c in anchors.columns],
            F.coalesce(F.col("__pa.__n_all"), F.lit(0))
            .cast("long")
            .alias(count_alias),
            F.col("__pa.__s_all").alias(sum_alias),
        )
    )
