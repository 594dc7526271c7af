"""Skew-safe trailing RANGE windows: the bucket-doubling pre-split.

A per-row trailing time-window aggregate (``RANGE BETWEEN -(W-1)
AND CURRENT ROW`` over an epoch column) partitions by key alone, so a
hot key's entire history sorts and evaluates in ONE task — measured
35.3x hot-over-uniform at skew10 for q41 (SKEW_STRESS.json, round 11,
honest forcing; the largest skew ratio this engine has recorded).

The fix exploits that the FRAME LENGTH EQUALS THE BUCKET WIDTH: bucket
time into windows of exactly W, and a row's trailing frame can only
reach rows in its own bucket B and the previous bucket B-1 (lower
bound t-W+1 > start(B) - W >= start(B-1)).  So:

  1. every row is emitted twice — tagged OWN into its bucket B, and
     tagged SPILL into bucket B+1;
  2. the SAME range window runs per (key, bucket) partition — each
     partition holds B's own rows plus B-1's spill rows, every
     physical row at most once, so the frame contents for an own row
     are IDENTICAL to the single-pass window's;
  3. only own-tagged output rows are kept.

Cost: 2x row duplication through one exchange, full parallelism over
(key x buckets) — the hot key's sort spreads over |buckets| tasks.
Output is bit-identical (tests/test_rangewindow.py pins equality on
random data, exact bucket-boundary rows, NULL keys).

NULL order values are routed to the single-pass branch by the
adaptive dispatcher: Spark gives a NULL-ordered row a frame of the
key's other NULL rows only, and duplicating NULLs (floor(NULL)+1 is
still NULL) would double that frame — the split keeps them in a plain
per-key window whose partition holds exactly the key's NULL rows,
preserving the frame group.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.window import WindowSpec

#: dispatch floor for RANGE-frame windows — measured ~21 µs/row of
#: single-task frame evaluation (65 s for a 3M-row key, 8.7 s for
#: 300k), ~10x the per-row cost of the cheap windows sessionize's
#: 1M-row default floor was calibrated on; the pre-split's fixed
#: overhead (~1-2 s probe + duplication) breaks even near 100k rows
RANGE_HOT_MIN_ROWS = 100_000


def _plain(
    df: DataFrame,
    *,
    key: str,
    order_us: str,
    window_us: int,
    agg_builder: Callable[[WindowSpec], list[Column]],
) -> DataFrame:
    w = (
        Window.partitionBy(key)
        .orderBy(order_us)
        .rangeBetween(-(window_us - 1), Window.currentRow)
    )
    return df.select(*[F.col(c) for c in df.columns], *agg_builder(w))


def trailing_range_window_skew_safe(
    df: DataFrame,
    *,
    key: str,
    order_us: str,
    window_us: int,
    agg_builder: Callable[[WindowSpec], list[Column]],
) -> DataFrame:
    """Bucket-doubled trailing range window (see module docstring).
    ``df`` must have non-NULL ``order_us`` (the adaptive dispatcher
    guarantees it); ``agg_builder`` maps a WindowSpec to the aggregate
    columns, so callers express exactly the expressions they would
    put over the plain window."""
    b = F.floor(F.col(order_us) / F.lit(window_us))
    own = df.withColumn("__b", b).withColumn("__own", F.lit(True))
    spill = df.withColumn("__b", b + 1).withColumn("__own", F.lit(False))
    both = own.unionByName(spill)
    w = (
        Window.partitionBy(key, "__b")
        .orderBy(order_us)
        .rangeBetween(-(window_us - 1), Window.currentRow)
    )
    out = both.select(
        *[F.col(c) for c in df.columns], "__own", *agg_builder(w)
    )
    return out.filter(F.col("__own")).drop("__own")


def trailing_range_window_adaptive(
    df: DataFrame,
    *,
    key: str,
    order_us: str,
    window_us: int,
    agg_builder: Callable[[WindowSpec], list[Column]],
) -> DataFrame:
    """PER-KEY adaptive dispatch, same probe as sessionize: keys whose
    row count would straggle the single-task sort run the bucket-
    doubled pre-split; everything else (plus all NULL-ordered rows and
    NULL keys) keeps the plain per-key window.  Branches are disjoint
    by (key, order-NULLness) and bit-identical per row, so the
    dispatch is invisible to correctness — oracle SQL unchanged."""
    from .sessionize import _split_by_keys, hot_keys

    kw = dict(
        key=key, order_us=order_us, window_us=window_us, agg_builder=agg_builder
    )
    hk = hot_keys(df, key, min_rows=RANGE_HOT_MIN_ROWS)
    if not hk:
        return _plain(df, **kw)
    hot, cold = _split_by_keys(df, key, hk)
    hot_null = hot.filter(F.col(order_us).isNull())
    hot = hot.filter(F.col(order_us).isNotNull())
    return (
        _plain(cold, **kw)
        .unionByName(_plain(hot_null, **kw))
        .unionByName(trailing_range_window_skew_safe(hot, **kw))
    )


# ---------------------------------------------------------------------
# Skew-safe LOCF (last non-null IGNORE NULLS over an unbounded-
# preceding frame) + first-non-null per-key scalar — q115's shape.
# An unbounded frame cannot bucket-double (it is not length-bounded);
# instead the carry is EXPLICIT: local LOCF per (key, time-bucket),
# then one "last non-null value" row per (key, bucket) chains through
# a tiny per-key window (|buckets| rows), and rows coalesce their
# local LOCF with the previous bucket's carry.  NULL timestamps all
# fall into the NULL bucket, which the carry chain orders FIRST —
# exactly where the plain window's NULLS-FIRST sort puts those rows.
# ---------------------------------------------------------------------

#: sentinel for ordering NULL timestamps inside comparison structs —
#: paired with a leading is-not-null flag, so its VALUE never decides
#: an ordering between a null and a non-null timestamp
_TS_SENTINEL = "1900-01-01 00:00:00"


def _order_struct(ts: str, tiebreak: str, val: Column) -> Column:
    """Comparison struct replicating (ts ASC NULLS FIRST, tiebreak):
    a leading not-null flag (False < True puts NULL ts first), the
    null-coalesced ts, the tiebreak, and the value payload last."""
    return F.struct(
        F.col(ts).isNotNull().alias("f"),
        F.coalesce(F.col(ts), F.lit(_TS_SENTINEL).cast("timestamp_ntz")).alias(
            "t"
        ),
        F.col(tiebreak).alias("k"),
        val.alias("v"),
    )


def locf_first_skew_safe(
    df: DataFrame,
    *,
    key: str,
    ts: str,
    tiebreak: str,
    val: Column,
    bucket_us: int,
    last_alias: str = "__last",
    first_alias: str = "__first",
) -> DataFrame:
    """Per-row last-non-null ``val`` over (ts, tiebreak) order and the
    per-key first-non-null ``val`` — output-identical to the plain
    IGNORE-NULLS window pair, with the hot key's sort spread over
    |buckets| tasks.  Appends ``last_alias``/``first_alias``."""
    e = df.withColumn("__v", val).withColumn(
        "__b",
        F.floor(
            F.unix_micros(F.col(ts).cast("timestamp")) / F.lit(bucket_us)
        ),
    )
    wb = (
        Window.partitionBy(key, "__b")
        .orderBy(F.col(ts).asc_nulls_first(), tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    e = e.withColumn("__loc", F.last("__v", ignorenulls=True).over(wb))
    # one row per (key, bucket): the bucket's last non-null value in
    # order — combinable max over the order struct
    summary = e.groupBy(key, "__b").agg(
        F.max(F.when(F.col("__v").isNotNull(), _order_struct(ts, tiebreak, F.col("__v"))))
        .alias("__s")
    )
    wc = Window.partitionBy(key).orderBy(F.col("__b").asc_nulls_first())
    run = wc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    carry = summary.select(
        key,
        "__b",
        F.lag(
            F.last(F.col("__s.v"), ignorenulls=True).over(run)
        ).over(wc).alias("__carry"),
    )
    # per-key first non-null value — combinable min over the same struct
    firsts = e.groupBy(key).agg(
        F.min(F.when(F.col("__v").isNotNull(), _order_struct(ts, tiebreak, F.col("__v"))))
        .getField("v")
        .alias(first_alias)
    )
    # NULL-SAFE bucket join: the NULL-ts bucket's rows must still meet
    # their carry row (plain equality on a NULL __b matches nothing);
    # the key itself is non-null in the hot branch (isin-routed)
    carry = carry.withColumnRenamed(key, "__ck").withColumnRenamed(
        "__b", "__cb"
    )
    # carry is |hot keys x buckets| rows and firsts |hot keys| rows —
    # broadcast both so the event stream never re-shuffles for the
    # join-backs (the window's (key, bucket) exchange stays the only
    # full-data shuffle)
    return (
        e.join(
            F.broadcast(carry),
            (F.col(key) == F.col("__ck"))
            & F.col("__b").eqNullSafe(F.col("__cb")),
        )
        .join(F.broadcast(firsts), key)
        .withColumn(last_alias, F.coalesce("__loc", "__carry"))
        .drop("__v", "__b", "__loc", "__carry", "__ck", "__cb")
    )


def locf_first_adaptive(
    df: DataFrame,
    *,
    key: str,
    ts: str,
    tiebreak: str,
    val: Column,
    bucket_us: int,
    last_alias: str = "__last",
    first_alias: str = "__first",
) -> DataFrame:
    """PER-KEY adaptive dispatch for the LOCF/first pair: hot keys run
    the bucket-carry pre-split, everything else keeps the plain
    two-window form (one exchange, strictly cheaper when no key can
    straggle).  Output-identical per key; oracle SQL unchanged."""
    from .sessionize import _split_by_keys, hot_keys

    kw = dict(
        key=key, ts=ts, tiebreak=tiebreak, val=val, bucket_us=bucket_us,
        last_alias=last_alias, first_alias=first_alias,
    )

    def plain(d: DataFrame) -> DataFrame:
        running = (
            Window.partitionBy(key)
            .orderBy(F.col(ts).asc_nulls_first(), tiebreak)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        full = (
            Window.partitionBy(key)
            .orderBy(F.col(ts).asc_nulls_first(), tiebreak)
            .rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        return d.select(
            *[F.col(c) for c in d.columns],
            F.last(val, ignorenulls=True).over(running).alias(last_alias),
            F.first(val, ignorenulls=True).over(full).alias(first_alias),
        )

    hk = hot_keys(df, key)
    if not hk:
        return plain(df)
    hot, cold = _split_by_keys(df, key, hk)
    return plain(cold).unionByName(
        locf_first_skew_safe(hot, **kw).select(
            *[F.col(c) for c in df.columns], last_alias, first_alias
        )
    )
