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
    hk = hot_keys(df, key)
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
