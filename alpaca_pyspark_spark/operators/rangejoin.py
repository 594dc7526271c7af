"""Bucketed range join: points x containing intervals WITHOUT an
equality key.

The reference's canonical interval join (USAGE.md:264-277, our
q03/q26) has a symbol equality key, so Catalyst plans a hash/SMJ with
the time predicate as a join filter — scalable.  Drop the equality key
(global outage windows, market-wide halts, calendar joins) and Spark's
only built-in plan is BroadcastNestedLoopJoin: every point row tested
against every interval — O(points x intervals), dead at scale.

The standard fix (DuckDB's range-join bucketing, Databricks' range
join hints) re-expressed in pure DataFrame ops: quantize time into
fixed buckets, explode each interval onto the buckets it covers, give
each point its single containing bucket, equi-join on the bucket id,
then apply the exact containment predicate.  Each matching (point,
interval) pair meets in exactly one bucket — the point's — so no
dedup is needed.  Cost: |intervals| x (span/bucket + 1) build rows and
a hash-partitioned shuffle join; pick ``bucket_seconds`` on the order
of the typical interval span.

Both sides truncate timestamps downward consistently, so containment
``start <= ts < end`` always implies the point's bucket lies within
the interval's exploded bucket range — candidates may be superfluous
(filtered exactly afterwards) but never missing.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKET = "__rj_bucket"


def _bucket_of(ts_col: Column, bucket_seconds: int) -> Column:
    # NTZ-safe under the engine's UTC session zone; truncation to whole
    # seconds is downward-consistent on both sides (see module doc)
    sec = F.unix_timestamp(ts_col.cast("timestamp"))
    return F.floor(sec / F.lit(bucket_seconds))


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    ts: str,
    start: str,
    end: str,
    bucket_seconds: int = 3600,
    keys: Sequence[str] = (),
    how: str = "inner",
) -> DataFrame:
    """Join each point (``ts``) to every interval containing it
    (``start <= ts < end``), as an equi-join on quantized time (+ any
    ``keys`` equality columns).  Output: point columns + interval
    columns, bucket column dropped.

    ``how`` may be ``inner`` or ``left``/``left_outer`` (point-side
    preserving: unmatched points survive with NULL interval columns).
    Interval-side-preserving types (``right``/``full``) are rejected:
    the build side is exploded onto one row per covered bucket, so an
    unmatched interval would be emitted once per bucket (duplicates).
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            "bucketed_range_join supports how in {'inner','left'}; "
            f"got {how!r} (exploded intervals would duplicate unmatched "
            "build rows under right/full outer joins)"
        )
    p = points.withColumn(_BUCKET, _bucket_of(F.col(ts), bucket_seconds))
    i = intervals.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                _bucket_of(F.col(start), bucket_seconds),
                _bucket_of(F.col(end), bucket_seconds),
            )
        ),
    )
    if how == "inner":
        joined = p.join(i, [*keys, _BUCKET], how)
        return joined.filter(
            (F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end))
        ).drop(_BUCKET)

    # Outer (point-preserving) path: the containment predicate must sit
    # INSIDE the join condition — applied as a post-join filter it would
    # silently drop the NULL-extended unmatched point rows.  Catalyst
    # still extracts the key/bucket equalities as the equi part, so the
    # physical plan stays a hash/SMJ with containment as a join filter.
    pa, ia = p.alias("__rj_p"), i.alias("__rj_i")
    cond = pa[_BUCKET] == ia[_BUCKET]
    for k in keys:
        cond = cond & (pa[k] == ia[k])
    cond = cond & (pa[ts] >= ia[start]) & (pa[ts] < ia[end])
    joined = pa.join(ia, cond, how)
    return joined.select(
        *[pa[c] for c in points.columns],
        *[ia[c] for c in intervals.columns if c not in keys],
    )
