"""Skew-proof shuffles: salted aggregation and salted replicated join.

AQE's skew-join splitting (enabled in ``session.tune``) repairs skewed
SORT-MERGE joins at runtime, but two hot-key shapes remain that AQE
cannot fix:

1. **Low-cardinality / heavy-hitter aggregation** — ``groupBy(k)`` with
   3 distinct keys over 100 TB sends each key's entire mass to ONE
   reducer.  AQE can split skewed join partitions, not aggregation
   groups.  Fix: two-phase salted aggregation — group by
   ``(keys, salt)`` first (map-side-combinable, spreads each hot key
   over ``salt_parts`` reducers), then re-aggregate by ``keys`` over
   the tiny partial table.
2. **Hot probe keys in a shuffled hash join** when the build side is
   too large to broadcast — replicate the build side ``salt_parts``
   times and salt the probe side deterministically, so one hot key's
   rows land on ``salt_parts`` different reducers.

Both transforms are pure plan rewrites over built-ins: everything stays
in whole-stage codegen, and the salt column never reaches the output.
The salt is ``pmod(hash(salt_on...), salt_parts)`` — deterministic per
row (no ``rand()``: retries/speculative tasks must re-derive the same
salt or results are nondeterministic under failure).

The reference delegates all aggregation to Spark (SURVEY.md §2F); these
operators are the 100-TB hardening of that delegated surface.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def _salt_col(salt_on: Sequence[str], salt_parts: int) -> Column:
    # hash() never returns null (null input hashes to the seed), so the
    # salt is total; pmod keeps it in [0, salt_parts)
    return F.pmod(F.hash(*[F.col(c) for c in salt_on]), F.lit(salt_parts))


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    salt_on: Sequence[str],
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column],
    *,
    salt_parts: int = 32,
) -> DataFrame:
    """Two-phase skew-proof aggregation.

    ``partial_aggs`` run under ``groupBy(*keys, salt)`` — name each a
    decomposable piece (sum/count/min/max).  ``final_aggs`` run under
    ``groupBy(*keys)`` over those named partials (sum of sums, sum of
    counts, min of mins, ratios of summed pieces...).

    The first shuffle carries ``keys x salt_parts`` partial rows spread
    across ``salt_parts`` reducers per hot key; the second shuffle sees
    only ``|keys| x salt_parts`` rows — negligible at any scale.
    """
    salted = df.withColumn(SALT, _salt_col(salt_on, salt_parts))
    partial = salted.groupBy(*keys, SALT).agg(
        *[c.alias(n) for n, c in partial_aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[c.alias(n) for n, c in final_aggs.items()]
    )


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: Sequence[str],
    salt_on: Sequence[str],
    *,
    salt_parts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Replicated-build salted equi-join for hot probe keys.

    The build side is replicated ``salt_parts`` times (explode of a
    0..salt_parts-1 sequence); the probe side gets a deterministic salt
    from ``salt_on`` (probe-side columns OTHER than the join keys, so
    a hot key's rows scatter).  Joining on ``on + [salt]`` then spreads
    each hot key over ``salt_parts`` reducers at the cost of a
    ``salt_parts``x larger build side — use when the build side is too
    big to broadcast but small enough to replicate.

    ``how`` must be probe-side preserving (``inner``/``left``/
    ``left_semi``/``left_anti``): the build side is replicated
    ``salt_parts`` times, so a build-side-preserving join type would
    emit each unmatched build row once per replica (duplicates).
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "semi", "left_anti", "anti"):
        raise ValueError(
            "salted_join supports probe-side-preserving join types "
            "{'inner','left','left_semi','left_anti'}; got "
            f"{how!r} (the replicated build side would duplicate "
            "unmatched build rows under right/full outer joins)"
        )
    p = probe.withColumn(SALT, _salt_col(salt_on, salt_parts))
    b = build.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(salt_parts - 1)))
    )
    return p.join(b, [*on, SALT], how).drop(SALT)
