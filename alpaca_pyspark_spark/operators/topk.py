"""Per-group top-k (the distributed ORDER BY ... LIMIT k per key).

Reference analog: ``sort`` + ``limit`` pushdown options (SURVEY.md §2D
D3/D4).  Global top-k is just ``orderBy().limit(k)`` (Spark's
TakeOrderedAndProject — no full sort materialized); per-group top-k is
two-phase: a local prune per scan partition, then the exact rank over
the tiny survivor set.

Why the plain window form is the right plan on Spark ≥ 3.5: a
``row_number() <= k`` filter over a window triggers the
WindowGroupLimit rewrite (SPARK-37099) — a PARTIAL group-limit runs
map-side on every scan partition BEFORE the exchange, so the shuffle
carries at most partitions × groups × k survivor rows, and the final
rank sorts only those.  Even with 3 groups the "3 reducers" handle a
few hundred rows, not the fact table.  (A previous revision
hand-rolled the same prune with a per-(scan-partition, group) window;
that form shuffles EVERY row on the synthetic (__pid, group) key —
one extra full-table exchange that the built-in rewrite avoids.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    *,
    group_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Keep the first ``k`` rows of each group under ``order_by``.

    ``order_by`` must be a total order within each group (include a
    unique tiebreaker) for deterministic results.

    One window + one rank filter: Catalyst's WindowGroupLimit rewrite
    prunes map-side (see module docstring); the plan test asserts the
    Partial group-limit sits below the exchange.
    """
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w).cast("long"))
        .filter(F.col(rank_col) <= k)
    )
