"""Per-group top-k (the distributed ORDER BY ... LIMIT k per key).

Reference analog: ``sort`` + ``limit`` pushdown options (SURVEY.md §2D
D3/D4).  Global top-k is just ``orderBy().limit(k)`` (Spark's
TakeOrderedAndProject — no full sort materialized); per-group top-k is
``row_number() <= k`` over a window, which shuffles once on the group
key and never materializes a global sort.
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
    """
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w).cast("long"))
        .filter(F.col(rank_col) <= k)
    )
