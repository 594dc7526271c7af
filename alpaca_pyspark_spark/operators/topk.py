"""Per-group top-k (the distributed ORDER BY ... LIMIT k per key).

Reference analog: ``sort`` + ``limit`` pushdown options (SURVEY.md §2D
D3/D4).  Global top-k is just ``orderBy().limit(k)`` (Spark's
TakeOrderedAndProject — no full sort materialized); per-group top-k is
two-phase: a local prune per scan partition, then the exact rank over
the tiny survivor set.

Why two-phase: a single ``row_number() <= k`` window shuffles EVERY
row into #groups partitions.  With few groups (3 return flags, a
handful of exchanges) that is the pathological case at scale — a
billion rows sorted by 3 tasks while the rest of the cluster idles.
The local phase keeps parallelism at the scan width regardless of
group cardinality, and the global phase ranks ≤ partitions × groups
× k rows.
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

    Phase 1 prunes to the per-(scan-partition, group) top-k — correct
    because a group's global top-k is a subset of the union of its
    per-subset top-ks, for ANY partitioning of the rows.  Phase 2
    computes the exact rank on the survivors.  Same rows, same ranks
    as the one-window form.
    """
    # __pid is projected in the map stage, BEFORE the exchange the
    # local window induces — so the local shuffle spreads by
    # (scan partition × group), keeping sort parallelism at scan
    # width even when group_by has 3 distinct values.
    local = Window.partitionBy("__pid", *group_by).orderBy(*order_by)
    pruned = (
        df.withColumn("__pid", F.spark_partition_id())
        .withColumn("__lrn", F.row_number().over(local))
        .filter(F.col("__lrn") <= k)
        .drop("__pid", "__lrn")
    )
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    return (
        pruned.withColumn(rank_col, F.row_number().over(w).cast("long"))
        .filter(F.col(rank_col) <= k)
    )
