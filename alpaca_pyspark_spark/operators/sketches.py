"""Mergeable heavy-hitter sketch: distributed Misra–Gries.

The exact heavy-hitter query (q34) shuffles one partial row per
(key × salt) — fine when the key domain is small.  When the domain is
huge (tokens, URLs, user agents) and only the heavy tail matters,
exact counting shuffles the whole vocabulary; Misra–Gries caps the
state at ``capacity`` counters PER PARTITION with the classic
guarantee: any item with true frequency > n/(capacity+1) is present
in the summary, and each kept counter underestimates its true count
by at most n_partition/(capacity+1).

Distributed composition used here (standard mergeability result,
Agarwal et al., "Mergeable Summaries"):

1. each partition folds its rows into a ``capacity``-counter MG
   summary (an Arrow ``mapInPandas`` pass — state is O(capacity),
   rows stream through);
2. the per-partition summaries are exact-summed by item (the shuffle
   carries ≤ capacity × partitions rows — the scale win: bounded by
   config, not by vocabulary);
3. the driver-side guarantee after summing: est(x) ≥ true(x) − n/(capacity+1),
   so every item with true(x) > 2·n/(capacity+1) survives with a
   positive count.

The survivors are a SUPERSET guarantee, not exact counts — callers
that need exact numbers re-count just the survivors with one cheap
semi-joined aggregation (`verify=True`), which is the production
pattern: sketch to find the needles, exact-count the needles only.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import spread


def _mg_partition(capacity: int):
    def fold(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        counters: dict = {}
        n = 0
        for pdf in batches:
            for item in pdf["__item"]:
                n += 1
                if item in counters:
                    counters[item] += 1
                elif len(counters) < capacity:
                    counters[item] = 1
                else:
                    # decrement-all step; drop zeros
                    dead = []
                    for k in counters:
                        counters[k] -= 1
                        if counters[k] == 0:
                            dead.append(k)
                    for k in dead:
                        del counters[k]
        if counters:
            yield pd.DataFrame(
                {
                    "__item": list(counters.keys()),
                    "__est": list(counters.values()),
                    "__n_part": [n] * len(counters),
                }
            )

    return fold


def frequent_items(
    df: DataFrame,
    *,
    item_col: str,
    capacity: int = 256,
    min_share: float | None = None,
    verify: bool = False,
) -> DataFrame:
    """Approximate heavy hitters of ``item_col``.

    Returns (item, est_count, n_total); ``est_count`` underestimates
    the true count by at most n_total/(capacity+1).  With
    ``min_share`` only items whose LOWER BOUND clears
    ``min_share × n_total`` are kept.  ``verify=True`` re-counts the
    survivors exactly (one semi-joined aggregation over the raw
    column — the survivors are few, the scan is the same one pass).
    """
    import pandas  # noqa: F401 — imported for the worker closure

    items = spread(df.select(F.col(item_col).alias("__item")))
    partials = items.mapInPandas(
        _mg_partition(capacity),
        "`__item` string, `__est` long, `__n_part` long",
    )
    merged = partials.groupBy("__item").agg(F.sum("__est").alias("est_count"))
    total = items.groupBy().agg(F.count(F.lit(1)).alias("__n"))
    out = merged.crossJoin(F.broadcast(total)).select(
        F.col("__item").alias("item"),
        "est_count",
        F.col("__n").alias("n_total"),
    )
    if min_share is not None:
        # est + n/(cap+1) ≥ true, and est ≤ true, so est ≥ share·n − n/(cap+1)
        out = out.filter(
            F.col("est_count")
            >= F.lit(min_share) * F.col("n_total") - F.col("n_total") / (capacity + 1)
        )
    if verify:
        exact = (
            items.join(
                out.select(F.col("item").alias("__item")), "__item", "left_semi"
            )
            .groupBy("__item")
            .agg(F.count(F.lit(1)).alias("true_count"))
            .select(F.col("__item").alias("item"), "true_count")
        )
        out = out.join(exact, "item")
    return out
