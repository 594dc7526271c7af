"""Scalable global row numbering.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY is the
classic scale trap: Spark plans a single-partition window — one task
sorts the entire table.  The scalable equivalent is the three-step
range-partition pattern (the same layout TeraSort uses):

1. ``repartitionByRange`` + ``sortWithinPartitions`` on a TOTAL order
   (include a unique tiebreaker column) — a distributed sort.
2. ONE tiny aggregation — per-partition row counts (|partitions|
   rows to the driver, independent of table size) — turned into
   cumulative start offsets.
3. A map-only Arrow stage adds ``offset[partition] + local_index``.

The result is bit-identical to the single-partition window for any
total order, and — because offsets correct for however the range
boundaries fell — identical across cluster sizes, partition counts,
and sampling differences in the range partitioner.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

if TYPE_CHECKING:
    import pandas as pd


def assign_stable_ids(
    df: DataFrame,
    order_cols: Sequence[str],
    *,
    id_col: str = "row_id",
    num_partitions: int = 32,
    total_col: str | None = None,
    weight_col: str | None = None,
    cumsum_col: str | None = None,
    weight_total_col: str | None = None,
) -> DataFrame:
    """Add ``id_col`` = 1-based global rank of the row under
    ``ORDER BY order_cols`` (which must be a total order — include a
    unique key as the last column, or equal rows get an arbitrary but
    stable relative numbering).

    ``total_col`` (optional) additionally attaches the table's total
    row count to every row — it falls out of the same per-partition
    count job for free, so top-share selections (``rank * K <=
    total``) need no extra single-partition count window.  Descending
    order on an integer key: negate the key into a helper column
    (exact for BIGINT) and rank on that.

    ``cumsum_col`` (optional, requires ``weight_col``, an integer
    column) additionally attaches the EXCLUSIVE global prefix sum of
    ``weight_col`` under the same order — the distributed prefix-sum:
    per-partition weight totals ride the same tiny driver aggregation
    as the counts, and the map stage adds offset + running local sum.
    This is how budget-constrained selections ("take rows in quality
    order until N tokens") avoid the single-partition cumsum window —
    bit-identical to ``sum(w) OVER (ORDER BY ... ROWS UNBOUNDED
    PRECEDING AND 1 PRECEDING)`` for any total order.
    ``weight_total_col`` (optional, requires ``weight_col``) attaches
    the GLOBAL weight total to every row — like ``total_col``, it
    falls out of the same driver aggregation for free, so budget
    scalars (``B = total_tokens DIV 5``) need no extra corpus scan.

    ``weight_col`` must be a NON-NULL integral column: the contract is
    exact integer prefix sums, and a float weight would truncate
    per-partition in the driver aggregation but per-row in the map
    stage (silently inconsistent offsets), while a NULL is ignored by
    the aggregation but poisons the Arrow batch — both are rejected
    loudly instead."""
    if cumsum_col is not None and weight_col is None:
        raise ValueError(
            "assign_stable_ids: cumsum_col requires weight_col — they go together"
        )
    if weight_total_col is not None and weight_col is None:
        raise ValueError(
            "assign_stable_ids: weight_total_col requires weight_col"
        )
    if weight_col is not None and cumsum_col is None and weight_total_col is None:
        raise ValueError(
            "assign_stable_ids: weight_col without cumsum_col/weight_total_col "
            "does nothing — they go together"
        )
    if weight_col is not None:
        wtype = df.schema[weight_col].dataType.typeName()
        if wtype not in ("byte", "short", "integer", "long"):
            raise ValueError(
                f"assign_stable_ids: weight_col {weight_col!r} is {wtype}, "
                "but exact prefix sums require an integral column — a float "
                "would truncate per-partition in the offsets but per-row in "
                "the map stage (silently inconsistent cumsums)"
            )
    taken = set(df.columns)
    clash = {
        c
        for c in (id_col, total_col, cumsum_col, weight_total_col)
        if c is not None and c in taken
    }
    if clash:
        raise ValueError(
            f"assign_stable_ids: output column(s) {sorted(clash)} already "
            "exist on the input — pick different id_col/total_col names "
            "(a collision would make the Arrow schema diverge from the "
            "pandas batch at runtime)"
        )
    cols = [F.col(c) for c in order_cols]
    parts = df.repartitionByRange(num_partitions, *cols).sortWithinPartitions(*cols)
    # The sorted layout feeds BOTH the count job below and the final
    # map stage.  localCheckpoint (not persist) materializes it once
    # at the count, truncates lineage, and is released by Spark's
    # ContextCleaner when the returned DataFrame is garbage-collected
    # — no cache entry lingers for the caller to unpersist.  Tradeoff
    # (SCALE.md "Known local-to-cluster swaps"): checkpointed
    # partitions have no lineage to recompute from, so on a cluster
    # with executor churn swap to reliable checkpoint()/persist(DISK).
    parts = parts.localCheckpoint(eager=False)
    aggs = [F.count(F.lit(1)).alias("n")]
    if weight_col is not None:
        aggs.append(F.sum(weight_col).cast("long").alias("w"))
    stats = {
        r["pid"]: r
        for r in parts.groupBy(F.spark_partition_id().alias("pid"))
        .agg(*aggs)
        .collect()
    }
    offsets, acc = {}, 0
    woffsets, wacc = {}, 0
    for pid in range(num_partitions):
        offsets[pid] = acc
        acc += stats[pid]["n"] if pid in stats else 0
        if weight_col is not None:
            woffsets[pid] = wacc
            if pid in stats:
                wacc += stats[pid]["w"] or 0

    total = acc
    wtotal = wacc
    extra = [StructField(id_col, LongType())]
    if total_col is not None:
        extra.append(StructField(total_col, LongType()))
    if cumsum_col is not None:
        extra.append(StructField(cumsum_col, LongType()))
    if weight_total_col is not None:
        extra.append(StructField(weight_total_col, LongType()))
    out_schema = StructType(list(parts.schema.fields) + extra)

    def number(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        start = offsets[pid]
        wstart = woffsets.get(pid, 0)
        seen = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf[id_col] = range(start + seen + 1, start + seen + 1 + len(pdf))
            if total_col is not None:
                pdf[total_col] = total
            if weight_col is not None and pdf[weight_col].isna().any():
                raise ValueError(
                    f"assign_stable_ids: weight_col {weight_col!r} contains "
                    "NULLs — exact prefix sums require non-null weights (the "
                    "driver aggregation would skip them while the row cumsum "
                    "cannot)"
                )
            if cumsum_col is not None:
                w = pdf[weight_col].astype("int64")
                pdf[cumsum_col] = wstart + w.cumsum() - w
                wstart += int(w.sum())
            if weight_total_col is not None:
                pdf[weight_total_col] = wtotal
            seen += len(pdf)
            yield pdf

    return parts.mapInPandas(number, out_schema)
