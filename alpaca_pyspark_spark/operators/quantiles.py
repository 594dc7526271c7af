"""Scale-safe grouped EXACT quantiles: rank-selection over a
value-counts table via a sqrt-range bucket spine.

The problem (guide §2.5): ``percentile(x, 0.5).over(Window.partitionBy
(k))`` and the running-sum weighted-median formulation both ship every
row of the fact table to ONE task per group key — with 3 return flags
that is a parallelism-3 straggler at 100 TB, the exact shape the skew
section of the optimization guide names.  AQE cannot split it (skew
handling applies to joins only, guide §2.5).

The decomposition replayed here keeps every stage's per-task work
bounded regardless of group size:

1. ``groupBy(key, value)`` → a VALUE-COUNTS table (one fully parallel
   hash aggregation with map-side combine — the only pass over the
   fact table; the exchange carries (key, value, count) and spreads
   over hash(key, value), not hash(key)).
2. Bucket the value domain per key with ``width = ceil(sqrt(range))``
   buckets — both the bucket count and the per-bucket distinct-value
   count are ≤ ~sqrt(range), so the per-key prefix window (step 3)
   and the within-bucket window (step 5) are each bounded by
   ~sqrt(value range) ROWS, independent of the group's row count.
   (Price cents and deviation domains are ≤ ~2e9 → ≤ ~45k rows per
   window partition.  For domains past ~2^40 apply the operator
   recursively on the selected bucket; not needed for any registered
   query.)
3. One running sum over the tiny per-key bucket spine locates, for
   each rank target t, the unique bucket where the cumulative count
   crosses t (unique because measures are ≥ 0 → the cumulative is
   monotone), and the cumulative carried INTO that bucket.
4. Broadcast the (key, bucket, carry, t) selections back onto the
   value-counts table — only the selected buckets' value groups
   survive.
5. A within-bucket running sum (≤ sqrt(range) distinct values) yields
   min value with carry + cum ≥ t — the exact rank-t value.

Exactness: every cumulative is an integer sum, so the selected values
are bit-identical to the single-window formulation under ANY
execution order; the only doubles are the final interpolation /
division, replayed with exactly the arithmetic Spark's ``Percentile``
expression uses (see :func:`grouped_median_cont`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _rank_select(
    counts: DataFrame, *, key: str, value: str, measure: str,
    targets: DataFrame, out: str = "__rv",
) -> DataFrame:
    """For each row of ``targets`` (``key``, ``__tid``, ``__t``) return
    the smallest ``value`` whose per-key running ``measure`` total
    (ordered by value) reaches ``__t``.

    Contract: ``counts`` has ONE row per (key, value) with ``value``
    non-NULL and ``measure`` a non-negative BIGINT (monotone running
    totals are what make the crossing bucket unique); ``targets`` is
    small (one row per key × rank target — group keys of an analytic
    query) and ``__t >= 1``.  Keys may be NULL (null-safe joins
    throughout).  Persist ``counts`` at the call site when it feeds
    more than one consumer — this function reads it twice (bucket
    totals + selected-bucket re-read)."""
    kc = F.col(key)
    stats = counts.groupBy(key).agg(
        F.min(value).alias("__qlo"), F.max(value).alias("__qhi")
    )
    # sqrt-split of the per-key value range: bucket count AND
    # per-bucket distinct values both <= ceil(sqrt(range)) + 1
    width = F.greatest(
        F.lit(1).cast("long"),
        F.ceil(F.sqrt((F.col("__qhi") - F.col("__qlo") + 1).cast("double"))),
    )
    b = (
        counts.join(
            F.broadcast(stats.withColumnRenamed(key, "__qk")),
            kc.eqNullSafe(F.col("__qk")),
        )
        .withColumn("__qw", width)
        # non-negative operands, so truncating `div` == floor division
        .withColumn("__qg", F.expr(f"(`{value}` - __qlo) div __qw"))
        .drop("__qk", "__qlo", "__qhi", "__qw")
    )
    bt = b.groupBy(key, "__qg").agg(F.sum(measure).alias("__qbm"))
    wk = (
        Window.partitionBy(key)
        .orderBy("__qg")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pre = bt.withColumn("__qcum", F.sum("__qbm").over(wk)).withColumn(
        "__qcarry", F.col("__qcum") - F.col("__qbm")
    )
    # the crossing bucket: carry < t <= cum (unique; measure >= 0)
    sel = (
        pre.join(
            F.broadcast(targets.withColumnRenamed(key, "__qtk")),
            kc.eqNullSafe(F.col("__qtk")),
        )
        .filter((F.col("__qcum") >= F.col("__t")) & (F.col("__qcarry") < F.col("__t")))
        .select(
            F.col("__qtk").alias("__qsk"),
            F.col("__qg").alias("__qsg"),
            "__qcarry",
            "__tid",
            "__t",
        )
    )
    cand = b.join(
        F.broadcast(sel),
        kc.eqNullSafe(F.col("__qsk")) & (F.col("__qg") == F.col("__qsg")),
    )
    wv = (
        Window.partitionBy(key, "__tid")
        .orderBy(value)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hit = cand.withColumn(
        "__qc2", F.col("__qcarry") + F.sum(measure).over(wv)
    ).filter(F.col("__qc2") >= F.col("__t"))
    return hit.groupBy(key, "__tid").agg(F.min(value).alias(out))


def grouped_median_cont(
    counts: DataFrame, *, key: str, value: str, cnt: str, out: str = "__med"
) -> DataFrame:
    """EXACT ``percentile(value, 0.5)`` per key over a value-counts
    table — bit-identical to Spark's ``Percentile`` over the expanded
    rows: rank-select the two middle values, then replay Spark's
    interpolation arithmetic (``lower.toDouble * 0.5 + higher.toDouble
    * 0.5`` for even counts — both products exact halvings, the sum
    exact below 2^53, so the double is the same one the window
    formulation produces).  NULL values are ignored (rows with
    ``value`` NULL may be present in ``counts``; they are excluded
    here, matching the aggregate's NULL contract).

    Returns (key, ``__n`` non-null count, ``out`` median double) — one
    row per key that has at least one non-null value."""
    nn = counts.filter(F.col(value).isNotNull())
    grp = nn.groupBy(key).agg(F.sum(cnt).alias("__n"))
    # 0-based middle ranks floor/ceil((n-1)/2) -> 1-based cum targets,
    # built by explode so the grp aggregate appears ONCE in the plan
    # (a union of two grp projections would execute it twice — every
    # broadcast subtree re-runs its plan, there is no cross-subtree
    # reuse; measured as a 2x stage-count inflation at sf0.1)
    targets = grp.select(
        key,
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).alias("__tid"),
                    F.expr("(__n - 1) div 2 + 1").alias("__t"),
                ),
                F.struct(
                    F.lit(2).alias("__tid"),
                    F.expr("__n div 2 + 1").alias("__t"),
                ),
            )
        ).alias("__s"),
    ).select(key, F.col("__s.__tid").alias("__tid"), F.col("__s.__t").alias("__t"))
    rs = _rank_select(nn, key=key, value=value, measure=cnt, targets=targets)
    # pivot both rank values out in ONE aggregation — rs then has a
    # single consumer, so the whole rank-selection pipeline executes
    # exactly once (two filtered-join consumers would run it twice)
    piv = rs.groupBy(key).agg(
        F.max(F.when(F.col("__tid") == 1, F.col("__rv"))).alias("__v1"),
        F.max(F.when(F.col("__tid") == 2, F.col("__rv"))).alias("__v2"),
    )
    med = F.when(
        F.col("__n") % 2 == 1, F.col("__v1").cast("double")
    ).otherwise(
        F.col("__v1").cast("double") * 0.5 + F.col("__v2").cast("double") * 0.5
    )
    return (
        grp.join(
            F.broadcast(piv.withColumnRenamed(key, "__pk")),
            F.col(key).eqNullSafe(F.col("__pk")),
        ).select(key, "__n", med.alias(out))
    )


def grouped_weighted_median(
    counts: DataFrame, *, key: str, value: str, wsum: str, out: str = "__wv"
) -> DataFrame:
    """Exact weighted median per key over a value-counts table
    (``wsum`` = total weight per value, BIGINT >= 0): the smallest
    value whose running weight W(v) satisfies 2*W(v) >= total — the
    same selection the one-window running-sum formulation makes (the
    within-value tiebreak order drops out: the first crossing row's
    value equals the smallest value group whose cumulative crosses).

    Returns (key, ``out`` value BIGINT, ``__tot`` total weight).  An
    all-zero-weight key degenerates to min(value) — every row crosses
    2*0 >= 0 — handled explicitly (the rank target would be < 1)."""
    tot = counts.groupBy(key).agg(
        F.sum(wsum).alias("__tot"), F.min(value).alias("__vmin")
    )
    # 2W >= tot  <=>  W >= ceil(tot/2) = (tot+1) div 2, for integer W
    targets = tot.select(
        key, F.lit(1).alias("__tid"), F.expr("(__tot + 1) div 2").alias("__t")
    ).filter(F.col("__t") >= 1)
    rs = _rank_select(counts, key=key, value=value, measure=wsum, targets=targets)
    return (
        tot.join(
            F.broadcast(rs.withColumnRenamed(key, "__rk")),
            F.col(key).eqNullSafe(F.col("__rk")),
            "left",
        )
        .select(
            key,
            F.coalesce(F.col("__rv"), F.col("__vmin")).alias(out),
            "__tot",
        )
    )
