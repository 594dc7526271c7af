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


# ---------------------------------------------------------------------
# PREFIX-BUCKET decomposition — the EXTREME tier for COMBINABLE
# trailing range windows (count + exact-integer sums), q41's shape.
#
# The bucket-doubling pre-split caps a hot key's parallelism at
# span/W buckets: with the fixture's fixed 30-day span and a 24h
# frame that is 30 tasks forever, so per-task rows grow linearly with
# volume and the skew ratio RISES across a fixed-span decade
# (sf1 2.55x -> sf10 4.32x, SKEW_STRESS round 11 — the round-11
# verdict's one `weak` row).  For combinable aggregates the frame
# does not need to be materialized inside one partition at all; this
# is the bucketed sliding-window aggregation idea from the stream-
# processing literature (pane/bucket decompositions a la Li et al.
# "No pane, no gain", SIGMOD Record 2005), done here set-wise:
#
#   pick ANY bucket width G (no divisibility constraint) and let
#   g = floor(t/G), gq = floor((t-W)/G), P(x) = per-key prefix sum of
#   bucket totals up to bucket x.  The trailing frame (t-W, t] splits
#   exactly into
#       tail:  events in bucket g with ts <= t          (running agg)
#       full:  buckets gq+1 .. g-1                      (P(g-1) - P(gq))
#       head:  events in bucket gq with ts > t-W        (T(gq) - run@(t-W))
#   and with T(gq) = P(gq) - P(gq-1) the total telescopes to
#       result = tail - head + P(g-1) - P(gq-1)
#   which also holds verbatim when gq == g (the P terms cancel and
#   tail - head is exactly the in-bucket frame).
#
# Execution: every row is emitted twice — OWN at position t in bucket
# g (reads `tail` from a per-(key, bucket) running RANGE window) and
# QUERY at position t-W in bucket gq (reads `head` from the SAME
# window pass; RANGE frames make ties exact on both sides).  The two
# halves meet again in an equi-join on a caller-named unique row id,
# and two BROADCAST joins against the (tiny, persisted) per-key dense
# bucket-prefix table supply the P terms.  Parallelism is key x
# span/G with G CHOSEN per key from the probe (target rows/bucket),
# so it scales with the key's row count instead of being pinned by
# the frame length — the property the bucket-doubling tier lacks.
#
# Exactness: every stratum sums exact integers, so any execution
# order gives the bit-identical answer; NULL-iff-empty sum semantics
# are reproduced by decomposing a non-null-count alongside each sum.
# ---------------------------------------------------------------------

#: extreme-tier dispatch: estimated rows per FRAME-WIDTH bucket above
#: which the bucket-doubling's span/W parallelism cap would straggle.
#: Calibrated round 12 by paired A/B on the skew fixtures (q41 shape,
#: 30-day span, 24h frame): at ~10k rows/W-bucket (skew1 hot key) the
#: tiers are a wash (3.4-4.5s vs 3.7-4.6s); at ~100k (skew10) the
#: prefix tier wins ~2-3.5x (9.4/8.5/9.8s vs 31.6/18.2/34.5s paired).
#: 40k sits past the wash with the win still decisive above it.
PREFIX_MIN_BUCKET_ROWS = 40_000

#: per-(key, bucket) row target when choosing the prefix tier's bucket
#: width G — small enough that one bucket's sort is trivially cheap,
#: large enough that the dense prefix spine stays tiny
PREFIX_TARGET_BUCKET_ROWS = 25_000

#: bounds on buckets-per-key: the floor keeps at least one wave of
#: parallelism even for barely-extreme keys; the cap bounds the dense
#: spine (and thus the broadcast prefix table) at any row count —
#: past it, rows/bucket grow again but with 100k-way parallelism
PREFIX_MIN_BUCKETS = 32
PREFIX_MAX_BUCKETS = 100_000

_INT_TYPES = ("tinyint", "smallint", "int", "bigint", "long", "integer", "short", "byte")


def trailing_count_sums_prefix_bucket(
    df: DataFrame,
    *,
    key: str,
    order_us: str,
    window_us: int,
    row_id: str,
    sums: dict[str, Column],
    count_alias: str,
    bucket_widths: dict,
) -> DataFrame:
    """Prefix-bucket trailing window (see block comment above): appends
    ``count_alias`` (frame row count, long) and one exact-integer sum
    column per ``sums`` alias (NULL iff the frame holds no non-null
    value, like the plain window's SUM).

    Contract (enforced loudly where cheap, documented otherwise):
    ``order_us`` and ``key`` non-NULL (the adaptive dispatcher routes
    NULL rows to the plain tier); ``row_id`` unique and non-NULL — the
    product's ingestion contract for event ids, same class as the
    interval decomposition's anchor-uniqueness contract; every sum
    expression integer-typed (exact addition is what makes the
    decomposition bit-identical under any execution order — a double
    sum would diverge by association order); ``bucket_widths`` maps
    every distinct key value in ``df`` to its bucket width in µs, or
    is a single int applied to ALL keys (the forced-decomposition
    path q208 registers so the driver's oracle exercises this tier —
    the gate fixtures are uniform, so the adaptive dispatch alone
    would never route a gate row here)."""
    from ..session import scoped_persist

    if window_us < 1:
        raise ValueError("window_us must be >= 1")
    base = df
    v_cols = {}
    for alias, expr in sums.items():
        vc = f"__v_{alias}"
        base = base.withColumn(vc, expr)
        v_cols[alias] = vc
        dt = dict(base.dtypes)[vc]
        if dt not in _INT_TYPES:
            raise ValueError(
                f"prefix-bucket sums must be exact integer types for "
                f"bit-identical decomposition; {alias!r} is {dt} — "
                "aggregate cents/counts and divide once at the end"
            )
    # per-key bucket width as a literal map (the extreme-key list is
    # pigeonhole-bounded, so the plan-side literal stays small), or
    # one global literal when a single int is given
    if isinstance(bucket_widths, int):
        gw = F.lit(int(bucket_widths))
    else:
        pairs = []
        for k, g in bucket_widths.items():
            pairs += [F.lit(k), F.lit(int(g))]
        gw = F.element_at(F.create_map(*pairs), F.col(key))
    # floor(long/long) via double division is exact here: order_us is
    # epoch µs < 2^53 (exactly representable), and the quotient's ULP
    # (~0.38/G) is strictly below the 1/G step a 1 µs move causes, so
    # no boundary can misround — same argument the W-bucket tier uses
    base = scoped_persist(
        base.withColumn("__g", F.floor(F.col(order_us) / gw))
        .withColumn("__gq", F.floor((F.col(order_us) - F.lit(window_us)) / gw))
    )

    own = base.withColumn("__p", F.col(order_us)).withColumn("__own", F.lit(True))
    qry = base.select(
        key,
        row_id,
        *v_cols.values(),
        (F.col(order_us) - F.lit(window_us)).alias("__p"),
        F.col("__gq").alias("__g"),
        F.lit(False).alias("__own"),
    )
    both = own.unionByName(qry, allowMissingColumns=True)
    wp = (
        Window.partitionBy(key, "__g")
        .orderBy("__p")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    measures = [F.sum(F.when(F.col("__own"), 1)).over(wp).alias("__r_c")]
    for alias, vc in v_cols.items():
        measures += [
            F.sum(F.when(F.col("__own") & F.col(vc).isNotNull(), 1))
            .over(wp)
            .alias(f"__r_nn_{alias}"),
            F.sum(F.when(F.col("__own"), F.col(vc))).over(wp).alias(f"__r_s_{alias}"),
        ]
    ran = both.select("*", *measures)
    own_out = ran.filter(F.col("__own")).drop("__own", "__p")
    qry_out = ran.filter(~F.col("__own")).select(
        F.col(row_id).alias("__qid"),
        F.col("__r_c").alias("__h_c"),
        *[
            c
            for alias in sums
            for c in (
                F.col(f"__r_nn_{alias}").alias(f"__h_nn_{alias}"),
                F.col(f"__r_s_{alias}").alias(f"__h_s_{alias}"),
            )
        ],
    )

    # dense per-key bucket prefix table: totals on the sparse buckets,
    # right-joined onto the key's full min..max bucket spine (bounded
    # by PREFIX_MAX_BUCKETS via the G choice), then one running sum
    # over the tiny spine — persisted because TWO joins consume it
    tot = base.groupBy(key, "__g").agg(
        F.count(F.lit(1)).alias("__t_c"),
        *[
            a
            for alias, vc in v_cols.items()
            for a in (
                F.count(vc).alias(f"__t_nn_{alias}"),
                F.sum(vc).alias(f"__t_s_{alias}"),
            )
        ],
    )
    spine = (
        base.groupBy(key)
        .agg(F.min("__g").alias("__glo"), F.max("__g").alias("__ghi"))
        .select(key, F.explode(F.sequence("__glo", "__ghi")).alias("__g"))
    )
    wk = (
        Window.partitionBy(key)
        .orderBy("__g")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prefix = scoped_persist(
        spine.join(tot, [key, "__g"], "left").select(
            F.col(key).alias("__pk"),
            F.col("__g").alias("__pg"),
            F.sum(F.coalesce("__t_c", F.lit(0))).over(wk).alias("__p_c"),
            *[
                a
                for alias in sums
                for a in (
                    F.sum(F.coalesce(f"__t_nn_{alias}", F.lit(0)))
                    .over(wk)
                    .alias(f"__p_nn_{alias}"),
                    F.sum(F.coalesce(f"__t_s_{alias}", F.lit(0)))
                    .over(wk)
                    .alias(f"__p_s_{alias}"),
                )
            ],
        )
    )

    ph = prefix.select(
        F.col("__pk"),
        F.col("__pg"),
        F.col("__p_c").alias("__hi_c"),
        *[
            a
            for alias in sums
            for a in (
                F.col(f"__p_nn_{alias}").alias(f"__hi_nn_{alias}"),
                F.col(f"__p_s_{alias}").alias(f"__hi_s_{alias}"),
            )
        ],
    )
    pl = prefix.select(
        F.col("__pk").alias("__lk"),
        F.col("__pg").alias("__lg"),
        F.col("__p_c").alias("__lo_c"),
        *[
            a
            for alias in sums
            for a in (
                F.col(f"__p_nn_{alias}").alias(f"__lo_nn_{alias}"),
                F.col(f"__p_s_{alias}").alias(f"__lo_s_{alias}"),
            )
        ],
    )
    joined = (
        # Deliberately sort-merge, NOT shuffle-hash: a SHUFFLE_HASH
        # hint was tried and REJECTED — at sf100's 29.9M-row hot key
        # the per-partition hash relation exceeds the executor memory
        # slice ("Can't acquire 268435456 bytes to build hash
        # relation"), and at 100 TB a memory-bounded build side only
        # gets worse.  SMJ spills; the sorts are the price of a join
        # that cannot OOM.
        own_out.join(qry_out, F.col(row_id) == F.col("__qid"))
        .join(
            F.broadcast(ph),
            (F.col(key) == F.col("__pk")) & (F.col("__g") - 1 == F.col("__pg")),
            "left",
        )
        .join(
            F.broadcast(pl),
            (F.col(key) == F.col("__lk")) & (F.col("__gq") - 1 == F.col("__lg")),
            "left",
        )
    )

    def _z(c: str) -> Column:
        return F.coalesce(F.col(c), F.lit(0))

    out_cols = [F.col(c) for c in df.columns]
    out_cols.append(
        (_z("__r_c") - _z("__h_c") + _z("__hi_c") - _z("__lo_c"))
        .cast("long")
        .alias(count_alias)
    )
    for alias in sums:
        nn = (
            _z(f"__r_nn_{alias}")
            - _z(f"__h_nn_{alias}")
            + _z(f"__hi_nn_{alias}")
            - _z(f"__lo_nn_{alias}")
        )
        s = (
            _z(f"__r_s_{alias}")
            - _z(f"__h_s_{alias}")
            + _z(f"__hi_s_{alias}")
            - _z(f"__lo_s_{alias}")
        )
        out_cols.append(F.when(nn > 0, s).cast("long").alias(alias))
    return joined.select(*out_cols)


def _cs_agg_builder(count_alias: str, sums: dict[str, Column]):
    """The count+sums shape as an ``agg_builder`` so the plain and
    bucket-doubled tiers emit EXACTLY the columns the prefix tier
    does (count long, one long sum per alias)."""

    def build(w: WindowSpec) -> list[Column]:
        cols = [F.count(F.lit(1)).over(w).cast("long").alias(count_alias)]
        for alias, expr in sums.items():
            cols.append(F.sum(expr).over(w).cast("long").alias(alias))
        return cols

    return build


def _hot_key_stats(
    df: DataFrame, key: str, order_us: str, min_rows: int
) -> list[tuple]:
    """(key, rows, span_us) for every non-NULL key past the straggler
    floor — the same pigeonhole-bounded single probe as
    ``sessionize.hot_keys`` with per-key order bounds added, so the
    dispatcher can estimate the bucket-doubling tier's parallelism
    (span/W) without a second pass.  Span is over NON-NULL positions
    (min/max skip NULLs), which is the right quantity: NULL-ordered
    rows are routed to the plain tier before bucketing."""
    from ..session import scoped_persist
    from .sessionize import HOT_TASK_FACTOR, _shuffle_partitions

    n = _shuffle_partitions(df.sparkSession)
    stats = scoped_persist(
        df.groupBy(key).agg(
            F.count(F.lit(1)).alias("__n"),
            F.min(order_us).alias("__lo"),
            F.max(order_us).alias("__hi"),
        )
    )
    total = stats.agg(F.sum("__n")).first()[0] or 0
    floor = max(min_rows, HOT_TASK_FACTOR * total / n)
    return [
        (r[key], r["__n"], (r["__hi"] - r["__lo"]) if r["__hi"] is not None else 0)
        for r in stats.filter(F.col("__n") > floor).collect()
        if r[key] is not None
    ]


def trailing_count_sums_adaptive(
    df: DataFrame,
    *,
    key: str,
    order_us: str,
    window_us: int,
    row_id: str,
    sums: dict[str, Column],
    count_alias: str,
) -> DataFrame:
    """THREE-tier per-key dispatch for combinable (count + exact-
    integer-sum) trailing range windows:

    * cold keys (and all NULL keys / NULL-ordered rows): the plain
      per-key window — one exchange, cheapest when nothing straggles;
    * hot keys whose span/W bucket grid still offers enough
      parallelism: the bucket-doubling pre-split (2x duplication, no
      join-back);
    * EXTREME keys — estimated rows per frame-width bucket past
      ``PREFIX_MIN_BUCKET_ROWS``, where the W-grid itself is the
      straggler: the prefix-bucket decomposition, whose parallelism
      follows the key's row count (span/G with G chosen from the
      probe) instead of the frame length.

    All three tiers are bit-identical per row (exact integer sums;
    tests/test_rangewindow_prefix.py pins three-way parity on random,
    tie-heavy, NULL-bearing and bucket-edge data), keys are disjoint
    across tiers, so the dispatch is invisible to correctness and the
    oracle SQL is unchanged.  ``row_id`` must be unique non-NULL (the
    ingestion contract for event ids) — it carries the prefix tier's
    head/tail join-back."""
    from .sessionize import _split_by_keys

    builder = _cs_agg_builder(count_alias, sums)
    kw_w = dict(
        key=key, order_us=order_us, window_us=window_us, agg_builder=builder
    )
    stats = _hot_key_stats(df, key, order_us, min_rows=RANGE_HOT_MIN_ROWS)
    if not stats:
        return _plain(df, **kw_w)
    widths: dict = {}
    moderate = []
    for k, rows, span in stats:
        w_buckets = int(span // window_us) + 1
        if rows / w_buckets > PREFIX_MIN_BUCKET_ROWS:
            buckets = min(
                PREFIX_MAX_BUCKETS,
                max(PREFIX_MIN_BUCKETS, rows // PREFIX_TARGET_BUCKET_ROWS),
            )
            widths[k] = max(1, int(span // buckets))
        else:
            moderate.append(k)
    out = None
    rest = df
    if moderate:
        hot, rest = _split_by_keys(rest, key, moderate)
        hot_null = hot.filter(F.col(order_us).isNull())
        hot = hot.filter(F.col(order_us).isNotNull())
        out = _plain(hot_null, **kw_w).unionByName(
            trailing_range_window_skew_safe(hot, **kw_w)
        )
    if widths:
        ext, rest = _split_by_keys(rest, key, list(widths))
        ext_null = ext.filter(F.col(order_us).isNull())
        ext = ext.filter(F.col(order_us).isNotNull())
        pb = _plain(ext_null, **kw_w).unionByName(
            trailing_count_sums_prefix_bucket(
                ext,
                key=key,
                order_us=order_us,
                window_us=window_us,
                row_id=row_id,
                sums=sums,
                count_alias=count_alias,
                bucket_widths=widths,
            )
        )
        out = pb if out is None else out.unionByName(pb)
    cold = _plain(rest, **kw_w)
    return cold if out is None else cold.unionByName(out)
