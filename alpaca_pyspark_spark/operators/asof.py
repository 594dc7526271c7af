"""As-of (point-in-time) join.

The reference exposes as-of semantics only as the ``asof=YYYY-MM-DD``
API option (``/root/reference/alpaca_pyspark/stocks/bars.py:51,68-71``,
SURVEY.md §2D D9): the server resolves "state as of a date".  PySpark
has no native ``asofJoin`` DataFrame operator, so we implement the
classic scalable rewrite:

    union(state, probe) → window ``last(struct(value), ignorenulls)``
    over (partition by keys order by ts, side) → keep probe rows.

(The one-field struct wrap is what keeps NULL state VALUES matchable:
see the inline note in ``asof_join``.)

Why this over ``pyspark.pandas.merge_asof``: it is pure built-ins
(whole-stage codegen, no Python workers), costs exactly ONE shuffle on
the join keys, and the window scan is a linear single pass per key —
it survives a 100× scale-up as long as a single key's history fits a
partition (skewed keys: pre-split by time-bucket then stitch).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TS = "__asof_ts"
_SIDE = "__asof_side"
_ROW = "__asof_row"


def asof_join(
    probe: DataFrame,
    state: DataFrame,
    *,
    on: Sequence[str],
    probe_ts: str,
    state_ts: str,
    value_cols: Sequence[str],
    allow_exact_matches: bool = True,
    tolerance: str | None = None,
) -> DataFrame:
    """For each probe row, attach the latest state values with
    ``state.ts <= probe.ts`` (or ``<`` when ``allow_exact_matches`` is
    False), matching on equality of ``on``.  Probe rows with no prior
    state get NULLs (left-join semantics).

    ``tolerance`` (a SQL interval string, e.g. ``"1 hour"``) bounds
    how stale the matched state may be: when the latest prior state is
    older than ``probe.ts - tolerance`` the attach is NULLed — the
    same semantics as ``pandas.merge_asof(tolerance=...)``.  The bound
    is applied AFTER the window fill (one extra filled column carrying
    the matched state timestamp), so it costs no additional shuffle.

    Returns the probe columns followed by ``value_cols`` from state.
    """
    on = list(on)
    value_cols = list(value_cols)
    clash = sorted(set(value_cols) & set(probe.columns))
    if clash:
        raise ValueError(
            "asof_join: state value_cols collide with probe columns "
            f"{clash}; rename or select them away on one side (the "
            "output would otherwise hold two ambiguous columns per name)"
        )

    # State sorts before probe at equal timestamps iff exact matches
    # are allowed — the side marker is the tiebreaker in the sort.
    state_side, probe_side = (0, 1) if allow_exact_matches else (1, 0)

    probe_struct = F.struct(*[F.col(c) for c in probe.columns])
    row_type = probe.select(probe_struct.alias("s")).schema["s"].dataType

    # Each state value rides in a one-field STRUCT: the struct itself
    # is never NULL for a state row, so the ignorenulls window fill
    # distinguishes "state exists, its value is NULL" (match it, attach
    # NULL — pandas.merge_asof / DuckDB ASOF semantics) from "no state
    # yet" (probe filler row).  A bare NULL value would conflate the
    # two and silently fall back to an OLDER state (null-stress gate).
    def _vtype(c):
        return (
            state.select(F.struct(F.col(c).alias("v")).alias("s"))
            .schema["s"]
            .dataType
        )

    # A NULL state timestamp cannot participate in "latest state at or
    # before t" — but the window's NULLS-FIRST sort would place it
    # before every probe and its struct-wrapped value would be carried
    # forward as the "earliest" state wherever no real state precedes
    # the probe (ADVICE r9).  Drop such rows: an unknown-time state
    # matches nothing, by contract.
    state_sel = state.filter(F.col(state_ts).isNotNull()).select(
        *[F.col(c) for c in on],
        F.col(state_ts).alias(_TS),
        F.lit(state_side).alias(_SIDE),
        *[
            F.struct(F.col(c).alias("v")).alias(f"__v_{c}")
            for c in value_cols
        ],
        F.col(state_ts).alias("__asof_sts"),
        F.lit(None).cast(row_type).alias(_ROW),
    )
    probe_sel = probe.select(
        *[F.col(c) for c in on],
        F.col(probe_ts).alias(_TS),
        F.lit(probe_side).alias(_SIDE),
        *[F.lit(None).cast(_vtype(c)).alias(f"__v_{c}") for c in value_cols],
        F.lit(None).cast(state.schema[state_ts].dataType).alias("__asof_sts"),
        probe_struct.alias(_ROW),
    )

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(_TS).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = state_sel.unionByName(probe_sel)
    filled = unioned.select(
        _SIDE,
        _ROW,
        *[F.last(F.col(f"__v_{c}"), ignorenulls=True).over(w).alias(f"__v_{c}") for c in value_cols],
        F.last(F.col("__asof_sts"), ignorenulls=True).over(w).alias("__asof_sts"),
    )
    probe_rows = filled.filter(F.col(_SIDE) == probe_side)
    if tolerance is not None:
        fresh = F.col("__asof_sts") >= F.col(f"{_ROW}.{probe_ts}") - F.expr(
            f"INTERVAL {tolerance}"
        )
        return probe_rows.select(
            *[F.col(f"{_ROW}.{c}").alias(c) for c in probe.columns],
            *[
                F.when(fresh, F.col(f"__v_{c}.v")).alias(c)
                for c in value_cols
            ],
        )
    return probe_rows.select(
        *[F.col(f"{_ROW}.{c}").alias(c) for c in probe.columns],
        *[F.col(f"__v_{c}.v").alias(c) for c in value_cols],
    )
