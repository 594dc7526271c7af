"""Crossover sweeps for the three argued-not-measured rangewindow
dispatch constants (VERDICT r12 item 3), q41's count+cents shape:

  A) RANGE_HOT_MIN_ROWS (100k): plain per-key window vs the W-bucket
     pre-split for ONE key of N rows over a 30-day span —
     ``python tools/ab_r13_rangefloor.py hot 30 100 300 1000``
     (N in THOUSANDS of rows).
  B) PREFIX_MIN_BUCKET_ROWS (40k): W-bucket pre-split vs prefix-bucket
     decomposition for ONE key at R rows per frame-width bucket
     (30-day span, 24h frame -> 30 W-buckets, N = 30R) —
     ``python tools/ab_r13_rangefloor.py prefix 10 20 40 80 160``
     (R in THOUSANDS of rows per W-bucket).
  C) PREFIX_MIN_BUCKETS (32): the prefix tier's forced bucket count
     for a barely-extreme 1.5M-row key —
     ``python tools/ab_r13_rangefloor.py buckets 8 16 32 64 128``.

Protocol: bench.py's exact forcing (noop sink, scoped caches
released), deterministic xxhash64 data (no rand(), guide §2.5), one
untimed warm per arm then arms alternated within one JVM per size,
medians of REPS; arm outputs equality-checked at every size (exact
integer sums make every tier bit-identical under any execution
order, so parity is a straight sorted-rows compare).
"""

from __future__ import annotations

import gc
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

from pyspark.sql import functions as F  # noqa: E402

from alpaca_pyspark_spark.operators.rangewindow import (  # noqa: E402
    _cs_agg_builder,
    _plain,
    trailing_count_sums_prefix_bucket,
    trailing_range_window_skew_safe,
)
from alpaca_pyspark_spark.plans import force_evaluate  # noqa: E402
from alpaca_pyspark_spark.session import get_spark  # noqa: E402
from alpaca_pyspark_spark.session import release_scoped_caches  # noqa: E402

REPS = 3
DAY_US = 24 * 3600 * 1_000_000
SPAN_US = 30 * DAY_US


def synth(spark, n_rows: int):
    """One hot key, deterministic pseudo-uniform timestamps over a
    30-day span (q41's fixture span), integer cents, unique row ids."""
    return spark.range(n_rows).select(
        F.col("id").alias("event_id"),
        F.lit("HOT").alias("user_id"),
        F.pmod(F.xxhash64("id"), F.lit(SPAN_US)).alias("us"),
        F.pmod(F.xxhash64("id", F.lit(3)), F.lit(100_000)).alias("cents"),
    )


SUMS = {"cents_24h": F.col("cents")}
KW = dict(key="user_id", order_us="us", window_us=DAY_US)
BUILDER = _cs_agg_builder("n_24h", SUMS)


def arm_plain(df):
    return _plain(df, agg_builder=BUILDER, **KW)


def arm_wbucket(df):
    return trailing_range_window_skew_safe(df, agg_builder=BUILDER, **KW)


def arm_prefix(df, bucket_width_us: int):
    return trailing_count_sums_prefix_bucket(
        df,
        row_id="event_id",
        sums=SUMS,
        count_alias="n_24h",
        bucket_widths=int(bucket_width_us),
        **KW,
    ).select(*df.columns, "n_24h", "cents_24h")


def run_forced(mk) -> float:
    df = mk()
    spark = df.sparkSession
    spark.catalog.clearCache()
    gc.collect()
    t0 = time.perf_counter()
    force_evaluate(df)
    dt = time.perf_counter() - t0
    release_scoped_caches()
    spark.catalog.clearCache()
    return dt


def rows_of(mk) -> list:
    df = mk()
    out = sorted(tuple(r) for r in df.collect())
    release_scoped_caches()
    df.sparkSession.catalog.clearCache()
    return out


def sweep(spark, label: str, sizes: list[int], arms) -> dict:
    out = {}
    for s in sizes:
        mks = arms(s)
        names = list(mks)
        for nm in names:
            spark.sparkContext.setJobDescription(f"{label} {s} {nm} warm")
            run_forced(mks[nm])
        t: dict[str, list[float]] = {nm: [] for nm in names}
        for rep in range(REPS):
            for nm in names:
                spark.sparkContext.setJobDescription(f"{label} {s} {nm}")
                t[nm].append(round(run_forced(mks[nm]), 2))
            print(
                f"# {label} {s} rep{rep}: "
                + " ".join(f"{nm}={t[nm][-1]}" for nm in names),
                file=sys.stderr,
                flush=True,
            )
        spark.sparkContext.setJobDescription(f"{label} {s} parity")
        base = rows_of(mks[names[0]])
        parity = all(rows_of(mks[nm]) == base for nm in names[1:])
        print(f"# {label} {s} parity={parity}", file=sys.stderr, flush=True)
        out[str(s)] = {
            "parity": parity,
            **{
                nm: {
                    "s": t[nm],
                    "median": round(statistics.median(t[nm]), 2),
                }
                for nm in names
            },
        }
    return out


def main() -> None:
    mode = sys.argv[1]
    sizes = [int(a) for a in sys.argv[2:]]
    spark = get_spark("ab-r13-rangefloor")
    spark.sparkContext.setLogLevel("ERROR")
    if mode == "hot":
        # N thousands of rows for the single key: plain vs W-bucket
        def arms(k):
            df = synth(spark, k * 1000)
            return {
                "plain": lambda: arm_plain(df),
                "wbucket": lambda: arm_wbucket(df),
            }

        res = sweep(spark, "hot", sizes or [30, 100, 300, 1000], arms)
    elif mode == "prefix":
        # R thousands of rows PER 24h W-bucket (30 W-buckets): W-bucket
        # pre-split vs prefix tier with its production G choice
        from alpaca_pyspark_spark.operators.rangewindow import (
            PREFIX_MAX_BUCKETS,
            PREFIX_MIN_BUCKETS,
            PREFIX_TARGET_BUCKET_ROWS,
        )

        def arms(rk):
            n = rk * 1000 * 30
            df = synth(spark, n)
            buckets = min(
                PREFIX_MAX_BUCKETS,
                max(PREFIX_MIN_BUCKETS, n // PREFIX_TARGET_BUCKET_ROWS),
            )
            g = max(1, SPAN_US // buckets)
            return {
                "wbucket": lambda: arm_wbucket(df),
                "prefix": lambda: arm_prefix(df, g),
            }

        res = sweep(spark, "prefix", sizes or [10, 20, 40, 80, 160], arms)
    elif mode == "buckets":
        # forced bucket COUNT for a barely-extreme 1.5M-row key; parity
        # of every count against ONE plain-window reference collect
        n = 1_500_000
        df = synth(spark, n)
        spark.sparkContext.setJobDescription("buckets reference rows")
        ref = rows_of(lambda: arm_plain(df))
        res = {"n_rows": n}
        for b in sizes or [8, 16, 32, 64, 128]:
            g = max(1, SPAN_US // b)
            mk = lambda: arm_prefix(df, g)  # noqa: E731
            spark.sparkContext.setJobDescription(f"buckets {b} warm")
            run_forced(mk)
            t = []
            for rep in range(REPS):
                spark.sparkContext.setJobDescription(f"buckets {b}")
                t.append(round(run_forced(mk), 2))
                print(f"# buckets {b} rep{rep}: {t[-1]}s", file=sys.stderr, flush=True)
            spark.sparkContext.setJobDescription(f"buckets {b} parity")
            parity = rows_of(mk) == ref
            print(f"# buckets {b} parity={parity}", file=sys.stderr, flush=True)
            res[str(b)] = {
                "s": t,
                "median": round(statistics.median(t), 2),
                "parity_vs_plain": parity,
            }
    else:
        raise SystemExit(f"unknown mode {mode!r}")
    print(
        json.dumps(
            {
                "mode": mode,
                "protocol": "noop-sink forced, warm per arm then arms "
                f"alternated in one JVM per size, {REPS} reps, medians, "
                "parity-checked per size; deterministic xxhash64 data, "
                "single hot key, 30-day span, 24h frame",
                "sizes": res,
            },
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
