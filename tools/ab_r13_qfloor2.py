"""ADVICE r12 follow-up: re-measure the quantile dispatch crossover
near the tie point with (a) REPS=5 instead of 2, (b) every size in
ONE JVM under one protocol (the r12 2M block came from a separate
JVM), and (c) a LINEITEM-SKEWED key — l_returnflag is ~50/25/25 (N
twice A/R), and the window tier's single-group straggler scales with
the LARGEST group, so the equal-thirds synthetic put the crossover
slightly high.

    python tools/ab_r13_qfloor2.py 2 3 4 6      # MILLIONS of rows

Everything else is tools/ab_r12_qfloor.py verbatim (noop-sink forced,
warm per arm, W/D alternated, parity-checked per size).
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

from alpaca_pyspark_spark.plans import force_evaluate  # noqa: E402
from alpaca_pyspark_spark.queries.mining import (  # noqa: E402
    _q102_decomposed,
    _q102_window,
    _q106_decomposed,
    _q106_window,
)
from alpaca_pyspark_spark.session import get_spark  # noqa: E402
from alpaca_pyspark_spark.session import release_scoped_caches  # noqa: E402

REPS = 5


def synth(spark, n_rows: int):
    """Lineitem-shaped frame with the REAL key skew: pmod(id, 4)
    mapped N,N,A,R gives ~50/25/25 like l_returnflag; prices
    near-unique over the ~10.4M-cent domain, quantities 1..50."""
    return spark.range(n_rows).select(
        F.element_at(
            F.array(F.lit("N"), F.lit("N"), F.lit("A"), F.lit("R")),
            (F.pmod(F.col("id"), F.lit(4)) + 1).cast("int"),
        ).alias("l_returnflag"),
        (
            (F.pmod(F.xxhash64("id"), F.lit(10_400_000)) + 90_000) / 100.0
        ).alias("l_extendedprice"),
        (F.pmod(F.xxhash64("id", F.lit(7)), F.lit(50)) + 1)
        .cast("double")
        .alias("l_quantity"),
        (F.col("id") / 4 + 1).cast("bigint").alias("l_orderkey"),
        (F.pmod(F.col("id"), F.lit(4)) + 1).cast("int").alias("l_linenumber"),
    )


def run_forced(fn, df) -> float:
    spark = df.sparkSession
    spark.catalog.clearCache()
    gc.collect()
    t0 = time.perf_counter()
    force_evaluate(fn(df))
    dt = time.perf_counter() - t0
    release_scoped_caches()
    spark.catalog.clearCache()
    return dt


def rows_of(fn, df) -> list:
    out = [tuple(r) for r in fn(df).collect()]
    release_scoped_caches()
    df.sparkSession.catalog.clearCache()
    return out


def main() -> None:
    sizes_m = [int(a) for a in sys.argv[1:]] or [2, 3, 4, 6]
    spark = get_spark("ab-r13-qfloor2")
    spark.sparkContext.setLogLevel("ERROR")
    out = {
        "protocol": "ab_r12_qfloor protocol, one JVM for ALL sizes, "
        f"{REPS} reps per arm per size, 50/25/25 skewed key (N,N,A,R)",
        "sizes": {},
    }
    for m in sizes_m:
        df = synth(spark, m * 1_000_000)
        size_out = {}
        for q, wfn, dfn in (
            ("q102", _q102_window, _q102_decomposed),
            ("q106", _q106_window, _q106_decomposed),
        ):
            spark.sparkContext.setJobDescription(f"qfloor2 {m}M {q} warm")
            run_forced(wfn, df)
            run_forced(dfn, df)
            tw, td = [], []
            for rep in range(REPS):
                spark.sparkContext.setJobDescription(f"qfloor2 {m}M {q} W")
                tw.append(round(run_forced(wfn, df), 2))
                spark.sparkContext.setJobDescription(f"qfloor2 {m}M {q} D")
                td.append(round(run_forced(dfn, df), 2))
                print(
                    f"# {m}M {q} rep{rep}: window {tw[-1]}s "
                    f"decomposed {td[-1]}s",
                    file=sys.stderr,
                    flush=True,
                )
            spark.sparkContext.setJobDescription(f"qfloor2 {m}M {q} parity")
            parity = sorted(rows_of(wfn, df)) == sorted(rows_of(dfn, df))
            print(f"# {m}M {q} parity={parity}", file=sys.stderr, flush=True)
            size_out[q] = {
                "window_s": tw,
                "decomposed_s": td,
                "window_median": round(statistics.median(tw), 2),
                "decomposed_median": round(statistics.median(td), 2),
                "parity": parity,
            }
        out["sizes"][f"{m}M"] = size_out
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
