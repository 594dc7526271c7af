"""Measure the q102/q106 quantile-dispatch crossover: window tier vs
sqrt-range decomposition on synthetic lineitem-shaped data ABOVE the
gate scales, where the dispatch floor actually operates.

    python tools/ab_r12_qfloor.py 6 20 60        # sizes in MILLIONS of rows

Why this exists: QUANTILE_DECOMPOSE_MIN_TABLE_ROWS (60M fact rows) was
justified by argument (one ~20M-row group per window task is both the
latency straggler and a percentile-buffer memory hazard) — this tool
replaces the argument with a measured crossover, the same standard the
sessionize floor met in round 11 (crossover-interpolated from A/B).

Protocol: bench.py's exact forcing (noop sink via plans.force_evaluate,
scoped caches released per run, catalog cache cleared), one untimed
warm run per arm then arms alternated W/D/W/D within one JVM at each
size so long-JVM drift cancels to first order; medians reported.  Data
is deterministic (xxhash64 of the row id — no rand(), so retried tasks
reproduce rows, guide §2.5) with the SAME 3-value key domain and
~10.4M-cent price domain as lineitem, and the two tiers' 3-row outputs
are compared for equality once per size — a large-scale parity check
the unit suite's small fixtures cannot give.
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

REPS = 2  # timed reps per arm per size, alternated W/D/W/D after a warm


def synth(spark, n_rows: int):
    """Deterministic lineitem-shaped frame: 3-value return flag,
    near-unique prices over lineitem's ~10.4M-cent domain, integer
    quantities 1..50, unique (orderkey, linenumber) tiebreak."""
    return spark.range(n_rows).select(
        F.element_at(
            F.array(F.lit("A"), F.lit("N"), F.lit("R")),
            (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
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
    sizes_m = [int(a) for a in sys.argv[1:]] or [6, 20, 60]
    spark = get_spark("ab-r12-qfloor")
    spark.sparkContext.setLogLevel("ERROR")
    out = {
        "protocol": "noop-sink forced, warm run per arm then W/D "
        f"alternated in one JVM, {REPS} timed reps per arm, medians; "
        "deterministic xxhash64 synthetic data, 3-group key, "
        "~10.4M-cent price domain",
        "sizes": {},
    }
    for m in sizes_m:
        n = m * 1_000_000
        df = synth(spark, n)
        size_out = {}
        for q, wfn, dfn in (
            ("q102", _q102_window, _q102_decomposed),
            ("q106", _q106_window, _q106_decomposed),
        ):
            spark.sparkContext.setJobDescription(f"qfloor {m}M {q} warm")
            run_forced(wfn, df)
            run_forced(dfn, df)
            tw, td = [], []
            for rep in range(REPS):
                spark.sparkContext.setJobDescription(f"qfloor {m}M {q} W")
                tw.append(round(run_forced(wfn, df), 2))
                spark.sparkContext.setJobDescription(f"qfloor {m}M {q} D")
                td.append(round(run_forced(dfn, df), 2))
                print(
                    f"# {m}M {q} rep{rep}: window {tw[-1]}s "
                    f"decomposed {td[-1]}s",
                    file=sys.stderr,
                )
            spark.sparkContext.setJobDescription(f"qfloor {m}M {q} parity")
            parity = sorted(rows_of(wfn, df)) == sorted(rows_of(dfn, df))
            print(f"# {m}M {q} parity={parity}", file=sys.stderr)
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
