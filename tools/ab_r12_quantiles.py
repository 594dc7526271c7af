"""Round-12 q102/q106 A/B: the one-window grouped-percentile /
weighted-median formulations (pre-round-12, reconstructed verbatim
below) vs the sqrt-range rank-selection decomposition now in the
queries.  Three jobs in one:

1. PARITY — collect both forms on the given SF dirs and compare
   row-for-row with repr-exact doubles (bit-identical or fail).
2. TIMING — alternating A/B/A/B in ONE JVM (noop-sink forced, the
   bench protocol) so long-JVM drift cancels to first order.
3. PLAN DUMPS — write plans/r12/{q102_mad_outliers,q106_weighted_
   median}_{before,after}.txt from the same session.

Usage: python tools/ab_r12_quantiles.py [--rounds 4] [--sf DIR ...]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from alpaca_pyspark_spark.plans import force_evaluate, formatted_plan  # noqa: E402
from alpaca_pyspark_spark.queries import QUERIES  # noqa: E402
from alpaca_pyspark_spark.session import (  # noqa: E402
    get_spark,
    release_scoped_caches,
    tune,
)
from alpaca_pyspark_spark.tables import load  # noqa: E402

REPO = Path(__file__).resolve().parents[1]


# ------------------------------------------------------------------
# pre-round-12 formulations, verbatim (git f2027f9:queries/mining.py)
# ------------------------------------------------------------------


def old_q102(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    li = load(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    w = Window.partitionBy("l_returnflag")
    d = (
        li.select("l_returnflag", cents.alias("__c"))
        .withColumn("__med", F.percentile("__c", F.lit(0.5)).over(w))
        .withColumn("__dev", F.abs(F.col("__c") - F.col("__med")))
        .withColumn("__mad", F.percentile("__dev", F.lit(0.5)).over(w))
    )
    return (
        d.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.count_if(F.col("__dev") > F.lit(1.5) * F.col("__mad")).alias(
                "n_outliers"
            ),
            (F.max("__med") / 100.0).alias("median_price"),
            (F.max("__mad") / 100.0).alias("mad_price"),
        )
        .orderBy("l_returnflag")
    )


def old_q106(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_extendedprice").isNotNull() & F.col("l_quantity").isNotNull()
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    wgt = F.round(F.col("l_quantity")).cast("bigint")
    base = li.select(
        "l_returnflag",
        cents.alias("__c"),
        wgt.alias("__w"),
        "l_orderkey",
        "l_linenumber",
    )
    ow = (
        Window.partitionBy("l_returnflag")
        .orderBy("__c", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gw = Window.partitionBy("l_returnflag")
    hit = (
        base.withColumn("__cum", F.sum("__w").over(ow))
        .withColumn("__tot", F.sum("__w").over(gw))
        .filter(F.col("__cum") * 2 >= F.col("__tot"))
    )
    return (
        hit.groupBy("l_returnflag")
        .agg(
            (F.min("__c") / 100.0).alias("weighted_median_price"),
            F.max("__tot").alias("total_weight"),
        )
        .orderBy("l_returnflag")
    )


def forced_q102(spark: SparkSession, sf_dir: str) -> DataFrame:
    from alpaca_pyspark_spark.queries.mining import _q102_decomposed

    tune(spark)
    return _q102_decomposed(load(spark, sf_dir, "lineitem"))


# old formulation vs what the registry now runs; the *_forced rows pin
# the decomposed tier (never reached below the dispatch floor) against
# the oracle-matched old plans and give its honest local cost
PAIRS = {
    "q102_mad_outliers": (old_q102, QUERIES["q102_mad_outliers"]),
    "q106_weighted_median": (old_q106, QUERIES["q106_weighted_median"]),
    "q102_forced_decomposition": (old_q102, forced_q102),
    "q209_weighted_median_decomposed": (
        old_q106,
        QUERIES["q209_weighted_median_decomposed"],
    ),
}


def rows_exact(df: DataFrame) -> list[tuple]:
    return sorted(tuple(map(repr, r)) for r in df.collect())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument(
        "--sf",
        nargs="*",
        default=["/root/testdata/sf0.001", "/root/testdata/sf0.01"],
    )
    ap.add_argument("--time-sf", default="/root/testdata/sf0.1")
    ap.add_argument("--no-plans", action="store_true")
    args = ap.parse_args()

    spark = get_spark("ab-r12-quantiles")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. parity
    for sf in args.sf:
        for qid, (old, new) in PAIRS.items():
            a = rows_exact(old(spark, sf))
            release_scoped_caches()
            spark.catalog.clearCache()
            b = rows_exact(new(spark, sf))
            release_scoped_caches()
            spark.catalog.clearCache()
            ok = a == b
            print(f"parity {qid} @ {sf}: {'MATCH' if ok else 'MISMATCH'}", flush=True)
            if not ok:
                print(" old:", a[:5])
                print(" new:", b[:5])
                sys.exit(1)

    # 2. plan dumps (before = old formulation, after = registered
    #    query at bench scale — the window tier, by dispatch; the
    #    *_forced entries dump the decomposed tier's plan)
    if not args.no_plans:
        out = REPO / "plans" / "r12"
        out.mkdir(parents=True, exist_ok=True)
        for qid, (old, new) in PAIRS.items():
            for tag, fn in (("before", old), ("after", new)):
                df = fn(spark, args.time_sf)
                (out / f"{qid}_{tag}.txt").write_text(formatted_plan(df))
                release_scoped_caches()
        print("plans dumped", flush=True)

    # 3. interleaved timing at the bench scale (bench protocol: warm
    #    once per arm, then alternate timed runs)
    results: dict[str, dict[str, list[float]]] = {
        q: {"old": [], "new": []} for q in PAIRS
    }
    for qid, (old, new) in PAIRS.items():
        for fn in (old, new):  # warm both arms
            force_evaluate(fn(spark, args.time_sf))
            release_scoped_caches()
            spark.catalog.clearCache()
        for _ in range(args.rounds):
            for arm, fn in (("old", old), ("new", new)):
                import gc

                gc.collect()
                t0 = time.perf_counter()
                force_evaluate(fn(spark, args.time_sf))
                dt = time.perf_counter() - t0
                release_scoped_caches()
                spark.catalog.clearCache()
                results[qid][arm].append(round(dt, 3))
    summary = {
        qid: {
            "old": r["old"],
            "new": r["new"],
            "old_median": round(statistics.median(r["old"]), 3) if r["old"] else None,
            "new_median": round(statistics.median(r["new"]), 3) if r["new"] else None,
        }
        for qid, r in results.items()
    }
    print(json.dumps(summary, indent=1))
    (REPO / "AB_r12_quantiles.json").write_text(json.dumps(summary, indent=1) + "\n")


if __name__ == "__main__":
    main()
