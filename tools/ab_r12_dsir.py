"""A/B probe (round 12): three shapes for the DSIR raw-LM
``n_bigram_types`` attach in q187/q189 —

  V0  single-partition window (the pre-r12 shape: Exchange
      SinglePartition over the whole bigram-type table),
  V1  scoped_persist(pair_tbl) + scalar agg + 1-row broadcast join,
  V2  NO persist: recompute the pair agg for the scalar (map-side
      combined second exchange) + 1-row broadcast join.

Alternated N rounds in one JVM so long-JVM drift cancels; medians
reported.  Run: python tools/ab_r12_dsir.py /root/testdata/sf0.1 [N]
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from alpaca_pyspark_spark.plans import force_evaluate  # noqa: E402
from alpaca_pyspark_spark.queries import llm  # noqa: E402
from alpaca_pyspark_spark.session import (  # noqa: E402
    get_spark,
    release_scoped_caches,
    scoped_persist,
)


def v0(trans: DataFrame) -> DataFrame:
    return (
        trans.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("pair_r"))
        .withColumn("first_r", F.sum("pair_r").over(Window.partitionBy("w1")))
        .withColumn(
            "n_bigram_types", F.count(F.lit(1)).over(Window.partitionBy())
        )
    )


def v1(trans: DataFrame) -> DataFrame:
    pair_tbl = scoped_persist(
        trans.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("pair_r"))
    )
    nbt = pair_tbl.agg(F.count(F.lit(1)).alias("n_bigram_types")).withColumn(
        "__k", F.lit(1)
    )
    return (
        pair_tbl.withColumn(
            "first_r", F.sum("pair_r").over(Window.partitionBy("w1"))
        )
        .withColumn("__k", F.lit(1))
        .join(F.broadcast(nbt), "__k")
        .drop("__k")
    )


def v2(trans: DataFrame) -> DataFrame:
    pair_tbl = trans.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("pair_r"))
    nbt = pair_tbl.agg(F.count(F.lit(1)).alias("n_bigram_types")).withColumn(
        "__k", F.lit(1)
    )
    return (
        pair_tbl.withColumn(
            "first_r", F.sum("pair_r").over(Window.partitionBy("w1"))
        )
        .withColumn("__k", F.lit(1))
        .join(F.broadcast(nbt), "__k")
        .drop("__k")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab-r12-dsir")
    spark.sparkContext.setLogLevel("ERROR")
    fn = llm.QUERIES["q187_dsir_importance"]
    variants = {"v0_window": v0, "v1_persist": v1, "v2_recompute": v2}
    times: dict[str, list[float]] = {k: [] for k in variants}
    # one untimed warm pass per variant first
    for name, impl in variants.items():
        llm._dsir_raw_lm = impl
        force_evaluate(fn(spark, sf_dir))
        release_scoped_caches()
        spark.catalog.clearCache()
    for r in range(rounds):
        for name, impl in variants.items():
            llm._dsir_raw_lm = impl
            spark.catalog.clearCache()
            import gc

            gc.collect()
            t0 = time.perf_counter()
            n = force_evaluate(fn(spark, sf_dir))
            dt = time.perf_counter() - t0
            release_scoped_caches()
            spark.catalog.clearCache()
            times[name].append(dt)
            print(f"# r{r} {name}: {n} rows {dt:.3f}s", flush=True)
    for name, ts in times.items():
        print(
            f"{name}: median={statistics.median(ts):.3f}s "
            f"all={[round(t, 3) for t in ts]}"
        )


if __name__ == "__main__":
    main()
