"""A/B probe (round 12): ``spark.sql.join.preferSortMergeJoin=false``
(+ the AQE local-map SMJ->SHJ rewrite threshold) over a join-heavy
query subset — guide §3.1/§9: let the planner pick shuffled-hash
join when its size conditions are met, avoiding SMJ's sorts.

Alternated per round in one JVM; medians reported.
Run: python tools/ab_r12_shj.py /root/testdata/sf0.1 [N]
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

from alpaca_pyspark_spark import session as sess  # noqa: E402
from alpaca_pyspark_spark.plans import force_evaluate  # noqa: E402
from alpaca_pyspark_spark.queries import QUERIES  # noqa: E402
from alpaca_pyspark_spark.session import get_spark  # noqa: E402
from alpaca_pyspark_spark.session import release_scoped_caches  # noqa: E402

QIDS = [
    "q99_profit_by_nation",
    "q98_nation_pair_flows",
    "q23_star_join",
    "q110_cheapest_supplier",
    "q127_referential_integrity",
    "q03_interval_join_agg",
    "q101_local_supplier_revenue",
    "q113_supplier_diversity",
    "q106_weighted_median",
    "q141_cross_source_overlap",
    "q163_setsim_prefix_join",
    "q82_sole_late_shipper",
]

SHJ_CONFS = {
    "spark.sql.join.preferSortMergeJoin": "false",
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "64m",
}


def set_mode(spark, on: bool) -> None:
    for k, v in SHJ_CONFS.items():
        if on:
            spark.conf.set(k, v)
        else:
            spark.conf.unset(k)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab-r12-shj")
    spark.sparkContext.setLogLevel("ERROR")
    times: dict[str, dict[str, list[float]]] = {
        q: {"smj": [], "shj": []} for q in QIDS
    }
    # warm both modes once
    for mode in ("smj", "shj"):
        set_mode(spark, mode == "shj")
        for q in QIDS:
            force_evaluate(QUERIES[q](spark, sf_dir))
            release_scoped_caches()
            spark.catalog.clearCache()
    import gc

    for r in range(rounds):
        for mode in ("smj", "shj"):
            set_mode(spark, mode == "shj")
            for q in QIDS:
                spark.catalog.clearCache()
                gc.collect()
                t0 = time.perf_counter()
                force_evaluate(QUERIES[q](spark, sf_dir))
                dt = time.perf_counter() - t0
                release_scoped_caches()
                spark.catalog.clearCache()
                times[q][mode].append(dt)
        print(f"# round {r} done", flush=True)
    tot = {"smj": 0.0, "shj": 0.0}
    for q in QIDS:
        med = {m: statistics.median(ts) for m, ts in times[q].items()}
        tot["smj"] += med["smj"]
        tot["shj"] += med["shj"]
        print(
            f"{q}: smj={med['smj']:.3f}s shj={med['shj']:.3f}s "
            f"ratio={med['shj'] / med['smj']:.2f}"
        )
    print(f"TOTAL medians: smj={tot['smj']:.2f}s shj={tot['shj']:.2f}s")


if __name__ == "__main__":
    main()
