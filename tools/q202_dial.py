"""Measure q202's IVF dial at sf10: the registered query pins
cells=16 for the oracle, so its fixed-dial decade measures
O(|Q|·n/cells) candidate growth; this script re-runs the IDENTICAL
serving pipeline with cells=256 (the value a deployment would pick at
this corpus size) to show the dial restores the per-query bound.

Usage: SPARK_DRIVER_MEM=64g python tools/q202_dial.py [SF_DIR]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from alpaca_pyspark_spark.queries.llm import _q202_artifacts, _q202_transform
from alpaca_pyspark_spark.session import get_spark, release_scoped_caches
from alpaca_pyspark_spark.streaming.gate import run_streaming_gate
from alpaca_pyspark_spark.tables import load

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf10"


def run(spark, cells: int) -> tuple[float, int]:
    t0 = time.perf_counter()
    emb = load(spark, SF, "embeddings")
    arts = _q202_artifacts(spark, SF, cells=cells)
    release_scoped_caches()
    queries = emb.filter(F.col("vec_id") % 25 == 0).select("vec_id", "embedding")
    out = run_streaming_gate(
        spark, [(queries, None)], _q202_transform(*arts), prefix=f"dial{cells}"
    )
    n = out.count()
    release_scoped_caches()
    return time.perf_counter() - t0, n


def main() -> None:
    spark = get_spark("q202-dial")
    spark.sparkContext.setLogLevel("ERROR")
    for cells in (16, 256):
        dt, n = run(spark, cells)
        print(f"cells={cells:4d}  wall {dt:8.2f}s  rows {n}", flush=True)


if __name__ == "__main__":
    main()
