"""Build a NULL-stress copy of the driver tables: deterministic ~5%
NULLs injected into nullable PAYLOAD columns (never join/window keys,
never event time — those are a different product contract, enforced
upstream by ingestion).

Real corpora carry NULLs the synthetic fixtures don't (failed
extractions, absent metadata, unpriced rows), and NULL semantics are
where engines genuinely diverge (aggregate skipping, arg_min/min_by
NULL handling, NULL group keys, string ops on NULL) — so the oracle
gate must hold on NULL-bearing data, not just on the all-populated
fixtures.  Injection is hash-deterministic (xxhash64 of the row key ×
column name), so the dataset is reproducible bit-for-bit:

    python tools/make_nullstress.py
    python tools/driver_mimic.py /root/repo/.scratch/nulls --out ORACLE_NULLS_r9.json

Usage: python tools/make_nullstress.py [--dest /root/repo/.scratch/nulls]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from alpaca_pyspark_spark.session import get_spark
from alpaca_pyspark_spark.tables import TABLE_NAMES, load

# (table, key column for the hash) -> payload columns to null-stress.
# Keys, timestamps, and dimension tables stay intact: joins, windows,
# and the sentinel protocol key on them by contract.
PLAN: dict[str, tuple[str, list[str]]] = {
    "events": ("event_id", ["value", "event_type"]),
    "documents": ("doc_id", ["text", "lang", "source"]),
    "lineitem": ("l_orderkey", ["l_extendedprice", "l_quantity", "l_discount", "l_linestatus"]),
    "orders": ("o_orderkey", ["o_totalprice", "o_orderpriority"]),
    "customer": ("c_custkey", ["c_acctbal"]),
    "embeddings": ("vec_id", ["embedding"]),
}

RATE = 20  # 1-in-20 ≈ 5%


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.001")
    ap.add_argument("--dest", default="/root/repo/.scratch/nulls")
    args = ap.parse_args()
    spark = get_spark("make-nullstress")
    spark.sparkContext.setLogLevel("ERROR")
    for t in TABLE_NAMES:
        df = load(spark, args.src, t)
        if t in PLAN:
            key, cols = PLAN[t]
            for c in cols:
                h = F.xxhash64(F.col(key).cast("string"), F.lit(c))
                df = df.withColumn(
                    c, F.when(F.pmod(h, F.lit(RATE)) != 0, F.col(c))
                )
        df.coalesce(1).write.mode("overwrite").parquet(
            f"{args.dest}/{t}.parquet"
        )
        n = df.count()
        print(t, "rows:", n)


if __name__ == "__main__":
    main()
