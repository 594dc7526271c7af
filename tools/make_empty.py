"""Build a ZERO-ROW copy of every driver table (schemas preserved).

Empty slices are routine at scale — a backfill of an empty partition
day, an all-filtered crawl slice, a symbol with no trades — so every
registry query must be TOTAL on zero-row input: return its empty (or
global-aggregate) result instead of crashing.  The empty gate runs the
full oracle compare on this dataset:

    python tools/make_empty.py
    python tools/driver_mimic.py /root/repo/.scratch/empty --out ORACLE_EMPTY_r9.json

The round-9 sweep found 24 of 217 queries crashing or diverging here
(driver-side collect()[0] on empty model artifacts, parquet
read-back schema inference with zero part files, sentinel arithmetic
on max(ts)=NULL, ANSI divide-by-zero in global ratios, Spark's
nonstandard empty-input ROLLUP/CUBE row) — all fixed; the gate is
green end-to-end.

Usage: python tools/make_empty.py [--dest /root/repo/.scratch/empty]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from alpaca_pyspark_spark.session import get_spark
from alpaca_pyspark_spark.tables import TABLE_NAMES, load


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.001")
    ap.add_argument("--dest", default="/root/repo/.scratch/empty")
    args = ap.parse_args()
    spark = get_spark("make-empty")
    spark.sparkContext.setLogLevel("ERROR")
    for t in TABLE_NAMES:
        df = load(spark, args.src, t).limit(0)
        df.coalesce(1).write.mode("overwrite").parquet(
            f"{args.dest}/{t}.parquet"
        )
        print(t, "rows:", df.count())


if __name__ == "__main__":
    main()
