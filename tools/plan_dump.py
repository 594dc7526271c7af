"""Dump ``explain("formatted")`` for named queries to plans/r<N>/.

Round-12 deliverable helper: captures the physical plan of each query
before/after an optimization so the judge can check plan claims
without running Spark.

Usage:
    python tools/plan_dump.py --round 12 --tag before q12_text_dedup q169_incremental_dedup
    python tools/plan_dump.py --round 12 --tag after --sf /root/testdata/sf0.01 all
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from alpaca_pyspark_spark.plans import formatted_plan  # noqa: E402
from alpaca_pyspark_spark.queries import QUERIES  # noqa: E402
from alpaca_pyspark_spark.session import get_spark  # noqa: E402
from alpaca_pyspark_spark.session import release_scoped_caches  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=12)
    ap.add_argument("--tag", choices=["before", "after"], required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("qids", nargs="+")
    args = ap.parse_args()

    out_dir = Path(__file__).resolve().parents[1] / "plans" / f"r{args.round}"
    out_dir.mkdir(parents=True, exist_ok=True)
    qids = sorted(QUERIES) if args.qids == ["all"] else args.qids

    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    for qid in qids:
        if qid not in QUERIES:
            print(f"!! unknown query: {qid}", file=sys.stderr)
            continue
        try:
            df = QUERIES[qid](spark, args.sf)
            plan = formatted_plan(df)
        except Exception as exc:  # plan-time failure is itself the report
            plan = f"PLAN FAILED: {exc!r}\n"
        finally:
            release_scoped_caches()
            spark.catalog.clearCache()
        path = out_dir / f"{qid}_{args.tag}.txt"
        path.write_text(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
