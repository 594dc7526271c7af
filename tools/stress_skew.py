"""Skew-sensitivity measurement: time the key-partitioned query
families on a uniform dataset vs its hot-key replica
(tools/make_skew.py — identical row count, ~30% of events on one
user_id), one warm JVM, bench timing protocol.  Default scale is the
sf1 stress replica (at sf0.1 every partition is sub-task-sized and
skew is invisible; measured 0.7-1.1x noise).  The ratio column
isolates pure skew sensitivity at constant volume; AQE (incl. its
skew-join mitigation) is on, as in production.

Families chosen for their partitioning exposure:
  join on the hot key:      q06 (as-of union+window; q03's interval
                            join is EXCLUDED by design — a within-day
                            self-join on a 30%-hot key is O(hot^2)
                            OUTPUT, ~1.5B pairs at sf1: the mitigation
                            there is salting/time-bucketing the key,
                            not a timing row)
  per-key windows/sessions: q14, q107
  per-key agg (combinable): q02 bars, q71 argmax — map-side partials
                            absorb skew, expected ~1x as the control
  explicit skew handling:   q34 salted heavy hitters

Writes SKEW_STRESS.json (MERGED per scale — the file holds one block
per uniform-dir basename, so sf1 and sf10 runs coexist) and prints a
table.  The q03/q205 pair contrasts the naive interval join (AQE's
skew-split parallelizes its ~6e10 hot-key pair comparisons into a
tight codegen loop — measured runnable, NOT a straggler) against the
hierarchical decomposition that removes the O(pairs) CPU term
entirely (~1e8 joined rows for the same answer).
Usage: python tools/stress_skew.py [--uniform DIR --skew DIR]
"""

from __future__ import annotations

import argparse
import gc
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from alpaca_pyspark_spark.queries import QUERIES
from alpaca_pyspark_spark.plans import force_evaluate
from alpaca_pyspark_spark.session import get_spark, release_scoped_caches

QUERIES_UNDER_TEST = [
    "q02_bars_tumbling",
    "q71_argmax_event",
    "q06_asof_join",
    "q14_stream_session",
    "q107_session_paths",
    "q34_salted_heavy_hitters",
    # round-10 extension (VERDICT r9 item 7): the remaining
    # key-partitioned families — per-key windows/sequences like q107
    "q74_cohort_retention",
    "q68_funnel",
    "q152_conversion_delay",
    # the interval-join pair: naive O(pairs) vs the hierarchical
    # decomposition (q205) — same oracle, ~500x fewer joined rows
    "q03_interval_join_agg",
    "q205_interval_agg_decomposed",
]

#: queries to skip on a given replica (substring match on the skew
#: dir).  Empty since round 10 measured the naive interval join IS
#: runnable at skew10 (AQE skew-split + codegen); kept as a mechanism.
SKIP: dict[str, str] = {}


def run_once(spark, qid: str, sf_dir: str) -> tuple[float, int]:
    release_scoped_caches()
    spark.catalog.clearCache()
    gc.collect()
    t0 = time.perf_counter()
    n = force_evaluate(QUERIES[qid](spark, sf_dir))
    dt = time.perf_counter() - t0
    release_scoped_caches()
    return dt, n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--uniform", default="/root/repo/.scratch/sf1")
    ap.add_argument("--skew", default="/root/repo/.scratch/skew1")
    ap.add_argument(
        "--only", nargs="*", default=None,
        help="re-measure only these ids and MERGE into the scale block",
    )
    args = ap.parse_args()
    spark = get_spark("stress-skew")
    spark.sparkContext.setLogLevel("ERROR")
    path = Path("SKEW_STRESS.json")
    merged = json.loads(path.read_text()) if path.exists() else {}
    scale = Path(args.uniform).name
    if args.only is not None and scale in merged:
        out = merged[scale]  # merge mode: refresh named rows in place
    else:
        out = {"_meta": {"uniform_dir": args.uniform, "skew_dir": args.skew,
                         "hot_share": "~30% of events on one user_id"}}
        merged[scale] = out
    for qid in args.only if args.only is not None else QUERIES_UNDER_TEST:
        if qid not in QUERIES:
            continue  # roster entry not registered yet
        if qid in SKIP and SKIP[qid] in args.skew:
            out[qid] = {"skipped": f"naive intermediate explodes on {SKIP[qid]}"}
            print(f"{qid:32s} SKIPPED ({out[qid]['skipped']})")
            path.write_text(json.dumps(merged, indent=1) + "\n")
            continue
        run_once(spark, qid, args.uniform)  # warm codegen per query
        tu, nu = run_once(spark, qid, args.uniform)
        run_once(spark, qid, args.skew)
        ts, ns = run_once(spark, qid, args.skew)
        ratio = ts / tu if tu else float("inf")
        out[qid] = {
            "uniform_s": round(tu, 2),
            "uniform_rows": nu,
            "skew_s": round(ts, 2),
            "skew_rows": ns,
            "skew_over_uniform": round(ratio, 2),
        }
        print(
            f"{qid:32s} uniform {tu:7.2f}s ({nu} rows)   "
            f"skew {ts:7.2f}s ({ns} rows)   ratio {ratio:5.2f}x"
        )
        path.write_text(json.dumps(merged, indent=1) + "\n")


if __name__ == "__main__":
    main()
