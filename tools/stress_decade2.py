"""Second measured decade for the round-10/11 flagship operators
(VERDICT r10 item 7): sf10 → sf100 on the tables each family reads
(events for sessionize/interval, embeddings+documents for the vector
dial), plus hot-key skew at a 30M-row hot key (skew100 — 10x the
skew10 hot key the round-10 rows were measured on).

Deliberately EXCLUDED at sf100, with the reason on record rather than
a silent cap:

* q205 on the full keyspace — 20M anchors x ~141 fan-out = 2.9B
  shuffle rows (~hundreds of GB), beyond local disk; the operator is
  the PER-KEY insurance branch of q03's dispatch, never a full-corpus
  plan at scale (SCALE.md round-11).
* q92_cluster_reps_lsh (pinned 8 planes) — 2M vectors / 256 buckets
  => ~7.8e9 candidate-pair rows; the quadratic growth is exactly what
  the q206 dial removes, and the pinned twin is a frozen baseline
  (COVERAGE.md pinned-twin policy), not a production shape.

Writes SKEW_STRESS.json's "sf100" block (events families) and
STRESS_SF100.json (sf10 → sf100 decade rows), same timing protocol as
tools/stress_skew.py / tools/stress_sf10.py (warm rep then timed rep,
caches released between runs).

Usage: python tools/stress_decade2.py [--skip-skew] [--skip-decade]
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

REPO = Path(__file__).resolve().parents[1]
SF100 = str(REPO / ".scratch/sf100")
SKEW100 = str(REPO / ".scratch/skew100")
SF10 = str(REPO / ".scratch/sf10")

#: events-only families measured hot-vs-uniform at the 30M-row hot key
SKEW_FAMILIES = ["q14_stream_session", "q107_session_paths", "q03_interval_join_agg"]
#: embeddings/documents families measured across the sf10 -> sf100 decade
DECADE_FAMILIES = ["q206_cluster_reps_lsh_dialed", "q204_cosine_parity_canary"]


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
    ap.add_argument("--skip-skew", action="store_true")
    ap.add_argument("--skip-decade", action="store_true")
    args = ap.parse_args()
    spark = get_spark("stress-decade2")
    spark.sparkContext.setLogLevel("ERROR")

    if not args.skip_skew:
        path = REPO / "SKEW_STRESS.json"
        merged = json.loads(path.read_text()) if path.exists() else {}
        out = merged.setdefault(
            "sf100",
            {
                "_meta": {
                    "uniform_dir": SF100,
                    "skew_dir": SKEW100,
                    "hot_share": "~30% of 100M events on one user_id (29.9M rows)",
                }
            },
        )
        for qid in SKEW_FAMILIES:
            run_once(spark, qid, SF100)  # warm codegen
            tu, nu = run_once(spark, qid, SF100)
            run_once(spark, qid, SKEW100)
            ts, ns = run_once(spark, qid, SKEW100)
            out[qid] = {
                "uniform_s": round(tu, 2),
                "uniform_rows": nu,
                "skew_s": round(ts, 2),
                "skew_rows": ns,
                "skew_over_uniform": round(ts / tu if tu else float("inf"), 2),
            }
            print(
                f"{qid:32s} uniform {tu:8.2f}s ({nu})   "
                f"skew {ts:8.2f}s ({ns})   ratio {ts / tu:5.2f}x",
                flush=True,
            )
            path.write_text(json.dumps(merged, indent=1) + "\n")

    if not args.skip_decade:
        dest = REPO / "STRESS_SF100.json"
        out = json.loads(dest.read_text()) if dest.exists() else {}
        out.setdefault(
            "_meta",
            {
                "decade": "sf10 -> sf100",
                "vector_dirs": "sf10_synth/sf100_synth — independent-"
                "direction synthetic embeddings (tools/make_embed_synth."
                "py): the chained replica gives every original vector "
                "~100 near-identical copies, so near-dup candidate "
                "graphs densify quadratically in REPLICA COUNT (the "
                "replica's artifact, not scale) — q206 on the chained "
                "sf100 filled 70 GB of spill and died measuring it",
                "excluded": {
                    "q205_interval_agg_decomposed": "full-keyspace fan-out "
                    "~2.9B shuffle rows exceeds local disk; per-key insurance "
                    "branch only (SCALE.md round-11)",
                    "q92_cluster_reps_lsh": "pinned 8-plane buckets give "
                    "~1e10 candidate pairs at 2M vectors; frozen baseline, "
                    "the q206 dial is the production shape",
                },
            },
        )
        s10, s100 = str(REPO / ".scratch/sf10_synth"), str(
            REPO / ".scratch/sf100_synth"
        )
        for qid in DECADE_FAMILIES:
            run_once(spark, qid, s10)
            t10, n10 = run_once(spark, qid, s10)
            t100, n100 = run_once(spark, qid, s100)
            out[qid] = {
                "sf10_sec": round(t10, 2),
                "sf100_sec": round(t100, 2),
                "sf10_rows": n10,
                "sf100_rows": n100,
                "vs_10x_linear": round(t100 / (10 * t10) if t10 else float("nan"), 2),
            }
            print(
                f"{qid:32s} sf10 {t10:7.2f}s ({n10})   "
                f"sf100 {t100:8.2f}s ({n100})   vs-linear "
                f"{out[qid]['vs_10x_linear']:5.2f}x",
                flush=True,
            )
            dest.write_text(json.dumps(out, indent=1) + "\n")


if __name__ == "__main__":
    main()
