"""Second measured decade (round-8; VERDICT r7 item 4): run the
scale-claimed FLAGSHIP families at sf1 and at the 100x sf10 stress
replica (tools/make_sf1.py chained: ``--src .scratch/sf1 --dest
.scratch/sf10 --nonce-tag B``) in ONE warm JVM and report wall-times
plus the ratio against naive 10x-linear extrapolation from sf1.

Two decades of measurement (sf0.1->sf1 in STRESS_SF1.json, sf1->sf10
here) are the strongest available evidence for the 100 TB design
claims short of a real cluster: a family whose vs-linear ratio holds
<=~1x across BOTH decades has no hidden superlinear term in data
volume (the remaining scale risks — executor count, network — are
cluster properties local mode cannot measure, documented in SCALE.md).

Flagships (the families whose 100 TB story SCALE.md leans on):
  q189  composed curation ledger (the batch pipeline capstone)
  q169  incremental delta-vs-corpus dedup (the daily-ingest shape)
  q193  streaming ingest near-dup gate (q169 executed as a stream)
  q163  lossless PPJoin set-similarity (candidate bound = prefix filter)
  q91   pagerank (iterative broadcast-join fixed point)
  q197  crawl-to-training-shards composition (ledger -> pack -> sink)
  q13_embedding_sim_ann  bucketed ANN (the sub-quadratic escape)

Usage: python tools/stress_sf10.py [--sf10 /root/repo/.scratch/sf10]
Writes STRESS_SF10.json and prints a table.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from alpaca_pyspark_spark.queries import QUERIES
from alpaca_pyspark_spark.plans import force_evaluate
from alpaca_pyspark_spark.session import get_spark, release_scoped_caches

FLAGSHIPS = [
    "q189_curation_pipeline",
    "q169_incremental_dedup",
    "q193_streaming_ingest_neardup",
    "q163_setsim_prefix_join",
    "q91_pagerank_suppliers",
    "q197_corpus_build",
    "q13_embedding_sim_ann",
    # round-8 additions: PQ train/encode/serve, minimal-state
    # streaming admission, delta-proportional index maintenance
    "q198_pq_adc_topk",
    "q199_streaming_budget_admission",
    "q200_ivf_index_maintenance",
    "q201_ivfpq_search",
    "q202_streaming_pq_search",
    # round 9 (VERDICT r8 items 2+6): the dial-scaled q202 twin (the
    # scale-correct configuration, now registry+oracle-gated), the
    # two top-k selection families, cluster representatives, and the
    # density-BOUNDED q163 companion (the per-document profile whose
    # sf10 leg is measurable where the lossless pair list's own
    # output explodes — see SCALE.md's q163 note)
    "q202_dialed_pq_search",
    "q187_dsir_importance",
    "q188_classifier_quality_filter",
    # q92's REGISTERED form is the sanctioned exact-quadratic baseline
    # (num_planes=None: O(n^2) blocked all-pairs) — its sf10 leg would
    # measure the quadratic term by construction (~100x work per 10x
    # rows; the sf0.1->sf1 decade in STRESS_SF1.json shows it).  The
    # sweep therefore measures the LSH-bucketed dial (num_planes=8,
    # the deployment configuration, same downstream components +
    # representative selection) — the q163-style "measure the scale
    # path, document the exact baseline" split.
    "q92_cluster_reps_lsh",
    "q163_setsim_bounded",
    # round-9 batch 2: second-decade rows for every remaining
    # (measurable) scale-claimed family — the two exact-quadratic
    # baselines (q176, q92 exact) and the two disk-/output-capped
    # pair-list shapes (q163 lossless) stay deliberately absent with
    # their SCALE.md explanations
    "q185_temperature_mixture", "q148_frame_sampling",
    "q186_span_dedup_rewrite", "q184_stopword_filter",
    "q194_token_budget_selection", "q02_bars_tumbling",
    "q195_coverage_quota_selection", "q177_semdedup",
    "q192_hybrid_retrieval", "q183_repetition_filter",
    "q182_perplexity_filter", "q123_bpe_train",
    "q190_streaming_quality_filter", "q33_near_dup_components_lsh",
    "q12_text_dedup_portable", "q191_streaming_curation",
    # round 10: the skew-adaptive sessionizers (per-key hot probe +
    # time-bucket pre-split), the hierarchical interval decomposition
    # (q03's quadratic-CPU term removed), and the cosine canary
    "q14_stream_session", "q107_session_paths",
    "q205_interval_agg_decomposed", "q204_cosine_parity_canary",
    # q92's LSH family: the registered fixed-8-plane twin stays as the
    # pinned-dial contrast (1.76x over-linear by construction); the
    # DIALED form (planes from count via lsh_planes_dial, occupancy
    # pinned ~32) is the deployment configuration
    "q206_cluster_reps_lsh_dialed",
]


from stress_extra import EXTRA  # noqa: E402  (shared harness entries)


def run_once(spark, qid: str, sf_dir: str) -> tuple[float, int]:
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    n = force_evaluate((QUERIES.get(qid) or EXTRA[qid])(spark, sf_dir))
    dt = time.perf_counter() - t0
    release_scoped_caches()
    return dt, n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf1", default="/root/repo/.scratch/sf1")
    ap.add_argument("--sf10", default="/root/repo/.scratch/sf10")
    ap.add_argument(
        "--only",
        nargs="*",
        default=None,
        help="run only these ids and MERGE into STRESS_SF10.json",
    )
    args = ap.parse_args()
    spark = get_spark("stress-sf10")
    spark.sparkContext.setLogLevel("ERROR")
    dest = Path(__file__).resolve().parents[1] / "STRESS_SF10.json"
    # seed from the existing artifact in FULL sweeps too (ADVICE r8):
    # per-query flushes otherwise overwrite a complete artifact with a
    # partial one on the first iteration, so a mid-sweep crash used to
    # lose the previous complete file.  Fresh timings still replace
    # old rows as each query completes.
    out = {}
    if dest.exists():
        out = json.loads(dest.read_text())
        if args.only is None:
            # FULL sweep: drop rows for retired queries so the artifact
            # never mixes current and stale measurements (review r9) —
            # --only runs keep everything and merge
            out = {k: v for k, v in out.items() if k in FLAGSHIPS}
    for qid in args.only if args.only is not None else FLAGSHIPS:
        # warm codegen/page-cache on the smaller scale, then time both
        run_once(spark, qid, args.sf1)
        t1, n1 = run_once(spark, qid, args.sf1)
        t10, n10 = run_once(spark, qid, args.sf10)
        ratio = t10 / (10 * t1) if t1 > 0 else float("nan")
        out[qid] = {
            "sf1_sec": round(t1, 2),
            "sf10_sec": round(t10, 2),
            "sf1_rows": n1,
            "sf10_rows": n10,
            "vs_10x_linear": round(ratio, 2),
        }
        print(
            f"{qid:35s} sf1 {t1:7.2f}s ({n1} rows)   "
            f"sf10 {t10:8.2f}s ({n10} rows)   vs-linear {ratio:5.2f}x",
            flush=True,
        )
        dest.write_text(json.dumps(out, indent=1) + "\n")


if __name__ == "__main__":
    main()
