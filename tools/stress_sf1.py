"""Round-5 scale-evidence run: execute the scale-claimed operator
families at sf0.1 and at the 10x sf1 stress replica (tools/make_sf1.py)
in ONE warm JVM, and report wall-times plus the ratio against naive
10x-linear extrapolation.

Families (VERDICT round-4 item 3):
  dedup:     q12_text_dedup_portable, q163_setsim_prefix_join,
             q169_incremental_dedup
  ANN:       q13_embedding_sim_ann, q176_knn_graph_exact, q177_semdedup
  iterative: q91_pagerank_suppliers, q123_bpe_train,
             q33_near_dup_components_lsh
  baseline:  q02_bars_tumbling (core scan+agg)
  quality:   q182_perplexity_filter, q183_repetition_filter,
             q184_stopword_filter, q185_temperature_mixture
  curation:  q186_span_dedup_rewrite (global span canon + rewrite
             ledger), q187_dsir_importance (corpus explode feeding
             three consumers off one scoped persist)

Expected shapes: linear operators should land near ratio 1x of the
extrapolation (sub-linear where fixed per-query overhead dominates at
sf0.1); the EXACT quadratic family (q176, and q177's within-cell
pairs) grows O(n^2) in compute by design — the written claim is that
the blocked-triangle layout keeps per-task work bounded and the
exchange linear, with the ANN/LSH twins as the sub-quadratic escape.

Usage: python tools/stress_sf1.py [--sf1 /root/repo/.scratch/sf1]
Writes STRESS_SF1.json and prints a table.
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

QUERIES_UNDER_TEST = [
    "q02_bars_tumbling",
    "q12_text_dedup_portable",
    "q163_setsim_prefix_join",
    "q169_incremental_dedup",
    "q13_embedding_sim_ann",
    "q176_knn_graph_exact",
    "q177_semdedup",
    "q91_pagerank_suppliers",
    "q123_bpe_train",
    "q33_near_dup_components_lsh",
    "q182_perplexity_filter",
    "q183_repetition_filter",
    "q184_stopword_filter",
    "q185_temperature_mixture",
    "q186_span_dedup_rewrite",
    "q187_dsir_importance",
    "q188_classifier_quality_filter",
    "q189_curation_pipeline",
    "q190_streaming_quality_filter",
    # round 6: the fixed frame fan-out and the streaming curation
    # flagship get measured decade rows too
    "q148_frame_sampling",
    "q191_streaming_curation",
    # round 7: hybrid lexical+dense retrieval with RRF fusion, and
    # the streaming delta-vs-corpus near-dup ingest gate
    "q192_hybrid_retrieval",
    "q193_streaming_ingest_neardup",
    # round 7: budget/quota selection (distributed prefix-sum path)
    "q194_token_budget_selection",
    "q195_coverage_quota_selection",
    # round 7: online vector search served as a live stream
    "q196_streaming_vector_search",
    # round 8: the crawl-to-training-shards composition, PQ-ADC
    # (train+encode+serve), streaming budget admission (minimal-state
    # stateful fold), and incremental IVF maintenance (delta-
    # proportional index upkeep)
    "q197_corpus_build",
    "q198_pq_adc_topk",
    "q199_streaming_budget_admission",
    "q200_ivf_index_maintenance",
    "q201_ivfpq_search",
    "q202_streaming_pq_search",
    # round 9: dial-scaled q202 twin, cluster representatives, and
    # the density-bounded q163 companion (first decade each)
    "q202_dialed_pq_search",
    "q92_cluster_representatives",
    "q92_cluster_reps_lsh",
    "q163_setsim_bounded",
    # round 9 (late): the connector-roundtrip flagship's first decade.
    # The replay endpoint + tape build are the API stand-in (world
    # side) and scale with the tape by construction; this row measures
    # that the ENGINE side of the loop — poller slices, paged fetch,
    # sink paged-POST/manifests, landed-bar shuffle — stays linear
    # across a 10x tape.
    "q203_connector_roundtrip",
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
    ap.add_argument("--sf01", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--only",
        nargs="*",
        default=None,
        help="run only these query ids and MERGE their rows into the "
        "existing STRESS_SF1.json (incremental additions don't force "
        "a full re-sweep; same one-warm-JVM protocol per run)",
    )
    args = ap.parse_args()
    spark = get_spark("stress-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    dest = Path(__file__).resolve().parents[1] / "STRESS_SF1.json"
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
            out = {k: v for k, v in out.items() if k in QUERIES_UNDER_TEST}
    for qid in args.only if args.only is not None else QUERIES_UNDER_TEST:
        # warm codegen/page-cache on the small scale, then time both
        run_once(spark, qid, args.sf01)
        t01, n01 = run_once(spark, qid, args.sf01)
        t1, n1 = run_once(spark, qid, args.sf1)
        ratio = t1 / (10 * t01) if t01 > 0 else float("nan")
        out[qid] = {
            "sf0.1_sec": round(t01, 2),
            "sf1_sec": round(t1, 2),
            "sf0.1_rows": n01,
            "sf1_rows": n1,
            "vs_10x_linear": round(ratio, 2),
        }
        print(
            f"{qid:35s} sf0.1 {t01:7.2f}s ({n01} rows)   "
            f"sf1 {t1:8.2f}s ({n1} rows)   vs-linear {ratio:5.2f}x",
            flush=True,
        )
        # write after EVERY query (like stress_sf10): a crash mid-sweep
        # keeps the completed rows, and --only can resume from them
        dest.write_text(json.dumps(out, indent=1) + "\n")


if __name__ == "__main__":
    main()
