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
]


def _q163_setsim_bounded(spark, sf_dir):
    """Stress-only harness entry: setsim_partner_profile at q163's
    exact parameters (3-word shingles, J >= 1/2)."""
    from alpaca_pyspark_spark.queries.llm import tune
    from alpaca_pyspark_spark.operators.dedup import setsim_partner_profile
    from alpaca_pyspark_spark.tables import load

    tune(spark)
    return setsim_partner_profile(
        load(spark, sf_dir, "documents"),
        id_col="doc_id", text_col="text", shingle_k=3,
        threshold_num=1, threshold_den=2,
    )


def _q92_cluster_reps_lsh(spark, sf_dir):
    """Stress-only harness entry: q92's pipeline with the LSH scale
    dial (sign-bucket candidates, num_planes=8) instead of the exact
    all-pairs baseline; identical clustering + representative rule."""
    from pyspark.sql import functions as F

    from alpaca_pyspark_spark.operators.components import connected_components
    from alpaca_pyspark_spark.operators.dedup import embedding_near_duplicates
    from alpaca_pyspark_spark.queries.llm import tune
    from alpaca_pyspark_spark.tables import load

    tune(spark)
    emb = load(spark, sf_dir, "embeddings")
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    pairs = embedding_near_duplicates(
        emb, id_col="vec_id", vec_col="embedding", threshold=0.5, num_planes=8,
        dim=64,
    )
    comp = connected_components(
        pairs, emb, src="id_a", dst="id_b", vertex_id="vec_id"
    )
    return (
        comp.join(docs, comp.id == docs.doc_id)
        .groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.max(
                F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("neg_id"))
            ).alias("__m"),
            F.max("n_chars").alias("rep_chars"),
        )
        .select(
            "component",
            "n_members",
            (-F.col("__m.neg_id")).alias("rep_doc_id"),
            "rep_chars",
        )
    )


EXTRA = {
    "q163_setsim_bounded": _q163_setsim_bounded,
    "q92_cluster_reps_lsh": _q92_cluster_reps_lsh,
}


def run_once(spark, qid: str, sf_dir: str) -> tuple[float, int]:
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    n = (QUERIES.get(qid) or EXTRA[qid])(spark, sf_dir).count()
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
