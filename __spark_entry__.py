"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``alpaca_pyspark_spark/queries/``; this module
is a thin adapter.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from alpaca_pyspark_spark.queries import ORACLE, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: OHLCV bar construction (the reference's core
    analytic semantic, SURVEY.md §2D D5) on sf0.001."""
    return QUERIES["q02_bars_tumbling"](spark, "/root/testdata/sf0.001")


#: The driver's correctness pass samples a fixed-size prefix of this
#: dict, so the first entries are a curated cross-section — one or
#: more oracle-paired representatives of EVERY query family (core
#: connector semantics, LLM dedup/similarity, text curation,
#: sampling, search/graph, mining, TPC-H shapes, advanced analytics,
#: warehouse, multimodal) — rather than insertion order, which front-
#: loaded the core module and left later families driver-unchecked.
#: The full registry is unchanged; only the ordering is curated.
_SHOWCASE_ORDER = [
    # ROUND 11: staged rotation per ROTATION.md — the final
    # debt-draining prefix.  24 never-driver-graded families (the 20
    # staged at ROTATION.md:63-73 + the four round-10 additions
    # q204/q205/q206/q92_lsh) clear the never-graded count to ZERO,
    # and the 26 sentinel slots seed the round-12+ re-validation
    # cadence with the highest-risk families: every EXECUTED streaming
    # query, every approximation dial, the live connector loop, and
    # the two sessionize consumers (q14/q107) whose adaptive skew
    # dispatch landed in round 10 AFTER their last driver grade —
    # plus q03, whose interval-agg path gains the same adaptive
    # dispatch this round (VERDICT r10 item 5).
    #
    # Sentinels — core semantics on freshly-changed code paths:
    "q01_scan_filter_project", "q02_bars_tumbling",
    "q03_interval_join_agg",          # adaptive dispatch lands r11
    "q06_asof_join",
    "q14_stream_session",             # adaptive sessionizer (r10 change)
    "q107_session_paths",             # adaptive sessionizer (r10 change)
    "q203_connector_roundtrip",       # live connector flagship
    # Sentinels — executed micro-batch streaming (highest-risk class):
    "q130_streaming_sessions_executed", "q131_streaming_dedup_executed",
    "q145_streaming_outer_join_executed",
    "q146_streaming_hourly_windows_executed",
    "q181_streaming_bars_executed", "q149_stream_static_enrich_executed",
    "q153_stateful_sessions_executed", "q190_streaming_quality_filter",
    "q191_streaming_curation", "q193_streaming_ingest_neardup",
    "q196_streaming_vector_search", "q199_streaming_budget_admission",
    "q197_corpus_build",
    # Sentinels — approximation dials + incremental maintenance:
    "q198_pq_adc_topk", "q200_ivf_index_maintenance", "q201_ivfpq_search",
    "q202_streaming_pq_search", "q202_dialed_pq_search",
    "q169_incremental_dedup",
    # 24 first-timers — round-10 flagships first (q204 is the
    # cosine bit-parity tripwire for ~30 vector oracles; its first
    # driver grade is the round's most informative single row):
    "q204_cosine_parity_canary", "q205_interval_agg_decomposed",
    "q206_cluster_reps_lsh_dialed", "q92_cluster_reps_lsh",
    # ...then ROTATION.md's staged 20:
    "q83_revenue_share_threshold", "q104_merkle_block_diff",
    "q167_rendezvous_rebalance", "q127_referential_integrity",
    "q85_large_volume_orders", "q88_idle_rich_customers",
    "q178_corpus_tokenize", "q137_collocation_lift",
    "q157_frequent_tokens_sketch",    # rows-only by design (sketch)
    "q93_bpe_merge_pairs", "q94_returned_revenue_customers",
    "q95_late_shipment_priority", "q96_promo_revenue_share",
    "q97_top_supplier", "q98_nation_pair_flows", "q99_profit_by_nation",
    "q101_local_supplier_revenue", "q111_priority_late_orders",
    "q112_discount_band_revenue", "q113_supplier_diversity",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, showcase
    cross-section first (see ``_SHOWCASE_ORDER``)."""
    ordered = {k: QUERIES[k] for k in _SHOWCASE_ORDER if k in QUERIES}
    ordered.update({k: v for k, v in QUERIES.items() if k not in ordered})
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query id; ids absent here are
    non-SQL-expressible (driver records a rows-only check)."""
    return dict(ORACLE)
