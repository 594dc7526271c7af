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
    # ROUND 10: staged rotation per ROTATION.md:27-46 — 5 sentinels +
    # 45 never-driver-graded families.  One swap vs the staged list:
    # q197_corpus_build (driver-r9 green, stays oracle-paired in the
    # registry + local gate) yields its sentinel slot to
    # q200_ivf_index_maintenance, round 9's single red row (driver
    # hash mismatch on its DECIMAL(38,0) output columns, now emitted
    # as BIGINT on both sides) — VERDICT r9 item 1 requires q200 back
    # in the graded prefix, and the swap preserves the staged 45
    # first-time families so the never-graded debt still drops to 20.
    # Sentinels: multi-round-green continuity + the connector flagship
    # + the red-row regrade.
    "q01_scan_filter_project", "q02_bars_tumbling", "q06_asof_join",
    "q200_ivf_index_maintenance",     # r9 red row, fixed — regrade
    "q203_connector_roundtrip",       # flagship (r9)
    # 45 never-graded families, in ROTATION.md's staged order:
    # text/curation audits
    "q183_repetition_filter", "q184_stopword_filter",
    "q185_temperature_mixture", "q166_ngram_novelty",
    "q168_privacy_audit", "q171_matryoshka_audit",
    "q174_template_prefixes", "q175_lang_label_audit",
    "q172_kwic_index",
    # embedding/vector breadth
    "q42_embedding_ops", "q124_random_projection",
    "q133_token_rarity_profile", "q141_cross_source_overlap",
    "q158_source_language_gini", "q162_cross_validation_folds",
    # analytics/mining
    "q49_listagg", "q51_drawdown", "q53_document_chunking",
    "q56_token_vocab", "q57_stratified_sample", "q59_conditional_agg",
    "q62_repetition_stats", "q63_corpus_mixture",
    "q64_shipping_priority", "q65_exists_subquery",
    "q138_pareto_frontier", "q151_rfm_segments",
    "q152_conversion_delay", "q142_last_touch_attribution",
    "q143_seasonal_naive_error", "q66_order_count_distribution",
    "q67_interval_coalesce", "q69_snapshot_diff",
    "q70_small_quantity_revenue", "q71_argmax_event",
    "q72_value_histogram", "q73_weighted_sample",
    "q75_hopping_window", "q108_schema_evolution_union",
    "q109_trailing_active_users", "q117_sequence_gaps",
    "q119_grouped_mode", "q147_clustering_coefficient",
    "q80_brand_skyline", "q81_grouped_regression",
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
