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
    # ROUND 9: the big drain.  VERDICT r8's headline was that the
    # never-driver-graded backlog (104/215) stays flat because the
    # rotation retires ~7 rows/round while the registry grows ~6 —
    # so this round retires EVERY row that is driver-green and whose
    # family keeps a prefix or gate representative (git history holds
    # the per-row retirement rationale of rounds 5–8), keeps 16
    # anchors spanning all families, and rotates in 34 never-graded
    # oracle-paired rows — every family that had only gate evidence
    # gets driver-graded this round.  Retired (all stay oracle-paired
    # in the registry + local gate): q03/q04/q05/q10 (core trimmed to
    # the 4 reference-distinctive semantics per VERDICT r8 item 1),
    # q181/q191/q199 (executed-streaming repped by q146/q153/q193 +
    # incoming q149/q202_dialed), q202 (replaced by its dial-scaled
    # twin, the strictly-harder configuration), q169/q164/q33/q163/
    # q177/q198 (dedup+vector repped by q193 + six incoming vector
    # rows), q15/q61/q186/q187/q165 (curation repped by q197/q188 +
    # four incoming text rows), q195 (prefix-sum family repped by
    # q194), q91/q123/q121 (graph/tokenizer/mining repped by q192 +
    # incoming q125/q170/q179/q50/q52/q76), q82 (TPC-H repped by
    # q87/q86/q40 + plan tests), q116/q129/q107/q139/q45 (analytics
    # repped by six incoming rows), q155/q150 (warehouse repped by
    # q161 + eight incoming sink/format rows), q18/q148 (multimodal
    # repped by q180).
    # core connector semantics (4 anchors) + the round-9 flagship:
    # the FULL live connector loop (replay API → poller stream →
    # REST sink 2-phase manifest → landed-data bars), hash-gated
    "q01_scan_filter_project", "q02_bars_tumbling",
    "q06_asof_join", "q07_adjustment",
    "q203_connector_roundtrip",       # flagship (r9, new)
    # VERDICT-r8-named first-timers, front-loaded: this round's own
    # vector additions, the last ungraded executed-streaming family,
    # the sink/file-format families, and the named analytics rows
    "q202_dialed_pq_search",          # scale-dial twin (r9, new)
    "q200_ivf_index_maintenance",     # first grade
    "q201_ivfpq_search",              # first grade
    "q149_stream_static_enrich_executed",  # first grade
    "q132_sink_roundtrip",            # first grade
    "q154_backfill_overwrite",        # first grade
    "q159_csv_ingest_quarantine",     # first grade
    "q77_bitmap_distinct_rollup",     # first grade
    "q35_pivot", "q36_unpivot",       # first grades
    "q68_funnel", "q74_cohort_retention",  # first grades
    # executed streaming anchors: windowed agg + custom keyed state +
    # stateless ingest dedup gate
    "q146_streaming_hourly_windows_executed",
    "q153_stateful_sessions_executed",
    "q193_streaming_ingest_neardup",
    # vector-family first-timers (PQ/IVF anchored by q200/q201/q202d
    # above): scalar quantization, hard-negative mining, kNN label
    # vote — embedding-pipeline breadth
    "q135_embedding_quantization", "q134_hard_negative_mining",
    "q140_knn_label_vote",
    # curation anchors + text first-timers
    "q197_corpus_build", "q188_classifier_quality_filter",
    "q54_pii_scrub", "q136_split_leakage_audit",
    "q173_dataset_card", "q43_data_profile",
    # tokenizer first-timers (train family q123 retired; encode and
    # fertility are the serving-side halves)
    "q170_bpe_encode", "q179_tokenizer_fertility",
    # selection/sampling: anchor + stratified first-timer
    "q194_token_budget_selection", "q144_stratified_sample",
    # search/graph: anchor + triangle-count first-timer
    "q192_hybrid_retrieval", "q125_triangle_count",
    # finance mining first-timers (reference-domain analytics)
    "q50_rolling_volatility", "q52_twap", "q76_ewma",
    # TPC-H anchors (q40 leaves after two green rounds to make room
    # for the q203 flagship: the keyless-interval family stays
    # oracle-paired in the registry + local gate and plan-pinned)
    "q87_dominant_supplier_parts", "q86_disjunctive_predicate_join",
    # analytics first-timers
    "q58_window_rank_suite", "q106_weighted_median",
    "q48_locf_gapfill", "q115_ignore_nulls_windows",
    # warehouse: CDC anchor + sink/format/layout first-timers
    "q161_cdc_merge_upsert",
    "q160_compaction_roundtrip", "q55_bloom_join_prune",
    "q156_null_safe_join", "q128_stable_row_ids",
    # multimodal anchor
    "q180_media_resize",
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
