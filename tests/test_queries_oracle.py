"""Every oracle-paired declared query must match DuckDB on the same
parquet tables — the local mirror of the driver's correctness gate."""

from __future__ import annotations

import pytest

from alpaca_pyspark_spark.queries import ORACLE, QUERIES

from .conftest import (
    SF_DIR,
    assert_df_matches_oracle,
    assert_driver_canonicalizable,
)

ORACLE_PAIRED = sorted(ORACLE)
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLE))


@pytest.mark.parametrize("qid", ORACLE_PAIRED)
def test_query_matches_oracle(spark, oracle, assert_no_cache_residue, qid):
    df = QUERIES[qid](spark, SF_DIR)
    assert_df_matches_oracle(df, oracle, ORACLE[qid])


@pytest.mark.parametrize("qid", ROWS_ONLY)
def test_rows_only_query_runs(spark, assert_no_cache_residue, qid):
    df = QUERIES[qid](spark, SF_DIR)
    # full execution (not limit()) so a crash on ANY input row — the
    # q165 negative-slice class — surfaces here, like the driver's run
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
    # rows-only outputs must still survive the driver's pandas
    # canonicalization if they ever rotate into the graded prefix
    rows = df.limit(200).collect()
    cols = sorted(df.columns)
    assert_driver_canonicalizable(
        [tuple(r[c] for c in cols) for r in rows], cols
    )


def test_all_oracle_keys_have_queries():
    assert set(ORACLE) <= set(QUERIES)


def test_showcase_prefix_is_graded_cross_section():
    """The driver grades a fixed-size (50) prefix of queries():
    every prefix entry must exist, be oracle-paired (hash-gated, not
    rows-only), and the prefix must actually lead the dict."""
    import importlib.util
    from pathlib import Path

    entry_path = Path(__file__).resolve().parents[1] / "__spark_entry__.py"
    spec = importlib.util.spec_from_file_location("entry_mod_t", entry_path)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    so = m._SHOWCASE_ORDER
    assert len(so) >= 50
    assert all(k in QUERIES for k in so), set(so) - set(QUERIES)
    assert all(k in ORACLE for k in so[:50])
    assert list(m.queries())[:50] == so[:50]
