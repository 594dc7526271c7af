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
def test_query_matches_oracle(spark, oracle, qid):
    df = QUERIES[qid](spark, SF_DIR)
    assert_df_matches_oracle(df, oracle, ORACLE[qid])


@pytest.mark.parametrize("qid", ROWS_ONLY)
def test_rows_only_query_runs(spark, qid):
    df = QUERIES[qid](spark, SF_DIR)
    rows = df.limit(200).collect()
    assert len(df.schema.fields) > 0
    # rows-only outputs must still survive the driver's pandas
    # canonicalization if they ever rotate into the graded prefix
    cols = sorted(df.columns)
    assert_driver_canonicalizable(
        [tuple(r[c] for c in cols) for r in rows], cols
    )


def test_all_oracle_keys_have_queries():
    assert set(ORACLE) <= set(QUERIES)
