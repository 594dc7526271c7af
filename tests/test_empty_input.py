"""Empty-input totality: every query must be TOTAL on zero-row tables
(empty slices are routine at scale — an empty backfill partition, an
all-filtered crawl slice, a symbol with no trades).

The FULL 217-query empty gate is the committed artifact
`ORACLE_EMPTY_r9.json` (built via `tools/make_empty.py` +
`tools/driver_mimic.py`); this suite pins the cheap representatives of
each failure class the round-9 sweep found, so a regression fails in
seconds here instead of resurfacing only in the artifact run:

- empty model-artifact collects (ANN/PQ centroid+codebook training),
- parquet read-back schema inference over zero part files,
- ANSI divide-by-zero in global-aggregate ratios,
- Spark's nonstandard empty-input ROLLUP/CUBE (no ()-row; the
  q05/q21/q22 oracles pin it with HAVING count(*) > 0),
- the q24 explicit-interpolation guard indices on n = 0.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from alpaca_pyspark_spark.queries import QUERIES
from alpaca_pyspark_spark.tables import TABLE_NAMES, load

from .conftest import SF_DIR

# cheap representatives of each empty-input failure class (executed
# streams and the connector loop are covered by the artifact run —
# too slow for the unit suite)
REPRESENTATIVES = [
    "q05_groupby_rollup",
    "q21_grouping_sets",
    "q22_cube",
    "q24_percentiles",
    "q13_embedding_sim",
    "q13_embedding_sim_ivf_det",
    "q132_sink_roundtrip",
    "q150_partitioned_roundtrip",
    "q173_dataset_card",
]


@pytest.fixture(scope="module")
def empty_dir(spark, tmp_path_factory):
    dest = str(tmp_path_factory.mktemp("empty_sf"))
    for t in TABLE_NAMES:
        load(spark, SF_DIR, t).limit(0).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{dest}/{t}.parquet")
    return dest


@pytest.mark.parametrize("qid", REPRESENTATIVES)
def test_query_total_on_empty_input(spark, empty_dir, qid):
    df = QUERIES[qid](spark, empty_dir)
    rows = df.collect()
    if qid == "q173_dataset_card":
        # global aggregate: one row, ratios NULL (DuckDB /0 semantics)
        assert len(rows) == 1
        assert rows[0]["avg_chars"] is None and rows[0]["dup_rate"] is None
    else:
        assert rows == []


def test_rollup_empty_matches_pinned_oracle_semantics(spark, empty_dir):
    """Spark emits NO grouping-set rows on empty input (deviating from
    the SQL-standard one-()-row); the oracles pin that with
    HAVING count(*) > 0 — assert the Spark side really is empty, not
    relying on fixture luck."""
    e = spark.createDataFrame([], "a string, b string, x long")
    assert e.rollup("a", "b").agg(F.sum("x")).collect() == []
    assert e.cube("a", "b").agg(F.sum("x")).collect() == []
