"""Doc-drift checks: numbers quoted in the prose must be DERIVED from
the live registry, not hand-maintained (round-4 VERDICT flagged stale
counts in USAGE.md)."""

from __future__ import annotations

import re
from pathlib import Path

from alpaca_pyspark_spark.queries import ORACLE, QUERIES

REPO = Path(__file__).resolve().parents[1]


def test_usage_registry_counts():
    """USAGE.md's 'ids q01–qNN, X of Y oracle-paired' sentence must
    match the registry exactly."""
    text = (REPO / "USAGE.md").read_text()
    m = re.search(r"ids q01–q(\d+), (\d+) of (\d+) oracle-paired", text)
    assert m, "USAGE.md registry-count sentence not found"
    max_id = max(int(re.match(r"q(\d+)", k).group(1)) for k in QUERIES)
    assert int(m.group(1)) == max_id, (m.group(1), max_id)
    assert int(m.group(2)) == len(ORACLE), (m.group(2), len(ORACLE))
    assert int(m.group(3)) == len(QUERIES), (m.group(3), len(QUERIES))


def test_oracle_is_subset_of_queries():
    assert set(ORACLE) <= set(QUERIES)
