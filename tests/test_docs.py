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


def test_survey_status_note_counts():
    """SURVEY.md §2G's round-status note must track the live registry
    (VERDICT r7 item 7: keep it pinned as the registry grows)."""
    text = (REPO / "SURVEY.md").read_text()
    m = re.search(
        r"(\d+)\s*\n?> queries q01–q(\d+), (\d+) oracle-paired", text
    )
    assert m, "SURVEY.md status-note sentence not found"
    max_id = max(int(re.match(r"q(\d+)", k).group(1)) for k in QUERIES)
    assert int(m.group(1)) == len(QUERIES), (m.group(1), len(QUERIES))
    assert int(m.group(2)) == max_id, (m.group(2), max_id)
    assert int(m.group(3)) == len(ORACLE), (m.group(3), len(ORACLE))


def test_readme_registry_count():
    """README's 'declared query set (N entries, q01-qMM)' line must
    track the live registry."""
    text = (REPO / "README.md").read_text()
    m = re.search(r"declared query set \((\d+) entries, q01-q(\d+)\)", text)
    assert m, "README.md registry-count line not found"
    max_id = max(int(re.match(r"q(\d+)", k).group(1)) for k in QUERIES)
    assert int(m.group(1)) == len(QUERIES), (m.group(1), len(QUERIES))
    assert int(m.group(2)) == max_id, (m.group(2), max_id)


def test_oracle_is_subset_of_queries():
    assert set(ORACLE) <= set(QUERIES)


def test_round_artifacts_cover_live_registry():
    """The committed round artifacts must not go stale against the
    registry (round-4 VERDICT flagged ORACLE_LOCAL missing the two
    newest queries): the LATEST ORACLE_LOCAL_r*.json and
    BENCH_DETAIL.json must record exactly the live query set.
    Intentionally fails between adding a query and regenerating the
    artifacts — regeneration is part of 'done'."""
    import json

    locals_ = sorted(
        REPO.glob("ORACLE_LOCAL_r*.json"),
        key=lambda p: int(re.search(r"_r(\d+)", p.name).group(1)),
    )
    assert locals_, "no ORACLE_LOCAL_r*.json committed"
    oracle_local = json.loads(locals_[-1].read_text())
    assert set(oracle_local) == set(QUERIES), (
        f"{locals_[-1].name} stale: "
        f"missing={sorted(set(QUERIES) - set(oracle_local))[:5]} "
        f"extra={sorted(set(oracle_local) - set(QUERIES))[:5]}"
    )
    bench = json.loads((REPO / "BENCH_DETAIL.json").read_text())["queries"]
    assert set(bench) == set(QUERIES), (
        f"BENCH_DETAIL.json stale: "
        f"missing={sorted(set(QUERIES) - set(bench))[:5]} "
        f"extra={sorted(set(bench) - set(QUERIES))[:5]}"
    )


def test_rotation_ledger_consistency():
    """ROTATION.md's staged prefixes must stay real: every named qid
    exists in the registry, the staged round-10 prefix is exactly 50
    unique entries, and the round-11 remainder is disjoint from it."""
    text = (REPO / "ROTATION.md").read_text()
    blocks = re.findall(r"```\n(.*?)```", text, re.S)
    assert len(blocks) == 2, "expected two staged-prefix code blocks"
    qids = [re.findall(r"q\d+[a-z0-9_]*", b) for b in blocks]
    r10, r11 = qids
    assert len(r10) == 50 and len(set(r10)) == 50, len(r10)
    assert len(r11) == 20 and len(set(r11)) == 20, len(r11)
    assert not set(r10) & set(r11)
    unknown = (set(r10) | set(r11)) - set(QUERIES)
    assert not unknown, sorted(unknown)
