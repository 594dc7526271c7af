"""Wire-level tests for the file-backed replay endpoint
(``sources/replay.py``) — the API stand-in q203 serves its tape
through.  No Spark: plain HTTP against the wire contract the poller
source + ``sources/wire.py`` consume."""

from __future__ import annotations

import json
from datetime import datetime, timezone
from urllib.request import urlopen

from alpaca_pyspark_spark.sources.replay import CaptureSink, ReplayTradesServer


def _ts(h: int, m: int = 0) -> datetime:
    return datetime(2024, 1, 1, h, m)


def _tape(n: int = 25):
    # two symbols interleaved, one trade per minute from 00:00
    return [
        (("AA" if i % 2 == 0 else "BB"), _ts(0, i), 100.0 + i, 1, i)
        for i in range(n)
    ]


def _get(url: str) -> dict:
    with urlopen(url) as r:
        return json.loads(r.read())


def test_replay_pages_are_limit_bounded_and_resume_exactly():
    with ReplayTradesServer(_tape(25)) as api:
        base = f"{api.endpoint}/stocks/trades?symbols=AA,BB&limit=10"
        seen, token, pages = [], None, 0
        while True:
            url = base + (f"&page_token={token}" if token else "")
            body = _get(url)
            rows = [r for sym in body["trades"].values() for r in sym]
            assert len(rows) <= 10
            seen.extend(rows)
            pages += 1
            token = body["next_page_token"]
            if token is None:
                break
        assert pages == 3
        assert sorted(r["i"] for r in seen) == list(range(25))  # exactly once


def test_replay_filters_symbols_and_inclusive_end():
    with ReplayTradesServer(_tape(25)) as api:
        lo = _ts(0, 5).replace(tzinfo=timezone.utc).isoformat()
        hi = _ts(0, 10).replace(tzinfo=timezone.utc).isoformat()
        body = _get(
            f"{api.endpoint}/stocks/trades?symbols=AA"
            f"&start={lo.replace('+', '%2B')}&end={hi.replace('+', '%2B')}"
        )
        assert set(body["trades"]) == {"AA"}
        ids = [r["i"] for r in body["trades"]["AA"]]
        # [5, 10] INCLUSIVE on both ends (the real API's contract the
        # poller compensates for with its hi - 1µs slicing), AA = even
        assert ids == [6, 8, 10]


def test_replay_wire_shape_matches_trades_table():
    from alpaca_pyspark_spark.sources.alpaca import TRADES_TABLE

    with ReplayTradesServer(_tape(4)) as api:
        body = _get(f"{api.endpoint}/stocks/trades?symbols=AA,BB")
        batch = TRADES_TABLE.page_to_batch(body)
        assert batch is not None and batch.num_rows == 4
        d = batch.to_pydict()
        assert sorted(d["id"]) == [0, 1, 2, 3]
        assert set(d["symbol"]) == {"AA", "BB"}


def test_capture_sink_partitions_pages_and_commits():
    import urllib.request

    with CaptureSink() as sink:
        for payload, path in [
            ({"records": [{"a": 1}, {"a": 2}]}, "/v1"),
            ({"status": "committed", "rows": 2, "batch_id": 0}, "/v1/commit"),
            ({"status": "aborted", "rows": 9}, "/v1/commit"),
        ]:
            req = urllib.request.Request(
                sink.endpoint.rsplit("/v1", 1)[0] + path,
                data=json.dumps(payload).encode(),
                headers={"content-type": "application/json"},
            )
            urlopen(req).read()
        assert sink.records == [{"a": 1}, {"a": 2}]
        assert sink.committed_rows() == 2  # aborted manifest not counted
