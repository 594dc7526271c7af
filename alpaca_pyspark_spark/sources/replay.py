"""File-backed replay endpoint + capture sink: the two HTTP halves of
the live connector round-trip (q203).

``ReplayTradesServer`` serves a recorded trade tape in the EXACT wire
format of the stocks/trades history endpoint (``{"trades": {sym:
[{t,x,p,s,c,i,z}, ...]}, "next_page_token": ...}`` — the same shape
``sources/wire.py`` parses and the reference's ``stocks/trades.py``
consumes), honoring ``symbols`` / ``start`` / ``end`` (inclusive, like
the real API) / ``limit`` / ``page_token``.  It exists so the full
connector loop — REST poller stream source → transformation → REST
sink with per-batch manifests — can run hermetically against recorded
data: the standard offline-replay harness for an API-backed pipeline
(backfill validation, CI, incident replay).  It deliberately lives in
the package, not tests/: replaying a recorded tape through the real
connector stack is a product capability, the same way the reference
pins its wire behavior with mock payloads.

Scale note: the replay server is the API STAND-IN, not an engine data
path — its capacity models the external API's, and the engine-side
plumbing it feeds (stream source offsets, paginated fetch, Arrow
batches, sink 2-phase manifest) is exactly what a real deployment
runs.  Nothing here is on the 100 TB data plane.

``CaptureSink`` is the matching ingest endpoint for
``sources/sink.py``'s REST sink: it records every posted page and
every commit manifest (2-phase: pages first, one manifest per
committed batch) so a round-trip query can read back what landed and
put conservation — rows served == rows landed == manifest totals —
under the value-hash gate.
"""

from __future__ import annotations

import json
import threading
from datetime import datetime, timezone
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any
from urllib.parse import parse_qs, urlparse


def _iso_utc(dt: datetime) -> str:
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return dt.astimezone(timezone.utc).isoformat()


class ReplayTradesServer:
    """Serve ``records`` — an iterable of ``(symbol, ts, price, size,
    trade_id)`` with naive-UTC or aware ``ts`` — as the paginated
    stocks/trades wire endpoint.  Use as a context manager; the
    ``endpoint`` property is the base URL for the connector options."""

    def __init__(self, records, page_limit_cap: int = 10_000):
        tape = sorted(
            (
                (_iso_utc(ts), sym, float(price), int(size), int(tid))
                for (sym, ts, price, size, tid) in records
            ),
            key=lambda r: (r[0], r[1], r[4]),
        )
        self._tape = tape
        # ISO-format timestamps compare lexicographically in time order
        # (one normalized +00:00 form), so the [start, end] slice is a
        # bisect over this key list — O(log n) per request instead of a
        # full-tape rescan per page (round-9 review finding)
        self._keys = [r[0] for r in tape]
        self._cap = page_limit_cap
        self._server: ThreadingHTTPServer | None = None
        self.requests: list[tuple[str, dict]] = []

    # -- request handling --------------------------------------------
    def _page(self, qs: dict[str, list[str]]) -> dict[str, Any]:
        import bisect

        syms = set(qs["symbols"][0].split(",")) if "symbols" in qs else None
        limit = min(int(qs.get("limit", [self._cap])[0]), self._cap)
        offset = int(qs.get("page_token", ["0"])[0])
        i = 0
        j = len(self._tape)
        if "start" in qs:
            lo = _iso_utc(datetime.fromisoformat(qs["start"][0]))
            i = bisect.bisect_left(self._keys, lo)
        if "end" in qs:
            hi = _iso_utc(datetime.fromisoformat(qs["end"][0]))
            # inclusive end, like the real API: keep every key == hi
            j = bisect.bisect_right(self._keys, hi)
        window = [
            r for r in self._tape[i:j] if syms is None or r[1] in syms
        ]
        page, rest = window[offset : offset + limit], window[offset + limit :]
        by_sym: dict[str, list[dict[str, Any]]] = {}
        for t, sym, p, s, tid in page:
            by_sym.setdefault(sym, []).append(
                {"t": t, "x": "R", "p": p, "s": s, "c": [], "i": tid, "z": "A"}
            )
        return {
            "trades": by_sym,
            "next_page_token": str(offset + limit) if rest else None,
        }

    # -- lifecycle ----------------------------------------------------
    def __enter__(self) -> "ReplayTradesServer":
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 (http.server API)
                parsed = urlparse(self.path)
                qs = parse_qs(parsed.query)
                outer.requests.append((parsed.path, qs))
                if not parsed.path.endswith("/stocks/trades"):
                    self.send_response(404)
                    self.end_headers()
                    return
                payload = json.dumps(outer._page(qs)).encode()
                self.send_response(200)
                self.send_header("content-type", "application/json")
                self.send_header("content-length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def log_message(self, *a):  # quiet
                pass

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        threading.Thread(target=self._server.serve_forever, daemon=True).start()
        return self

    @property
    def endpoint(self) -> str:
        return f"http://127.0.0.1:{self._server.server_address[1]}/v2"

    def __exit__(self, *exc) -> None:
        self._server.shutdown()
        self._server.server_close()


class CaptureSink:
    """Record the REST sink's 2-phase protocol: data pages on any
    path, commit manifests on ``.../commit``."""

    def __init__(self) -> None:
        self.pages: list[dict[str, Any]] = []
        self.commits: list[dict[str, Any]] = []
        self._lock = threading.Lock()
        self._server: ThreadingHTTPServer | None = None

    def __enter__(self) -> "CaptureSink":
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):  # noqa: N802
                body = json.loads(
                    self.rfile.read(int(self.headers["Content-Length"]))
                )
                with outer._lock:
                    if self.path.endswith("/commit"):
                        outer.commits.append(body)
                    else:
                        outer.pages.append(body)
                self.send_response(200)
                self.send_header("content-type", "application/json")
                self.end_headers()
                self.wfile.write(b"{}")

            def log_message(self, *a):  # quiet
                pass

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        threading.Thread(target=self._server.serve_forever, daemon=True).start()
        return self

    @property
    def endpoint(self) -> str:
        return f"http://127.0.0.1:{self._server.server_address[1]}/v1"

    @property
    def records(self) -> list[dict[str, Any]]:
        return [r for pg in self.pages for r in pg["records"]]

    def committed_rows(self, status: str = "committed") -> int:
        """Total rows across committed manifests, deduplicated by
        ``batch_id`` (last wins) — the idempotent-sink contract
        ``RestStreamWriter`` documents: on failure recovery Structured
        Streaming re-runs the last uncommitted batch, so the server
        must treat a repeated batch_id as a replay, not new data.
        (Page-level POSTs carry no batch/partition identity in the
        wire protocol, so page replays are NOT deduplicated here —
        a real ingest endpoint dedups on record keys; the q203 gate
        would surface one as a conservation mismatch.)"""
        by_batch: dict[Any, int] = {}
        for i, m in enumerate(self.commits):
            if m.get("status") == status:
                by_batch[m.get("batch_id", f"__batch{i}")] = m["rows"]
        return sum(by_batch.values())

    def __exit__(self, *exc) -> None:
        self._server.shutdown()
        self._server.server_close()
