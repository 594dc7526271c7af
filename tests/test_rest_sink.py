"""REST batch sink e2e: executors POST record pages to a local HTTP
server; the driver posts the commit manifest only after every task
succeeded (two-phase-commit ordering the test asserts directly)."""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from .conftest import SF_DIR
from .test_sources import CREDS, mock_api  # noqa: F401  (fixture)


class _CaptureHandler(BaseHTTPRequestHandler):
    # class-level capture shared by all handler instances
    ingests: list[dict] = []
    commits: list[dict] = []
    lock = threading.Lock()

    def do_POST(self):  # noqa: N802 (http.server API)
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        rec = {"body": body, "headers": dict(self.headers), "t": time.monotonic()}
        with _CaptureHandler.lock:
            if self.path.endswith("/commit"):
                _CaptureHandler.commits.append(rec)
            else:
                _CaptureHandler.ingests.append(rec)
        self.send_response(200)
        self.send_header("content-type", "application/json")
        self.end_headers()
        self.wfile.write(b"{}")

    def log_message(self, *a):  # silence
        pass


@pytest.fixture()
def capture_server():
    _CaptureHandler.ingests = []
    _CaptureHandler.commits = []
    server = ThreadingHTTPServer(("127.0.0.1", 0), _CaptureHandler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_address[1]}/v1"
    server.shutdown()


def test_rest_sink_end_to_end(spark, capture_server):
    from alpaca_pyspark_spark.sources import register_all
    from alpaca_pyspark_spark.tables import load

    register_all(spark)
    df = (
        load(spark, SF_DIR, "events")
        .select("event_id", "ts", "user_id", "event_type")
        .limit(137)
        .repartition(4)
    )
    n = df.count()
    (
        df.write.format("Rest_Batch_Sink")
        .options(endpoint=capture_server, batch_size=25)
        .mode("append")
        .save()
    )
    got_rows = [r for pg in _CaptureHandler.ingests for r in pg["body"]["records"]]
    assert len(got_rows) == n
    # every page respects the batch size
    assert all(len(pg["body"]["records"]) <= 25 for pg in _CaptureHandler.ingests)
    # rows survive the JSON trip intact (ids unique, ts ISO-parseable)
    assert len({r["event_id"] for r in got_rows}) == n
    assert all("T" in r["ts"] for r in got_rows)
    # exactly one commit manifest, with the true totals, AFTER all pages
    assert len(_CaptureHandler.commits) == 1
    manifest = _CaptureHandler.commits[0]["body"]
    assert manifest["status"] == "committed"
    assert manifest["rows"] == n
    assert manifest["pages"] == len(_CaptureHandler.ingests)
    last_page_t = max(pg["t"] for pg in _CaptureHandler.ingests)
    assert _CaptureHandler.commits[0]["t"] >= last_page_t


def test_rest_sink_sends_auth_headers(spark, capture_server):
    """Spark lower-cases option names before they reach the Python
    DataSource; the sink must still find the (uppercase-documented)
    credential options and attach them as headers to every POST."""
    from alpaca_pyspark_spark.sources import register_all
    from alpaca_pyspark_spark.tables import load

    register_all(spark)
    df = load(spark, SF_DIR, "events").select("event_id").limit(5)
    (
        df.write.format("Rest_Batch_Sink")
        .options(endpoint=capture_server, **CREDS)
        .mode("append")
        .save()
    )
    assert _CaptureHandler.ingests and _CaptureHandler.commits
    for rec in _CaptureHandler.ingests + _CaptureHandler.commits:
        # http.server headers are case-insensitive-keyed via get()
        hdrs = {k.lower(): v for k, v in rec["headers"].items()}
        assert hdrs.get("apca-api-key-id") == CREDS["APCA-API-KEY-ID"]
        assert hdrs.get("apca-api-secret-key") == CREDS["APCA-API-SECRET-KEY"]


def test_rest_sink_rejects_overwrite_and_missing_endpoint(spark, capture_server):
    from alpaca_pyspark_spark.sources import register_all
    from alpaca_pyspark_spark.tables import load

    register_all(spark)
    df = load(spark, SF_DIR, "events").select("event_id").limit(1)
    with pytest.raises(Exception, match="append-only"):
        (
            df.write.format("Rest_Batch_Sink")
            .options(endpoint=capture_server)
            .mode("overwrite")
            .save()
        )
    with pytest.raises(Exception, match="endpoint"):
        df.write.format("Rest_Batch_Sink").mode("append").save()


def test_rest_sink_streaming_batches_carry_batch_id(spark, capture_server, tmp_path):
    from alpaca_pyspark_spark.sources import register_all
    from alpaca_pyspark_spark.tables import load

    register_all(spark)
    events = load(spark, SF_DIR, "events").select("event_id", "user_id").limit(80)
    src = str(tmp_path / "src")
    events.write.parquet(src)
    n = events.count()

    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (
        stream.writeStream.format("Rest_Batch_Sink")
        .options(endpoint=capture_server, batch_size=30)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got_rows = [r for pg in _CaptureHandler.ingests for r in pg["body"]["records"]]
    assert len(got_rows) == n
    # one manifest per committed micro-batch, each stamped with its id
    assert len(_CaptureHandler.commits) >= 1
    ids = [m["body"]["batch_id"] for m in _CaptureHandler.commits]
    assert ids == sorted(set(ids)), ids
    assert sum(m["body"]["rows"] for m in _CaptureHandler.commits) == n


def test_api_stream_to_rest_sink_round_trip(spark, capture_server, mock_api, tmp_path):  # noqa: F811
    """Full connector loop: REST poller source (mock Alpaca API) →
    projection → REST sink.  Both custom connectors in one streaming
    query; every polled trade must land in the sink exactly once with
    a per-batch manifest."""
    from alpaca_pyspark_spark.sources import register_all
    from alpaca_pyspark_spark.streaming.source import StockTradesStreamDataSource

    register_all(spark)
    spark.dataSource.register(StockTradesStreamDataSource)
    df = (
        spark.readStream.format("Alpaca_Stocks_Trades_Stream")
        .options(
            **CREDS,
            endpoint=mock_api,
            symbols="AAPL",
            start="2021-01-01T00:00:00+00:00",
            end="2021-01-02T00:00:00+00:00",
            poll_interval=str(12 * 3600),
        )
        .load()
        .select("symbol", "time", "price", "size")
    )
    q = (
        df.writeStream.format("Rest_Batch_Sink")
        .options(endpoint=capture_server, batch_size=10)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = [r for pg in _CaptureHandler.ingests for r in pg["body"]["records"]]
    # mock serves the same 2-trade page per 12h slice: 2 slices x 2 rows
    assert len(got) == 4
    assert {r["symbol"] for r in got} == {"AAPL"}
    assert all(set(r) == {"symbol", "time", "price", "size"} for r in got)
    assert sum(m["body"]["rows"] for m in _CaptureHandler.commits) == 4


class _FlakyHandler(_CaptureHandler):
    """Lands every page, then answers 500 to one of them — the
    ambiguous-outcome failure (server processed, response lost)."""

    fail_on_ingest = 2  # 1-based index of the ingest POST to 500

    def do_POST(self):  # noqa: N802 (http.server API)
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        rec = {"body": body, "headers": dict(self.headers), "t": time.monotonic()}
        with _CaptureHandler.lock:
            if self.path.endswith("/commit"):
                _FlakyHandler.commits.append(rec)
                code = 200
            else:
                _FlakyHandler.ingests.append(rec)
                code = (
                    500
                    if len(_FlakyHandler.ingests) == _FlakyHandler.fail_on_ingest
                    else 200
                )
        self.send_response(code)
        self.send_header("content-type", "application/json")
        self.end_headers()
        self.wfile.write(b"{}")


@pytest.fixture()
def flaky_server():
    _FlakyHandler.ingests = []
    _FlakyHandler.commits = []
    server = ThreadingHTTPServer(("127.0.0.1", 0), _FlakyHandler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_address[1]}/v1"
    server.shutdown()


def test_rest_sink_partial_failure_commits_nothing(spark, flaky_server):
    """Fault injection for the 2-phase claim ('a consumer that waits
    for the manifest sees either the complete batch or nothing'): the
    server LANDS a page but answers 500 — the ambiguous outcome.  The
    retry session never re-POSTs (POST is excluded from
    allowed_methods: not idempotent), the task raises, the job fails,
    and the commit path carries ONLY the abort tombstone — orphan
    pages are detectable precisely because no committed manifest ever
    arrives."""
    from alpaca_pyspark_spark.sources import register_all
    from alpaca_pyspark_spark.tables import load

    register_all(spark)
    e = load(spark, SF_DIR, "events").select("event_id", "user_id", "value")
    # the writer's IOError surfaces wrapped in the engine's job-failure
    # type, which differs by Spark version — match the message instead
    with pytest.raises(Exception, match="500|sink POST|Job aborted"):
        (
            e.coalesce(1)
            .write.format("Rest_Batch_Sink")
            .options(endpoint=flaky_server, batch_size=100)
            .mode("append")
            .save()
        )
    with _CaptureHandler.lock:
        ingests = list(_FlakyHandler.ingests)
        commits = list(_FlakyHandler.commits)
    assert len(ingests) >= _FlakyHandler.fail_on_ingest  # pages landed
    statuses = {c["body"]["status"] for c in commits}
    assert "committed" not in statuses
    assert statuses <= {"aborted"}
