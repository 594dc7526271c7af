"""Event-terminated sessionization (applyInPandasWithState): sessions
close on an explicit marker event — semantics session_window cannot
express — with per-key state carried across micro-batches and
event-time timeout flushing abandoned sessions."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from alpaca_pyspark_spark.streaming.stateful import event_terminated_sessions


def _run(spark, tmp_path, files, name):
    """Feed parquet files one per micro-batch; return emitted rows."""
    src = tmp_path / name
    src.mkdir()
    schema = "user_id long, ts timestamp, action string"
    for i, rows in enumerate(files):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / f"f{i}")
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src) + "/*")
    )
    sessions = event_terminated_sessions(
        stream,
        key="user_id",
        ts="ts",
        end_marker=F.col("action") == "logout",
        watermark_delay="10 minutes",
        timeout_ms=30 * 60 * 1000,
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}").collect()


def _t(h, m=0):
    return datetime(2024, 1, 1, h, m)


def test_marker_closes_session_across_batches(spark, tmp_path):
    rows = _run(
        spark,
        tmp_path,
        [
            # batch 1: user 1 starts a session (no marker yet); user 2
            # opens AND closes one — state must carry only user 1
            [
                (1, _t(9, 0), "view"),
                (1, _t(9, 5), "view"),
                (2, _t(9, 0), "view"),
                (2, _t(9, 1), "logout"),
            ],
            # batch 2: user 1 logs out — the session must span BOTH
            # micro-batches (state carried), 4 events total
            [
                (1, _t(9, 10), "view"),
                (1, _t(9, 12), "logout"),
            ],
        ],
        "marker_sessions",
    )
    by_key = {(r["key"], r["session_start"]): r for r in rows}
    u1 = by_key[(1, _t(9, 0))]
    assert u1["session_end"] == _t(9, 12)
    assert u1["n_events"] == 4
    assert u1["ended_by"] == 1
    u2 = by_key[(2, _t(9, 0))]
    assert u2["n_events"] == 2 and u2["ended_by"] == 1


def test_two_sessions_one_batch(spark, tmp_path):
    """Two marker-terminated sessions for one key inside one batch."""
    rows = _run(
        spark,
        tmp_path,
        [
            [
                (7, _t(10, 0), "view"),
                (7, _t(10, 1), "logout"),
                (7, _t(10, 30), "view"),
                (7, _t(10, 31), "view"),
                (7, _t(10, 32), "logout"),
            ]
        ],
        "double_sessions",
    )
    got = sorted((r["session_start"], r["session_end"], r["n_events"]) for r in rows)
    assert got == [
        (_t(10, 0), _t(10, 1), 2),
        (_t(10, 30), _t(10, 32), 3),
    ]


def test_timeout_flushes_abandoned_session(spark, tmp_path):
    """A key that goes silent is flushed by the event-time timeout once
    the watermark (advanced by other keys' events) passes last_ts +
    timeout — the state-bounding contract."""
    rows = _run(
        spark,
        tmp_path,
        [
            # user 5 opens a session and never logs out
            [(5, _t(9, 0), "view"), (5, _t(9, 2), "view")],
            # much-later traffic on another key advances the watermark
            # past 9:02 + 30min
            [(6, _t(12, 0), "view")],
            # one more batch so the timeout (evaluated at batch start)
            # actually fires
            [(6, _t(12, 30), "view")],
        ],
        "timeout_sessions",
    )
    flushed = [r for r in rows if r["key"] == 5]
    assert len(flushed) == 1
    assert flushed[0]["session_start"] == _t(9, 0)
    assert flushed[0]["session_end"] == _t(9, 2)
    assert flushed[0]["n_events"] == 2
    assert flushed[0]["ended_by"] == 0


def test_budget_admission_state_spans_batches(spark, tmp_path):
    """The running per-key total must survive micro-batch boundaries:
    key 'a' spends 600 of its 1000-token budget in batch 1, so only
    400 remain for batch 2 — a fold restarted per batch would wrongly
    admit the 500-token doc.  Key 'b' shows budgets are independent."""
    from alpaca_pyspark_spark.streaming.stateful import budgeted_admission

    src = tmp_path / "admit_src"
    src.mkdir()
    schema = "source string, doc_id long, n_tokens long"
    batches = [
        [("a", 1, 600), ("b", 2, 900)],
        [("a", 3, 500), ("a", 4, 300), ("b", 5, 200)],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / f"f{i}")
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src) + "/*")
    )
    out = budgeted_admission(
        stream, key="source", order="doc_id", weight="n_tokens", budget=1000
    )
    q = (
        out.writeStream.format("memory")
        .queryName("admit_t")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {
        r["doc_id"]: (r["cum_tokens"], r["admitted"])
        for r in spark.sql("SELECT * FROM admit_t").collect()
    }
    assert rows == {
        1: (600, 1),   # fits
        2: (900, 1),   # b's own budget
        3: (1100, 0),  # 600 carried over + 500 > 1000 — state crossed the batch
        4: (1400, 0),  # rejection is permanent once the budget is crossed
        5: (1100, 0),  # b: 900 + 200 > 1000
    }


def test_budget_admission_null_and_negative_weights(spark, tmp_path):
    """One malformed record must neither kill the stream nor refund
    spent budget: NULL weights (NaN in the fold) count 0, negative
    weights clamp to 0 — once a key crosses its budget it can never
    dip back under and wrongly re-admit later documents."""
    from alpaca_pyspark_spark.streaming.stateful import budgeted_admission

    src = tmp_path / "admit_nulls"
    src.mkdir()
    schema = "source string, doc_id long, n_tokens long"
    spark.createDataFrame(
        [("a", 1, 900), ("a", 2, None), ("a", 3, -500), ("a", 4, 200)],
        schema,
    ).coalesce(1).write.parquet(str(src / "f0"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src) + "/*")
    )
    out = budgeted_admission(
        stream, key="source", order="doc_id", weight="n_tokens", budget=1000
    )
    q = (
        out.writeStream.format("memory")
        .queryName("admit_nulls_t")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {
        r["doc_id"]: (r["cum_tokens"], r["admitted"])
        for r in spark.sql("SELECT * FROM admit_nulls_t").collect()
    }
    assert rows == {
        1: (900, 1),
        2: (900, 1),   # NULL counts 0, does not crash the fold
        3: (900, 1),   # negative clamps to 0 — no budget refund
        4: (1100, 0),  # the real 200-token doc still overflows
    }
