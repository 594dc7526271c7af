"""Streaming bars must equal the batch twin — same operator, two
execution modes — and finalize bars in append mode (watermark-driven
state eviction, the property that bounds state at stream scale)."""

from __future__ import annotations

from alpaca_pyspark_spark.operators.bars import finalize_bars, tumbling_bars_cents
from alpaca_pyspark_spark.streaming.bars import streaming_bars
from alpaca_pyspark_spark.tables import load

from .conftest import SF_DIR


def _bar_map(rows):
    return {
        (r["user_id"], r["bar_start"]): (
            r["open"], r["high"], r["low"], r["close"], r["volume"], r["vwap"],
        )
        for r in rows
    }


def test_streaming_bars_match_batch(spark, tmp_path):
    events = load(spark, SF_DIR, "events").select("user_id", "ts", "value")
    src = str(tmp_path / "stream_src")
    events.write.parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    bars = streaming_bars(
        stream, key="user_id", ts="ts", price="value", interval="1 hour"
    )
    q = (
        bars.writeStream.format("memory")
        .queryName("stream_bars")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = _bar_map(spark.sql("SELECT * FROM stream_bars").collect())

    want = _bar_map(
        finalize_bars(
            tumbling_bars_cents(
                events, key="user_id", ts="ts", price="value", interval="1 hour"
            )
        ).collect()
    )
    assert got == want


def test_streaming_bars_append_finalizes(spark, tmp_path):
    """Append mode only emits bars the watermark has closed — feeding
    two files whose event times are a day apart must finalize (at
    least) the first day's bars.  This is the state-eviction contract:
    without it, open-bar state grows without bound."""
    events = load(spark, SF_DIR, "events").select("user_id", "ts", "value")
    lo, hi = [
        r[0]
        for r in events.selectExpr("min(ts)").collect()
        + events.selectExpr("max(ts)").collect()
    ]
    src = tmp_path / "append_src"
    src.mkdir()
    early = events.where(f"ts < timestamp'{lo}' + INTERVAL 2 HOURS")
    late = events.where(f"ts >= timestamp'{hi}' - INTERVAL 1 HOUR")
    early.coalesce(1).write.parquet(str(src / "f1"))
    late.coalesce(1).write.parquet(str(src / "f2"))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src) + "/*")
    )
    bars = streaming_bars(
        stream,
        key="user_id",
        ts="ts",
        price="value",
        interval="1 hour",
        watermark_delay="10 minutes",
    )
    q = (
        bars.writeStream.format("memory")
        .queryName("append_bars")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    emitted = spark.sql("SELECT * FROM append_bars").collect()
    assert emitted, "watermark advanced a day — early bars must be finalized"
    got = _bar_map(emitted)
    want = _bar_map(
        finalize_bars(
            tumbling_bars_cents(
                early, key="user_id", ts="ts", price="value", interval="1 hour"
            )
        ).collect()
    )
    # every finalized early bar matches the batch computation exactly
    for k, v in want.items():
        assert got.get(k) == v
