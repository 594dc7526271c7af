"""Stream-stream interval join vs its batch twin."""

from __future__ import annotations

from pyspark.sql import functions as F

from alpaca_pyspark_spark.streaming.joins import interval_join_stream
from alpaca_pyspark_spark.tables import load

from .conftest import SF_DIR


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Two file-streams of the events table (clicks x purchases per
    user within 30 minutes): the watermarked stream-stream join must
    produce exactly the batch join's pairs."""
    events = load(spark, SF_DIR, "events").select("event_id", "ts", "user_id", "event_type")
    clicks = events.filter(F.col("event_type") == "click").drop("event_type")
    buys = events.filter(F.col("event_type") == "purchase").drop("event_type")
    src_l, src_r = str(tmp_path / "l"), str(tmp_path / "r")
    clicks.write.parquet(src_l)
    buys.write.parquet(src_r)

    sl = spark.readStream.schema(clicks.schema).parquet(src_l)
    sr = spark.readStream.schema(buys.schema).parquet(src_r)
    joined = interval_join_stream(
        sl, sr, key="user_id", ts="ts", window="30 minutes", watermark_delay="1 hour"
    ).select("l_event_id", "r_event_id")
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["l_event_id"], r["r_event_id"])
        for r in spark.sql("SELECT * FROM ss_join").collect()
    }

    c, b = clicks.alias("c"), buys.alias("b")
    want = {
        (r["l"], r["r"])
        for r in c.join(
            b,
            (F.col("c.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") >= F.col("c.ts"))
            & (F.col("b.ts") < F.col("c.ts") + F.expr("INTERVAL 30 minutes")),
        )
        .select(F.col("c.event_id").alias("l"), F.col("b.event_id").alias("r"))
        .collect()
    }
    assert got == want
    assert len(got) > 0
