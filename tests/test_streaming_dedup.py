"""Streaming dedup vs its batch twin: re-delivered events are dropped
exactly, and the operator keeps watermark-bounded state."""

from __future__ import annotations

from pyspark.sql import functions as F

from alpaca_pyspark_spark.streaming.dedup import dedup_stream, dedup_stream_fingerprint
from alpaca_pyspark_spark.tables import load

from .conftest import SF_DIR


def test_stream_dedup_matches_batch(spark, tmp_path):
    """Duplicate the whole events slice (an at-least-once redelivery)
    into a second file of the same stream source: the streaming dedup
    must keep each event_id exactly once — the batch dropDuplicates
    answer."""
    events = (
        load(spark, SF_DIR, "events")
        .select("event_id", "ts", "user_id", "value")
        .limit(2000)
    )
    src = str(tmp_path / "dup_stream")
    events.write.parquet(src)
    events.write.mode("append").parquet(src)  # the redelivery

    stream = spark.readStream.schema(events.schema).parquet(src)
    deduped = dedup_stream(
        stream, keys=["event_id"], ts="ts", watermark_delay="1 hour"
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("stream_dedup")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT event_id, count(*) AS n FROM stream_dedup GROUP BY 1")
    assert got.filter(F.col("n") > 1).isEmpty()
    assert got.count() == events.count()


def test_stream_fingerprint_dedup(spark, tmp_path):
    """Content-level dedup: documents re-shipped with different ids but
    identical normalized text collapse to one survivor per
    fingerprint."""
    docs = (
        load(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .withColumn("ts", F.to_timestamp(F.lit("2021-01-01 00:00:00")))
        .limit(200)
    )
    re_shipped = docs.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    src = str(tmp_path / "doc_stream")
    docs.write.parquet(src)
    re_shipped.write.mode("append").parquet(src)

    stream = spark.readStream.schema(docs.schema).parquet(src)
    deduped = dedup_stream_fingerprint(stream, ts="ts", watermark_delay="1 hour")
    q = (
        deduped.writeStream.format("memory")
        .queryName("stream_fp_dedup")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    n_fp = (
        docs.select(
            F.md5(
                F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ").cast("binary")
            )
        )
        .distinct()
        .count()
    )
    got = spark.sql("SELECT fingerprint FROM stream_fp_dedup")
    assert got.count() == n_fp
    assert got.distinct().count() == n_fp
