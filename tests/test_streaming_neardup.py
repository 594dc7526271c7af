"""Streaming LSH near-dup candidates vs the batch twin: every bucket
re-hit within the watermark must surface exactly the pairs the batch
first-holder computation predicts, using the identical hash family."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from alpaca_pyspark_spark.streaming.neardup import (
    row_band_keys,
    streaming_lsh_candidates,
)
from .conftest import SF_DIR


def _docs_with_ts(spark, n=300):
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .limit(n)
        .select(
            "doc_id",
            "text",
            # deterministic event times, seconds apart, so arrival
            # order == doc_id order
            F.to_timestamp(
                F.lit("2026-01-01 00:00:00")
            ).alias("base"),
        )
        .select(
            "doc_id",
            "text",
            (F.col("base") + F.make_dt_interval(secs=F.col("doc_id"))).alias("ts"),
        )
    )
    return docs


def test_streaming_candidates_match_batch_first_holder(spark, tmp_path):
    docs = _docs_with_ts(spark)
    src = str(tmp_path / "neardup_src")
    docs.write.parquet(src)

    stream = spark.readStream.schema(docs.schema).parquet(src)
    cands = streaming_lsh_candidates(
        stream, id_col="doc_id", text_col="text", ts="ts",
        watermark_delay="1 hour",
    )
    q = (
        cands.writeStream.format("memory")
        .queryName("lsh_cands")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["band"], r["bucket"], r["id_new"], r["id_first"])
        for r in spark.sql("SELECT * FROM lsh_cands").collect()
    }

    # batch twin: same per-row band keys; first (ts, doc_id) holder per
    # bucket; every other doc in the bucket pairs with the holder
    exploded = (
        spark.read.parquet(src)
        .select("doc_id", "ts", F.explode(row_band_keys("text")).alias("bb"))
        .select("doc_id", "ts", "bb.band", "bb.bucket")
    )
    w = Window.partitionBy("band", "bucket").orderBy("ts", "doc_id")
    ranked = exploded.withColumn("holder", F.first("doc_id").over(w))
    want = {
        (r["band"], r["bucket"], r["doc_id"], r["holder"])
        for r in ranked.filter(F.col("doc_id") != F.col("holder")).collect()
    }
    assert want, "fixture produced no bucket collisions - widen n"
    assert got == want


def test_streaming_candidates_ignore_holder_redelivery(spark, tmp_path):
    docs = _docs_with_ts(spark, n=50)
    src = str(tmp_path / "redeliver_src")
    # the same micro-batch content delivered twice (source replay)
    docs.write.parquet(src)
    docs.write.mode("append").parquet(src)

    stream = spark.readStream.schema(docs.schema).parquet(src)
    cands = streaming_lsh_candidates(
        stream, id_col="doc_id", text_col="text", ts="ts",
    )
    q = (
        cands.writeStream.format("memory")
        .queryName("lsh_redeliver")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM lsh_redeliver").collect()
    # a redelivered holder must never pair with itself
    assert all(r["id_new"] != r["id_first"] for r in rows)
