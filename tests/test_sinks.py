"""Sink coverage: the engine's write path is Spark's DataFrameWriter
(the reference has no sinks, SURVEY.md §2A; our additions are the
patterns a pipeline needs at scale — partitioned layout, roundtrip
fidelity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from alpaca_pyspark_spark.tables import load

from .conftest import SF_DIR


def test_partitioned_parquet_roundtrip(spark, tmp_path):
    out = str(tmp_path / "events_by_type")
    e = load(spark, SF_DIR, "events")
    e.write.partitionBy("event_type").parquet(out)

    back = spark.read.parquet(out)
    assert back.count() == e.count()
    # partition pruning: reading one event_type touches only its dir
    one = back.filter(F.col("event_type") == "purchase")
    assert one.count() == e.filter(F.col("event_type") == "purchase").count()
    # values survive the roundtrip (ordered compare on a stable key)
    a = sorted(e.select("event_id", "value").collect())
    b = sorted(back.select("event_id", "value").collect())
    assert a == b


def test_bucketed_table_write(spark, tmp_path):
    """Bucketing: the co-located-join layout for repeated large joins
    (no shuffle on the bucketed key at read time)."""
    li = load(spark, SF_DIR, "lineitem").limit(1000)
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(tmp_path / "bucketed"))  # external table
        .mode("overwrite")
        .saveAsTable("lineitem_bucketed")
    )
    back = spark.table("lineitem_bucketed")
    assert back.count() == 1000
    spark.sql("DROP TABLE lineitem_bucketed")
