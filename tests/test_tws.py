"""transformWithState distinct-until-changed vs a batch lag() twin,
including cross-micro-batch state carry.

The e2e streaming run needs the Spark-side transformWithState protobuf
bridge (``google.protobuf``), which this container lacks — it is
skipped there and the processor logic is pinned by the pure-pandas
unit test below instead.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from alpaca_pyspark_spark.streaming.tws import DistinctUntilChanged, distinct_until_changed


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)


def test_processor_logic_pure_pandas():
    """The compaction logic itself, no Spark: repeats suppressed within
    and across calls (= micro-batches), changes emitted in ts order."""
    import pandas as pd

    p = DistinctUntilChanged()
    p._last = _FakeValueState()

    def run(rows):
        df = pd.DataFrame(rows, columns=["ts", "value"])
        out = list(p.handleInputRows((7,), iter([df]), None))
        return [
            (r.user_id, r.ts, r.value)
            for o in out
            for r in o.itertuples(index=False)
        ]

    # batch 1: repeat, change, repeat-of-change (out of order on input)
    got1 = run([(2, 7.0), (0, 5.0), (1, 5.0), (3, 7.0)])
    assert got1 == [(7, 0, 5.0), (7, 2, 7.0)]
    # batch 2 starts by repeating the carried last value
    got2 = run([(4, 7.0), (5, 9.0)])
    assert got2 == [(7, 5, 9.0)]
    # batch 3: all repeats -> nothing emitted, state unchanged
    assert run([(6, 9.0), (7, 9.0)]) == []
    assert p._last.get() == (9.0,)


def _batch_twin(df):
    """lag-based distinct-until-changed over the whole (ordered) data."""
    w = Window.partitionBy("user_id").orderBy("ts")
    return (
        df.withColumn("prev", F.lag("value").over(w))
        .filter(F.col("prev").isNull() | (F.col("value") != F.col("prev")))
        .select("user_id", "ts", "value")
    )


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithState needs google.protobuf (absent in this container)",
)
def test_distinct_until_changed_matches_batch_lag(spark, tmp_path):
    """Repeated readings collapse to their change points; a repeat that
    arrives in a LATER micro-batch is still suppressed (the state
    carries the last emitted value across batches)."""
    rows = [
        # user 1: 5.0 repeated, then change, then repeat of the change
        (1, "2024-01-01 00:00:00", 5.0),
        (1, "2024-01-01 00:01:00", 5.0),
        (1, "2024-01-01 00:02:00", 7.0),
        (1, "2024-01-01 00:03:00", 7.0),
        # user 2: constant the whole time
        (2, "2024-01-01 00:00:30", 1.0),
        (2, "2024-01-01 00:01:30", 1.0),
    ]
    later = [
        # second file = second micro-batch; first rows repeat the last
        # emitted values and must NOT re-emit
        (1, "2024-01-01 00:04:00", 7.0),
        (1, "2024-01-01 00:05:00", 9.0),
        (2, "2024-01-01 00:02:30", 1.0),
        (2, "2024-01-01 00:03:30", 2.0),
    ]
    schema = "user_id long, ts_s string, value double"
    src = str(tmp_path / "tws_src")
    ckpt = str(tmp_path / "ckpt")

    def to_df(data):
        return (
            spark.createDataFrame(data, schema)
            .select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value")
        )

    to_df(rows).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(to_df(rows).schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    out = distinct_until_changed(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("tws_duc")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        to_df(later).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["user_id"], r["ts"], r["value"])
        for r in spark.sql("SELECT * FROM tws_duc").collect()
    }
    want = {
        (r["user_id"], r["ts"], r["value"])
        for r in _batch_twin(to_df(rows + later)).collect()
    }
    assert got == want
    # sanity: compaction actually happened
    assert len(got) == 5  # user 1: 5,7,9 · user 2: 1,2
