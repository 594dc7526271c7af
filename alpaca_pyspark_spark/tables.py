"""Loaders for the driver's synthetic tables (TESTDATA.md).

Each loader is a thin ``spark.read.parquet`` — column pruning and
predicate pushdown then happen for free in the parquet scan (Catalyst
pushes filters/projections declared downstream; verified by the plan
tests in ``tests/test_plans.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at any realistic scale
#: (region/nation are fixed-cardinality; part/supplier/customer grow
#: with SF but remain << fact tables — AQE decides for those).
ALWAYS_BROADCAST = {"region", "nation"}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts has shipped as both parquet TIMESTAMP(NANOS) (which
    Spark's vectorized reader rejects, [PARQUET_TYPE_ILLEGAL]) and as
    plain TIMESTAMP(MICROS) depending on the generator version.  Handle
    both: nanos are read as raw int64 (legacy conf) and floored to
    microseconds — the same truncation DuckDB applies, so the oracle
    agrees exactly; micros are just normalized to TIMESTAMP_NTZ.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if isinstance(df.schema["ts"].dataType, LongType):
        ts = F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz")
    else:
        ts = F.col("ts").cast("timestamp_ntz")
    return df.withColumn("ts", ts).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLE_NAMES}
