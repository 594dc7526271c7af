"""Derived relational operators (compositions of Spark built-ins)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Round-robin-repartition when the scan under-parallelizes.

    Per-row CPU-bound operators (signature computation, Python decode
    stages) serialize when the source arrives in fewer splits than the
    cluster has cores — one small parquet file locally, a few giant
    row groups at scale.  The repartition is a narrow row-level
    shuffle, cheap relative to the per-row work it unlocks, and a
    no-op when the scan is already wide (the 100 TB case: thousands of
    file splits)."""
    n = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df
