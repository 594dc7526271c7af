"""Data-contract preflight: the driver fixtures satisfy every
contract, violations are detected, and the NULL-stress replica is
still admissible (NULLs are handled by explicit contracts, not
banned)."""

from __future__ import annotations

import pytest

from alpaca_pyspark_spark.contracts import assert_contracts, validate_contracts
from alpaca_pyspark_spark.tables import TABLE_NAMES, load

from .conftest import SF_DIR


def test_fixtures_satisfy_all_contracts(spark):
    rows = validate_contracts(spark, SF_DIR).collect()
    assert len(rows) >= 10
    assert all(r["violations"] == 0 for r in rows), [
        (r["contract"], r["violations"]) for r in rows if r["violations"]
    ]
    assert_contracts(spark, SF_DIR)  # does not raise


def test_violations_detected(spark, tmp_path):
    dest = str(tmp_path / "bad")
    for t in TABLE_NAMES:
        df = load(spark, SF_DIR, t)
        if t == "events":
            # break cent quantization AND (user_id, ts) uniqueness
            from pyspark.sql import functions as F

            broken = df.limit(50).withColumn(
                "value", F.col("value") + F.lit(0.001)
            )
            df = df.unionByName(df.limit(5)).unionByName(broken)
        df.coalesce(1).write.mode("overwrite").parquet(f"{dest}/{t}.parquet")
    got = {
        r["contract"]: r["violations"]
        for r in validate_contracts(spark, dest).collect()
    }
    assert got["cents_quantized:value"] >= 40
    assert got["events_key_unique:(user_id,ts)"] >= 5
    with pytest.raises(ValueError, match="cents_quantized"):
        assert_contracts(spark, dest)
