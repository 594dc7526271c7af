"""Arrow-vectorized Python extension tests: each pandas-UDF path must
numerically agree with its JVM-side twin or a numpy reference."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from alpaca_pyspark_spark.functions.pandas_ext import (
    log_return,
    per_key_linear_trend,
)
from alpaca_pyspark_spark.tables import load

from .conftest import SF_DIR


def test_log_return_matches_jvm_log(spark):
    li = load(spark, SF_DIR, "lineitem").select("l_extendedprice").limit(500)
    both = li.select(
        log_return(F.col("l_extendedprice")).alias("py"),
        F.log(F.col("l_extendedprice")).alias("jvm"),
    ).collect()
    for r in both:
        assert r["py"] == pytest.approx(r["jvm"], rel=1e-15)


def test_udtf_shingles_match_jvm_twin(spark):
    from alpaca_pyspark_spark.functions import tokens, word_shingles
    from alpaca_pyspark_spark.functions.udtf_ext import ShingleExpand

    spark.udtf.register("shingle_expand", ShingleExpand)
    docs = load(spark, SF_DIR, "documents").limit(20)
    docs.createOrReplaceTempView("docs_udtf")
    got = {
        (r["doc_id"], r["pos"]): r["shingle"]
        for r in spark.sql(
            "SELECT d.doc_id, s.shingle, s.pos "
            "FROM docs_udtf d, LATERAL shingle_expand(d.text, 3) s"
        ).collect()
    }
    jvm = docs.select(
        "doc_id", F.posexplode(word_shingles(tokens(F.col("text")), 3))
    ).collect()
    want = {(r["doc_id"], r["pos"]): r["col"] for r in jvm}
    assert got == want and got


def test_per_key_linear_trend_matches_numpy(spark):
    e = load(spark, SF_DIR, "events").select(
        "user_id",
        F.col("ts").cast("timestamp").cast("double").alias("t"),
        "value",
    )
    got = {
        r["user_id"]: (r["slope"], r["intercept"], r["n"])
        for r in per_key_linear_trend(e, key="user_id", x="t", y="value").collect()
    }
    pdf = e.toPandas()
    for uid, grp in pdf.groupby("user_id"):
        slope, intercept = np.polyfit(grp["t"].to_numpy(), grp["value"].to_numpy(), 1)
        gs, gi, gn = got[uid]
        assert gn == len(grp)
        assert gs == pytest.approx(slope, rel=1e-9)
        assert gi == pytest.approx(intercept, rel=1e-9)
