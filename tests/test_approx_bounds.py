"""Pinned local checks for the approximate (no-oracle) queries: each
sketch's observed error is asserted against a bound derived from its
published guarantee, so "rows-only in CORRECTNESS" never means
"unchecked".

- HLL++ (``approx_count_distinct``, rsd=0.02): relative standard
  error 2% ⇒ assert within 5σ = 10% of the exact distinct count.
- KLL-ish ``percentile_approx`` (accuracy=10000): rank error ε ≤
  1/accuracy = 1e-4 ⇒ assert the returned value's true rank is within
  1e-3 (10× slack) of the requested quantile.
- Datasketches HLL union (lgConfigK default 12): rse ≈
  1.04/√2^12 ≈ 1.6% ⇒ assert weekly estimates within 5σ = 8%.

Plus the connected-components convergence property: pointer jumping
must collapse a length-k chain in ≤ log2(k) + 2 propagation rounds
(hash-min alone needs O(k) — the bound is what makes long chains
tractable at scale).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from alpaca_pyspark_spark.queries import QUERIES

from .conftest import SF_DIR


def test_q11_hll_within_published_rsd(spark):
    from alpaca_pyspark_spark.tables import load

    approx = QUERIES["q11_approx_distinct"](spark, SF_DIR).collect()[0]
    li = load(spark, SF_DIR, "lineitem")
    exact = li.agg(
        F.count_distinct("l_partkey").alias("p"),
        F.count_distinct("l_suppkey").alias("s"),
        F.count_distinct("l_orderkey").alias("o"),
    ).collect()[0]
    for got, true in [
        (approx["n_parts_approx"], exact["p"]),
        (approx["n_supps_approx"], exact["s"]),
        (approx["n_orders_approx"], exact["o"]),
    ]:
        assert abs(got - true) <= 0.10 * true, (got, true)


def test_q24_percentile_rank_error_within_accuracy(spark):
    from alpaca_pyspark_spark.tables import load

    rows = QUERIES["q24_percentiles_approx"](spark, SF_DIR).collect()
    li = load(spark, SF_DIR, "lineitem").select("l_returnflag", "l_extendedprice")
    counts = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for row in rows:
        flag = row["l_returnflag"]
        for col, q in [("p50_approx", 0.5), ("p95_approx", 0.95)]:
            got = row[col]
            n_le = li.filter(
                (F.col("l_returnflag") == flag) & (F.col("l_extendedprice") <= got)
            ).count()
            n_lt = li.filter(
                (F.col("l_returnflag") == flag) & (F.col("l_extendedprice") < got)
            ).count()
            # the returned value's rank interval must cover a point
            # within eps of the requested quantile
            lo, hi = n_lt / counts[flag], n_le / counts[flag]
            eps = 1e-3  # 10x the 1/accuracy guarantee
            assert lo - eps <= q <= hi + eps, (flag, col, got, lo, hi)


def test_q46_weekly_sketch_union_within_rse(spark):
    from alpaca_pyspark_spark.tables import load

    weekly = {
        r["week"]: r["distinct_users"]
        for r in QUERIES["q46_sketch_union_rollup"](spark, SF_DIR).collect()
    }
    e = load(spark, SF_DIR, "events")
    exact = {
        r["week"]: r["n"]
        for r in e.groupBy(F.date_trunc("WEEK", "ts").alias("week"))
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(weekly) == set(exact)
    for wk, true in exact.items():
        # lgConfigK=12 -> rse ~1.6%; 5 sigma = 8%
        assert abs(weekly[wk] - true) <= max(0.08 * true, 2.0), (wk, weekly[wk], true)


@pytest.mark.parametrize("k", [8, 64, 200])
def test_components_chain_converges_log_rounds(spark, k):
    """A path graph 0-1-…-(k-1) has diameter k-1; hash-min alone needs
    O(k) rounds, pointer jumping must finish in <= log2(k) + 2."""
    from alpaca_pyspark_spark.operators.components import connected_components

    vertices = spark.range(k).select(F.col("id"))
    edges = (
        spark.range(k - 1)
        .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
    )
    stats: dict = {}
    out = connected_components(
        edges, vertices, src="id_a", dst="id_b", vertex_id="id", stats=stats
    )
    comps = {r["component"] for r in out.collect()}
    assert comps == {0}, comps
    assert stats["rounds"] <= math.ceil(math.log2(k)) + 2, (k, stats["rounds"])


def test_components_checkpoint_cadence_same_result(spark):
    """checkpoint_every is a pure performance dial — results identical."""
    from alpaca_pyspark_spark.operators.components import connected_components

    k = 64
    vertices = spark.range(k).select(F.col("id"))
    edges = (
        spark.range(k - 1)
        .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
    )
    a = connected_components(edges, vertices, vertex_id="id").collect()
    b = connected_components(
        edges, vertices, vertex_id="id", checkpoint_every=3
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
