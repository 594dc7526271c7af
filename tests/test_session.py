"""The scoped-cache ledger (session.scoped_persist) and the query
boundary that drains it — the round-5 persist-discipline machinery."""

from __future__ import annotations

from pyspark.sql import functions as F

from alpaca_pyspark_spark.session import (
    release_scoped_caches,
    scoped_caches,
    scoped_persist,
)

from .conftest import SF_DIR


def _cache_manager(spark):
    return spark._jsparkSession.sharedState().cacheManager()


def test_scoped_persist_registers_and_release_empties(spark):
    release_scoped_caches()  # other tests may have left entries
    spark.catalog.clearCache()
    df = scoped_persist(
        spark.read.parquet(f"{SF_DIR}/nation.parquet").select("n_nationkey")
    )
    assert df.count() == 25
    assert not _cache_manager(spark).isEmpty()
    released = release_scoped_caches()
    assert released >= 1
    assert _cache_manager(spark).isEmpty()


def test_scoped_caches_context_manager(spark):
    release_scoped_caches()
    spark.catalog.clearCache()
    with scoped_caches():
        df = scoped_persist(spark.read.parquet(f"{SF_DIR}/region.parquet"))
        assert df.count() == 5
        assert not _cache_manager(spark).isEmpty()
    assert _cache_manager(spark).isEmpty()


def test_scoped_caches_nested_scopes_release_independently(spark):
    """An inner scoped_caches block must drain only its OWN persists —
    the enclosing scope's still-live persist survives to its action."""
    release_scoped_caches()
    spark.catalog.clearCache()
    with scoped_caches():
        outer = scoped_persist(spark.read.parquet(f"{SF_DIR}/nation.parquet"))
        assert outer.count() == 25
        with scoped_caches():
            inner = scoped_persist(spark.read.parquet(f"{SF_DIR}/region.parquet"))
            assert inner.count() == 5
        # inner released, outer still cached
        assert outer.storageLevel.useMemory, "outer persist was drained early"
        assert not _cache_manager(spark).isEmpty()
    assert _cache_manager(spark).isEmpty()


def test_release_is_idempotent_and_safe_when_empty(spark):
    release_scoped_caches()
    assert release_scoped_caches() == 0


def test_query_boundary_drains_previous_query(spark):
    """Entering any registered query releases the PREVIOUS query's
    operator persists, so the driver's sequential correctness run
    holds at most one query's caches at a time."""
    from alpaca_pyspark_spark.queries import QUERIES

    release_scoped_caches()
    spark.catalog.clearCache()
    # q120 takes a scoped persist internally and returns lazily
    df = QUERIES["q120_domain_distinctive_tokens"](spark, SF_DIR)
    df.count()  # the consuming action
    assert not _cache_manager(spark).isEmpty()
    # driver moves on: the NEXT query's entry drains the ledger
    QUERIES["q31_token_count"](spark, SF_DIR).count()
    assert _cache_manager(spark).isEmpty()
    release_scoped_caches()


def test_registered_query_inside_scoped_block_respects_floor(spark):
    """A registered query's boundary release must NOT drain an
    enclosing scoped_caches() block's still-live persists (round-5
    advice: the bare release used to drain the ENTIRE ledger)."""
    from alpaca_pyspark_spark.queries import QUERIES

    release_scoped_caches()
    spark.catalog.clearCache()
    with scoped_caches():
        outer = scoped_persist(spark.read.parquet(f"{SF_DIR}/nation.parquet"))
        assert outer.count() == 25
        # entering a registered query calls release_scoped_caches()
        # with no mark — it must stop at the scope floor
        QUERIES["q31_token_count"](spark, SF_DIR).count()
        assert outer.storageLevel.useMemory, (
            "query boundary drained the enclosing scope's persist"
        )
    assert _cache_manager(spark).isEmpty()


def test_streaming_gate_error_path_restores_conf_and_cleans_staging(spark, tmp_path):
    """An exception inside transform() must still restore
    spark.sql.shuffle.partitions and remove the staged temp dirs
    (round-5 advice: the pre-try section leaked both)."""
    import glob

    from alpaca_pyspark_spark.streaming.gate import run_streaming_gate

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    df = spark.range(3).selectExpr("id", "timestamp'2024-01-01' as ts")
    marker = "sgate_errtest"
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="boom"):
        def bad_transform(s):
            raise RuntimeError("boom")

        run_streaming_gate(
            spark, [(df, None)], bad_transform, prefix=marker
        )
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev
    import tempfile

    leaked = glob.glob(f"{tempfile.gettempdir()}/{marker}_*")
    assert leaked == [], f"staged dirs leaked on error path: {leaked}"


def test_events_fingerprint_uses_nanosecond_mtime(tmp_path):
    """A same-second rewrite with identical names/sizes must change
    the fingerprint (round-5 advice: whole-second getmtime could
    return a stale cached max — the watermark-withheld-tail hazard)."""
    import os

    from alpaca_pyspark_spark.streaming.gate import _events_fingerprint

    p = tmp_path / "events.parquet"
    p.write_bytes(b"x" * 64)
    os.utime(p, ns=(1_700_000_000_000_000_000, 1_700_000_000_000_000_000))
    fp1 = _events_fingerprint(str(tmp_path))
    # rewrite within the same wall-clock second: +1 microsecond
    os.utime(p, ns=(1_700_000_000_000_000_000, 1_700_000_000_000_001_000))
    fp2 = _events_fingerprint(str(tmp_path))
    assert fp1 != fp2, "same-second rewrite produced an identical fingerprint"


def test_streaming_gate_max_ts_memoized(spark):
    """events_max_ts: one scan per (session, sf_dir) — N streaming
    queries must not pay N full event scans for their sentinels."""
    from alpaca_pyspark_spark.streaming import gate

    key = (SF_DIR, gate._events_fingerprint(SF_DIR))
    gate._MAX_TS_CACHE.pop(key, None)
    t1 = gate.events_max_ts(spark, SF_DIR)
    assert key in gate._MAX_TS_CACHE
    # poison the cached entry; a second call must NOT rescan
    sentinel = object()
    gate._MAX_TS_CACHE[key] = sentinel
    assert gate.events_max_ts(spark, SF_DIR) is sentinel
    gate._MAX_TS_CACHE[key] = t1
    # the key carries an on-disk fingerprint: a REWRITTEN events table
    # (different file listing) must miss the cache and rescan — a stale
    # max would stall the watermark on the new tail
    stale_only = {k: v for k, v in gate._MAX_TS_CACHE.items() if k[0] == SF_DIR}
    assert all(k == key for k in stale_only), "one live key per sf_dir expected"


def test_streaming_gate_sentinel_shift(spark):
    """The second-drain sentinel moves every timestamp column exactly
    +100 days so the watermark strictly advances past the first."""
    import datetime

    from alpaca_pyspark_spark.streaming.gate import _shift_ts_100d

    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    df = spark.createDataFrame(
        [(-1, base, 0.0)], "user_id long, ts timestamp_ntz, value double"
    )
    row = _shift_ts_100d(df).collect()[0]
    assert row["ts"] == base + datetime.timedelta(days=100)
    assert row["user_id"] == -1 and row["value"] == 0.0
