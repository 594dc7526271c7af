"""Re-designed paginated-REST ingestion framework + Alpaca sources.

The reference's ingestion layer (SURVEY.md §2A-§2E) rebuilt on the
Spark 4 Python DataSource API with a declarative core:

- :mod:`.spec`        — option validation as data (``ParamSpec``),
  reproducing the reference's eager-driver-side validation semantics.
- :mod:`.http`        — url building, retrying fetch, pagination.
- :mod:`.partitioning`— symbol × time-slice planning incl. the
  volume-adaptive interval formula for bars.
- :mod:`.wire`        — wire-record parsing + Arrow batch assembly
  with malformed-record skip.
- :mod:`.alpaca`      — the six concrete sources: stock bars, stock
  trades, option bars, corporate actions, crypto bars, crypto trades
  (crypto fills the reference's explicit placeholder).
- :mod:`.sink`        — the write-path inverse the reference lacks: a
  paged REST batch sink with two-phase commit manifest.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def register_all(spark: SparkSession) -> None:
    """Register every Alpaca source on a session (the reference's
    ``spark.dataSource.register`` flow, README.md:61)."""
    from .alpaca import (
        CorporateActionsDataSource,
        CryptoBarsDataSource,
        CryptoTradesDataSource,
        OptionBarsDataSource,
        StockBarsDataSource,
        StockTradesDataSource,
    )
    from .sink import RestBatchSink

    for cls in (
        StockBarsDataSource,
        StockTradesDataSource,
        OptionBarsDataSource,
        CorporateActionsDataSource,
        CryptoBarsDataSource,
        CryptoTradesDataSource,
        RestBatchSink,
    ):
        spark.dataSource.register(cls)
