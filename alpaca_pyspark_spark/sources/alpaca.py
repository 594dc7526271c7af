"""The four Alpaca sources on the Spark 4 Python DataSource API.

Re-designed equivalents of the reference's source classes (SURVEY.md
§2A A1-A4) — same registered format names, same 9/8/9-column schemas,
same option semantics — built from the declarative framework in this
package instead of an inheritance chain:

- ``Alpaca_Stocks_Bars``       (reference stocks/bars.py:23-89)
- ``Alpaca_Stocks_Trades``     (reference stocks/trades.py:25-140)
- ``Alpaca_Options_Bars``      (reference options/bars.py:17-48)
- ``Alpaca_Corporate_Actions`` (reference corp_actions/corporate_actions.py:38-175)

Catalyst cannot push filters into a Python DataSource, so — exactly
like the reference — the *options* are the pushdown surface (symbols /
start / end / limit / sort / types / ... become API query params) and
``partitions()`` is the partition pruning (SURVEY.md §4).
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
from pyspark.sql.datasource import DataSource, DataSourceReader
from pyspark.sql.types import StructType

from .http import make_fetcher, paginate
from .partitioning import (
    DEFAULT_LIMIT,
    SymbolSlicePartition,
    parse_timeframe,
    plan_partitions,
)
from .spec import (
    ASOF_PATTERN,
    TIMEFRAME_PATTERN,
    EndpointConfig,
    ParamSpec,
    base_history_specs,
    validate_options,
)
from .wire import (
    TS_UTC_US,
    FieldSpec,
    RecordTable,
    join_conditions,
    parse_utc_timestamp,
)

# ------------------------------------------------------------ tables
BARS_TABLE = RecordTable(
    "bars",
    [
        FieldSpec("time", "t", TS_UTC_US, parse_utc_timestamp),
        FieldSpec("open", "o", pa.float64(), float),
        FieldSpec("high", "h", pa.float64(), float),
        FieldSpec("low", "l", pa.float64(), float),
        FieldSpec("close", "c", pa.float64(), float),
        FieldSpec("volume", "v", pa.int64(), int),
        FieldSpec("trade_count", "n", pa.int64(), int),
        FieldSpec("vwap", "vw", pa.float64(), float),
    ],
)

TRADES_TABLE = RecordTable(
    "trades",
    [
        FieldSpec("time", "t", TS_UTC_US, parse_utc_timestamp),
        FieldSpec("exchange", "x", pa.string(), str),
        FieldSpec("price", "p", pa.float64(), float),
        FieldSpec("size", "s", pa.int64(), int),
        FieldSpec("conditions", "c", pa.string(), join_conditions, default=""),
        FieldSpec("id", "i", pa.int64(), int),
        FieldSpec("tape", "z", pa.string(), str),
    ],
)

CORP_ACTIONS_TABLE = RecordTable(
    "corporate_actions",
    [
        FieldSpec("ex_date", "ex_date", TS_UTC_US, parse_utc_timestamp, nullable=True),
        FieldSpec("record_date", "record_date", TS_UTC_US, parse_utc_timestamp, nullable=True),
        FieldSpec("payable_date", "payable_date", TS_UTC_US, parse_utc_timestamp, nullable=True),
        FieldSpec("type", "type", pa.string(), str, default=""),
        FieldSpec("amount", "amount", pa.float64(), float, default=0.0),
        FieldSpec("ratio", "ratio", pa.float64(), float, default=0.0),
        FieldSpec("new_symbol", "new_symbol", pa.string(), str, default=""),
        FieldSpec("old_symbol", "old_symbol", pa.string(), str, default=""),
    ],
)

# ------------------------------------------------------- option specs
ADJUSTMENT_ENUM = ("raw", "split", "dividend", "all")
FEED_ENUM = ("iex", "sip", "delayed_sip", "otc")
CA_TYPES_ENUM = ("dividend", "split", "merger", "spinoff", "stock_dividend", "all")
DATE_TYPE_ENUM = ("ex_date", "record_date", "payable_date")


def stock_bars_specs() -> list[ParamSpec]:
    return base_history_specs() + [
        ParamSpec("timeframe", required=True, pattern=TIMEFRAME_PATTERN),
        ParamSpec("adjustment", enum=ADJUSTMENT_ENUM),
        ParamSpec("feed", enum=FEED_ENUM),
        ParamSpec("currency"),
        ParamSpec("asof", pattern=ASOF_PATTERN),
    ]


def option_bars_specs() -> list[ParamSpec]:
    return base_history_specs() + [
        ParamSpec("timeframe", required=True, pattern=TIMEFRAME_PATTERN),
    ]


def stock_trades_specs() -> list[ParamSpec]:
    return base_history_specs() + [
        ParamSpec("feed", enum=FEED_ENUM),
        ParamSpec("currency"),
    ]


def corp_actions_specs() -> list[ParamSpec]:
    return base_history_specs() + [
        ParamSpec("types", enum=CA_TYPES_ENUM, enum_multi=True),
        ParamSpec("date_type", enum=DATE_TYPE_ENUM),
    ]


# ------------------------------------------------------------ reader
class PaginatedRestReader(DataSourceReader):
    """Generic reader: one task per (symbol, time-slice); each task
    pages through the REST endpoint and yields one Arrow RecordBatch
    per page (the scan itself never shuffles)."""

    def __init__(
        self,
        config: EndpointConfig,
        params: dict[str, str],
        table: RecordTable,
        path: str,
        *,
        adaptive_timeframe: bool = False,
    ):
        self.config = config
        self.params = params
        self.table = table
        self.path = path
        self.adaptive_timeframe = adaptive_timeframe

    def partitions(self):
        from .spec import parse_iso_datetime

        symbols = self.params["symbols"].split(",")
        start = parse_iso_datetime(self.params["start"], "start")
        end = parse_iso_datetime(self.params["end"], "end")
        timeframe = (
            parse_timeframe(self.params["timeframe"]) if self.adaptive_timeframe else None
        )
        return plan_partitions(
            symbols,
            start,
            end,
            timeframe=timeframe,
            limit=int(self.params.get("limit", DEFAULT_LIMIT)),
        )

    def read(self, partition: SymbolSlicePartition):
        fetcher = make_fetcher(self.config.endpoint, self.path, self.config.headers)
        part_params = {
            k: v for k, v in self.params.items() if k not in ("symbols", "start", "end")
        }
        part_params.update(
            symbols=partition.symbol,
            start=partition.start.isoformat(),
            end=partition.end.isoformat(),
            limit=self.params.get("limit", str(DEFAULT_LIMIT)),
        )
        for page in paginate(
            fetcher, part_params, rate_limit_delay=self.config.rate_limit_delay
        ):
            batch = self.table.page_to_batch(page)
            if batch is not None:
                yield batch


# ----------------------------------------------------------- sources
class _BaseAlpacaDataSource(DataSource):
    """Shared construction: eager option validation on the driver —
    every option error surfaces before any job runs (reference
    common.py:214-216 stance)."""

    SPECS: staticmethod
    TABLE: RecordTable
    PATH: str
    ADAPTIVE = False

    def __init__(self, options: dict[str, Any]):
        super().__init__(options)
        self._config, self._params = validate_options(dict(options), type(self).SPECS())

    def schema(self) -> str:
        # DDL string, not StructType: schema() runs in a sessionless
        # Python worker where fromDDL cannot parse
        return type(self).TABLE.ddl

    def reader(self, schema: StructType) -> DataSourceReader:
        return PaginatedRestReader(
            self._config,
            self._params,
            type(self).TABLE,
            type(self).PATH,
            adaptive_timeframe=type(self).ADAPTIVE,
        )


class StockBarsDataSource(_BaseAlpacaDataSource):
    SPECS = staticmethod(stock_bars_specs)
    TABLE = BARS_TABLE
    PATH = "stocks/bars"
    ADAPTIVE = True

    @classmethod
    def name(cls) -> str:
        return "Alpaca_Stocks_Bars"


class StockTradesDataSource(_BaseAlpacaDataSource):
    SPECS = staticmethod(stock_trades_specs)
    TABLE = TRADES_TABLE
    PATH = "stocks/trades"

    @classmethod
    def name(cls) -> str:
        return "Alpaca_Stocks_Trades"


class OptionBarsDataSource(_BaseAlpacaDataSource):
    SPECS = staticmethod(option_bars_specs)
    TABLE = BARS_TABLE
    PATH = "options/bars"
    ADAPTIVE = True

    @classmethod
    def name(cls) -> str:
        return "Alpaca_Options_Bars"


class CorporateActionsDataSource(_BaseAlpacaDataSource):
    SPECS = staticmethod(corp_actions_specs)
    TABLE = CORP_ACTIONS_TABLE
    PATH = "stocks/corporate_actions"

    @classmethod
    def name(cls) -> str:
        return "Alpaca_Corporate_Actions"
