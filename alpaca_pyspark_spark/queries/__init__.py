"""Declared query registry (SURVEY.md §2G).

``QUERIES`` maps a stable query id to a ``(spark, sf_dir) ->
DataFrame`` callable; ``ORACLE`` maps the same id to equivalent ANSI
SQL for the DuckDB oracle.  Ids missing from ``ORACLE`` are
non-SQL-expressible ops (the driver records a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import advanced, analytics, core, extended, llm, mining, scale, search, tpch, warehouse

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}

for mod in (core, extended, llm, scale, advanced, analytics, mining, warehouse, search, tpch):
    QUERIES.update(mod.QUERIES)
    ORACLE.update(mod.ORACLE)
