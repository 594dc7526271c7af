"""Data-contract preflight: verify a dataset satisfies the documented
corpus contracts the engine's exactness recipes rely on.

Several oracle-exact recipes are exact BECAUSE of a data property, not
despite it — those properties are documented where used, and this
module makes them checkable before pointing the engine at new data
(the "can I run this engine on this corpus" audit, one aggregate pass
per table):

- ``cents_quantized``: money/价 columns are cent-quantized, so
  ``round(x*100)`` is an EXACT integer and the integer-cents
  accumulation recipes (q02 vwap, q05 sums, …) are order-independent
  and engine-portable.  A non-quantized value silently changes what
  the recipes compute (round .5 boundaries differ per engine).
- ``events_key_unique``: ``(user_id, ts)`` is unique, so
  ``min_by/max_by(value, ts)`` picks are deterministic (q02 bars,
  q71 argmax, LOCF daily picks).
- ``text_single_byte``: document text is single-byte, so char
  positions == byte positions (q148 frame slicing, q180 resize).
- ``embedding_fixed_dim``: all non-NULL vectors share one dimension
  (every kernel in operators/similarity assumes a rectangle).

NULL payloads are NOT violations — the round-9 NULL contracts
(tables.load_vectors / load_texts, valued-rows-only aggregates)
handle them explicitly.

Returns one row per (contract, table): violations, total checked.  A
dataset is admissible iff every ``violations`` is 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tables import load

# (table, column) pairs under the cents-quantization contract
_MONEY_COLS = [
    ("events", "value"),
    ("lineitem", "l_extendedprice"),
    ("lineitem", "l_discount"),
    ("lineitem", "l_tax"),
    ("orders", "o_totalprice"),
    ("customer", "c_acctbal"),
    ("supplier", "s_acctbal"),
]


def validate_contracts(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = []

    def add(contract: str, table: str, agg_df: DataFrame) -> None:
        rows.append(
            agg_df.select(
                F.lit(contract).alias("contract"),
                F.lit(table).alias("table"),
                F.col("violations").cast("bigint").alias("violations"),
                F.col("total").cast("bigint").alias("total"),
            )
        )

    for table, col in _MONEY_COLS:
        df = load(spark, sf_dir, table)
        c = F.col(col)
        off = F.abs(c * 100 - F.round(c * 100))
        add(
            f"cents_quantized:{col}",
            table,
            df.agg(
                F.count_if(c.isNotNull() & (off > 1e-6)).alias("violations"),
                F.count(c).alias("total"),
            ),
        )

    e = load(spark, sf_dir, "events")
    add(
        "events_key_unique:(user_id,ts)",
        "events",
        e.agg(
            (
                F.count(F.lit(1))
                - F.count_distinct(F.col("user_id"), F.col("ts"))
            ).alias("violations"),
            F.count(F.lit(1)).alias("total"),
        ),
    )

    d = load(spark, sf_dir, "documents")
    add(
        "text_single_byte",
        "documents",
        d.agg(
            F.count_if(
                F.col("text").isNotNull()
                & (F.octet_length("text") != F.length("text"))
            ).alias("violations"),
            F.count("text").alias("total"),
        ),
    )

    v = load(spark, sf_dir, "embeddings")
    add(
        "embedding_fixed_dim",
        "embeddings",
        v.agg(
            (
                F.count_distinct(
                    F.when(
                        F.col("embedding").isNotNull(),
                        F.size("embedding"),
                    )
                )
                - F.least(F.count("embedding"), F.lit(1))
            ).alias("violations"),
            F.count("embedding").alias("total"),
        ),
    )

    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def assert_contracts(spark: SparkSession, sf_dir: str) -> None:
    """Raise ``ValueError`` listing every violated contract (preflight
    form for pipelines)."""
    bad = [
        (r["contract"], r["table"], r["violations"])
        for r in validate_contracts(spark, sf_dir).collect()
        if r["violations"] != 0
    ]
    if bad:
        raise ValueError(f"data-contract violations: {bad}")
