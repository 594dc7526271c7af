"""Raw-file ingest: schema-explicit CSV / JSONL readers with
corrupt-record quarantine, and small-file compaction.

A 100 TB training-data pipeline ingests raw dumps (JSONL crawls, CSV
exports) long before anything is columnar; these wrappers pin the two
properties that matter at that scale:

- **Explicit schema, never inference.**  Schema inference is an extra
  full scan of the input (Spark reads everything once just to guess
  types) and it is load-order-dependent — a 100 TB re-crawl can
  silently change a column's type.  Every reader here REQUIRES a
  schema.
- **PERMISSIVE + quarantine, never fail-or-drop.**  At billions of
  rows there WILL be malformed records.  `DROPMALFORMED` destroys
  evidence and `FAILFAST` destroys the job; the readers run PERMISSIVE
  with ``columnNameOfCorruptRecord`` so bad lines survive as data, and
  :func:`split_corrupt` forks the stream into (clean, quarantined)
  in one pass — mirroring the connector's malformed-record
  warn-and-skip contract (reference `wire.py` C5) with the evidence
  kept instead of logged away.

Compaction (:func:`compact_to_target_files`) is the maintenance half:
streaming/incremental ingest leaves thousands of KB-sized files per
partition; scans then pay one task + one open per file.  Rewriting to
size-targeted files is a pure layout change — content-identical,
verified in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ..session import scoped_persist

#: Column capturing the raw text of rows that failed to parse.
CORRUPT_COL = "_corrupt_record"


def _with_corrupt_field(schema: StructType) -> StructType:
    """The corrupt-record column must be part of the declared schema
    for PERMISSIVE capture to keep it."""
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType())])


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """Line-delimited JSON with explicit schema; malformed lines are
    kept in ``_corrupt_record`` instead of dropped or fatal."""
    return (
        spark.read.schema(_with_corrupt_field(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """CSV with explicit schema + corrupt capture (same contract as
    :func:`read_jsonl`)."""
    return (
        spark.read.schema(_with_corrupt_field(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .csv(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Fork a PERMISSIVE read into (clean, quarantine).

    Clean rows drop the corrupt column; quarantine rows keep ONLY the
    raw line (plus nothing parsed — by PERMISSIVE semantics the other
    fields are null anyway).  Spark requires a cache/checkpoint
    barrier between a corrupt-record read and a filter on the corrupt
    column (SPARK-21610: the pushdown would otherwise prune the very
    column being filtered); the caller owns when to materialize, so
    the barrier here is a cache marker — a SCOPED one
    (``session.scoped_persist``), released like every operator persist
    at the next query boundary."""
    cached = scoped_persist(df)
    clean = cached.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = cached.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return clean, quarantine


def compact_to_target_files(
    df: DataFrame,
    dest: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    estimated_input_bytes: int | None = None,
) -> int:
    """Rewrite ``df`` as ~``target_file_bytes`` parquet files.

    File count = ceil(input_bytes / target).  Input size comes from
    the logical plan's stats when not supplied (parquet scans report
    sizeInBytes from footers — no extra job).  Uses a round-robin
    ``repartition(n)`` — NOT ``coalesce`` — because coalesce collapses
    upstream parallelism into the merged tasks (the classic
    write-side trap: a coalesce(8) makes the whole preceding pipeline
    run on 8 tasks), while repartition keeps upstream parallelism and
    pays one balanced shuffle.  Returns the file count written."""
    if estimated_input_bytes is None:
        estimated_input_bytes = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    n_files = max(1, -(-estimated_input_bytes // target_file_bytes))
    df.repartition(n_files).write.mode("overwrite").parquet(dest)
    return n_files
