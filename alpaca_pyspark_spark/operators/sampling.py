"""Reproducible sampling and sequence packing for corpus curation.

Two operators a training-data pipeline needs beyond dedup/quality:

- **Deterministic sampling** — corpus mixing ("keep 30% of source X")
  must be reproducible across reruns, resumable after failures, and
  independent of partitioning.  ``rand()`` is none of those (a retried
  task redraws).  We derive the keep/drop decision purely from the row
  id with a double-round Lehmer (MINSTD) permutation: every
  intermediate stays far below 2^63 (no ANSI overflow on either
  engine), and the same arithmetic runs verbatim in the DuckDB oracle
  — bit-exact reproducibility is part of the contract.
- **Sequence packing** — assign documents to fixed token-budget
  context windows ("concatenate shard in id order, cut every B
  tokens").  Each document's bin is floor(exclusive-prefix-tokens / B)
  — one window function.  Packing is per-shard: each worker packs its
  own deterministic shard of the corpus, so parallelism scales with
  the shard count, not the window count.

Both stay entirely in whole-stage codegen (arithmetic + one window);
nothing here is sampled from an RNG or collected to the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: MINSTD modulus (2^31 - 1, prime) and the two classic multipliers.
MINSTD_M = 2147483647
_MUL1 = 48271
_MUL2 = 16807


def det_hash(col: Column) -> Column:
    """Deterministic pseudo-random value in [0, 2^31-1) from an integer
    id: two Lehmer rounds, ``h = (((id % m) * 48271) % m * 16807) % m``.
    Max intermediate ~2^47 — safe under ANSI BIGINT on any engine."""
    h1 = F.pmod(F.pmod(col, F.lit(MINSTD_M)) * F.lit(_MUL1), F.lit(MINSTD_M))
    return F.pmod(h1 * F.lit(_MUL2), F.lit(MINSTD_M))


def deterministic_sample(
    df: DataFrame, *, id_col: str, rate: float
) -> DataFrame:
    """Keep ~``rate`` of rows, chosen by ``det_hash(id) < rate * m``.
    Partition-independent, rerun-stable, and exactly reproducible in
    plain SQL (no engine RNG involved)."""
    return df.filter(det_hash(F.col(id_col)) < F.lit(int(rate * MINSTD_M)))


def weighted_sample(
    df: DataFrame, *, id_col: str, weight_promille: Column
) -> DataFrame:
    """Per-row-weighted Bernoulli keep (probability = promille/1000),
    decided by the same Lehmer hash as :func:`deterministic_sample` —
    quality-weighted corpus mixing that stays reproducible and
    partition-independent.  All integer arithmetic: ``h*1000 <
    w*(2^31-1)`` never exceeds ~2^41, exactly reproducible in ANSI
    SQL.  ``weight_promille`` must be an integer column in [0, 1000]."""
    return df.filter(
        det_hash(F.col(id_col)) * F.lit(1000)
        < weight_promille.cast("bigint") * F.lit(MINSTD_M)
    )


def pack_sequences(
    df: DataFrame,
    *,
    shard_cols: Sequence[str],
    order_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """Assign each row a context-window ``bin`` within its shard:
    concatenate the shard in ``order_col`` order and cut every
    ``budget`` tokens; a row's bin is where its first token lands
    (``floor(exclusive_prefix / budget)``).  Adds ``bin`` (bigint)."""
    w = (
        Window.partitionBy(*shard_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = F.coalesce(F.sum(tokens_col).over(w), F.lit(0).cast("bigint"))
    return df.withColumn(
        "bin", F.floor(prefix / F.lit(budget)).cast("bigint")
    )
