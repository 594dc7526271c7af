"""Explicit bloom-filter semi-join reduction.

Spark's own runtime bloom filter (``InjectRuntimeFilter``) only fires
past multi-GB scan thresholds and is invisible to the logical plan;
this operator makes the same 100 TB pattern explicit and controllable:
build a compact bloom bitmap over the (filtered) build-side keys, ship
it to every task as ONE broadcast row, and prune the fact scan with
map-stage-only bit tests BEFORE any exchange.  False positives are
possible by construction, so callers keep the real join afterwards —
the bloom only removes rows, never adds them, leaving exact results
exact (the q55 oracle is the plain join).

Shapes:
- build: explode k hash positions per key → groupBy(word) bit_or →
  collapse to a single map<word, bits64> row.  One shuffle over the
  key set (already small: it passed a selective filter).
- probe: crossJoin(broadcast(one row)) + k codegen'd bit tests per
  fact row (``try_element_at`` on the map — no explode, no re-agg,
  no shuffle).

Hash family: ``pmod(xxhash64(key, j), num_bits)`` for j in 0..k-1 —
deterministic, no RNG state (same stance as the salted operators).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BLOOM = "__bloom"


def _positions(key_col: str, num_bits: int, num_hashes: int) -> list[tuple[Column, Column]]:
    """(word_index, bit_mask) pairs for each hash of the key column
    (SQL expressions: the Python ``shiftleft`` wrapper only accepts a
    literal shift count)."""
    out = []
    for j in range(num_hashes):
        h = f"pmod(xxhash64({key_col}, {j}), {num_bits}L)"
        out.append(
            (
                F.expr(f"{h} div 64"),
                F.expr(f"shiftleft(1L, cast({h} % 64 as int))"),
            )
        )
    return out


def build_bloom(
    keys: DataFrame,
    key_col: str,
    *,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """ONE-row DataFrame holding the bloom bitmap of ``keys[key_col]``
    as a DENSE ``array<long>`` of num_bits/64 words — a 1M-bit filter
    is 128 KB, broadcastable at any cluster size.

    Dense array, not map: Spark evaluates ``element_at`` on an array in
    O(1) but scans a MapData linearly per lookup — with thousands of
    words and k probes per fact row a map-backed probe is the slow
    path by orders of magnitude.  Densification is a broadcast join of
    the sparse (word, bits) aggregate onto a ``range(num_words)``
    spine, then one sorted collect into the array."""
    if num_bits % 64:
        raise ValueError("num_bits must be a multiple of 64")
    num_words = num_bits // 64
    pos = _positions(key_col, num_bits, num_hashes)
    exploded = keys.select(
        F.explode(
            F.array(*[F.struct(w.alias("w"), m.alias("m")) for w, m in pos])
        ).alias("p")
    )
    words = exploded.groupBy(F.col("p.w").alias("w")).agg(
        F.bit_or(F.col("p.m")).alias("bits")
    )
    spine = keys.sparkSession.range(num_words).withColumnRenamed("id", "w")
    dense = spine.join(F.broadcast(words), "w", "left").select(
        "w", F.coalesce("bits", F.lit(0)).alias("bits")
    )
    return dense.agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("w", "bits"))),
            lambda s: s["bits"],
        ).alias(_BLOOM)
    )


def bloom_prune(
    fact: DataFrame,
    bloom: DataFrame,
    key_col: str,
    *,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """Keep only fact rows whose ``key_col`` MAY be in the bloom (all
    ``num_hashes`` bits set; false positives survive — follow with the
    real join).  ``num_bits``/``num_hashes`` must match the build."""
    pos = _positions(key_col, num_bits, num_hashes)
    # element_at is 1-based; w < num_bits/64 by construction, so the
    # index is always in bounds (no ANSI out-of-range risk)
    tests = [
        F.element_at(F.col(_BLOOM), (w + 1).cast("int")).bitwiseAND(m) != 0
        for w, m in pos
    ]
    return (
        fact.join(F.broadcast(bloom))
        .filter(reduce(lambda a, b: a & b, tests))
        .drop(_BLOOM)
    )
