"""Plane-dot sign-parity pins (ADVICE r10, search.py q92_lsh/q206).

The LSH oracles (q92_lsh, q206) replay the sign-bucket join in DuckDB
SQL, which rests on an EMPIRICAL cross-engine invariant: Spark's
sequential ``aggregate``/``zip_with`` dot fold and DuckDB's
``list_dot_product`` agree on the SIGN of every (vector, hyperplane)
dot, even though the raw dots are NOT bit-identical (different
accumulation order — measured divergence up to ~9e-16 on this data).
These tests pin (a) the margin between the smallest |dot| and the
largest cross-engine divergence, and (b) zero sign flips, on the real
test data at sf0.01 — so a future kernel change or a near-boundary
vector fails HERE (and in the registered q207 canary) with exact
localization, not as an unexplained q92_lsh family red.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from alpaca_pyspark_spark.operators.similarity import _hyperplane

SF_DIR = "/root/testdata/sf0.01"
DIM = 64
N_PLANES = 16

#: Measured at sf0.01/sf0.1: max cross-engine divergence 8.9e-16,
#: min |dot| 3.5e-7.  The pins leave ~100x slack on each side so the
#: test fails on a real erosion, not on a new data row of the same
#: family.
MAX_DIVERGENCE = 1e-13
MIN_MARGIN = 1e-9


def _sequential_dots(vectors: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """The engine's fold order, vectorized across (vector, plane)
    pairs: one accumulate per dimension, ((0 + a0*b0) + a1*b1) + ...
    numpy elementwise ops are plain IEEE (no FMA/pairwise), so each
    entry is bit-identical to the ``aggregate``/``zip_with`` fold
    (same argument as similarity._seq_dot_block, which is pinned
    against the Spark fold elsewhere in the suite)."""
    acc = np.zeros((vectors.shape[0], planes.shape[0]))
    for i in range(vectors.shape[1]):
        acc = acc + vectors[:, i, None] * planes[None, :, i]
    return acc


@pytest.fixture(scope="module")
def parity():
    con = duckdb.connect()
    planes = [_hyperplane(p, DIM) for p in range(N_PLANES)]
    rows = con.execute(
        "SELECT vec_id, embedding::DOUBLE[] FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet') "
        "WHERE embedding IS NOT NULL ORDER BY vec_id"
    ).fetchall()
    assert rows, "sf0.01 embeddings table is empty"
    V = np.array([r[1] for r in rows])
    sel = ", ".join(
        "list_dot_product(embedding::DOUBLE[], ["
        + ", ".join(repr(x) for x in pl)
        + f"]) AS d{p}"
        for p, pl in enumerate(planes)
    )
    duck = np.array(
        [
            r[1:]
            for r in con.execute(
                f"SELECT vec_id, {sel} FROM "
                f"read_parquet('{SF_DIR}/embeddings.parquet') "
                "WHERE embedding IS NOT NULL ORDER BY vec_id"
            ).fetchall()
        ]
    )
    fold = _sequential_dots(V, np.array(planes))
    return fold, duck


def test_sign_parity_no_flips(parity):
    fold, duck = parity
    flips = np.sum((fold >= 0) != (duck >= 0))
    assert flips == 0, f"{flips} sign flips between fold and list_dot_product"


def test_divergence_and_margin_headroom(parity):
    fold, duck = parity
    divergence = np.max(np.abs(fold - duck))
    margin = min(np.min(np.abs(fold)), np.min(np.abs(duck)))
    assert divergence < MAX_DIVERGENCE, (
        f"cross-engine dot divergence {divergence:.3e} exceeds the "
        f"pinned bound {MAX_DIVERGENCE:.0e} — the accumulation kernels "
        "have drifted; re-derive the q207 canary's headroom claim"
    )
    assert margin > MIN_MARGIN, (
        f"smallest |dot| {margin:.3e} is within {MIN_MARGIN:.0e} of the "
        "sign boundary — a bucket bit could flip in one engine only; "
        "the q92_lsh/q206 oracles are at risk"
    )
    # the actual invariant the LSH oracles need: margin >> divergence
    assert margin > 1000 * divergence


def test_dial_plane_set_is_subset_of_q207_cover(spark):
    """VERDICT r11 stretch: the q207 canary pins all 16 STATIC
    hyperplanes, and q206's dial buckets with the low ``planes`` bits
    of the same 16 — so the canary covers every plane any dial value
    can select.  Pin that subset relation both ways: (a) the dial can
    never exceed the canary's plane count, and (b) ``sign_bucket`` at
    every reachable dial value equals the low-bit composition of the
    canary's per-plane sign bits — so a future dial change (more or
    rotated planes) cannot silently exit the canary's cover."""
    from pyspark.sql import functions as F

    from alpaca_pyspark_spark.operators.similarity import (
        _dot_literal,
        _hyperplane,
        lsh_planes_dial,
        sign_bucket,
    )
    from alpaca_pyspark_spark.queries.search import _Q92_LSH_PLANES

    # (a) cap: every reachable dial value fits under the canary
    dial_values = {
        lsh_planes_dial(n) for n in (0, 1, 31, 32, 2**10, 2**15, 2**20, 2**63)
    }
    assert min(dial_values) == 3 and max(dial_values) == N_PLANES
    assert all(3 <= v <= N_PLANES for v in dial_values)
    assert _Q92_LSH_PLANES <= N_PLANES

    # (b) structure: bucket bits ARE the canary's sign bits.  Vectors
    # chosen deterministically with mixed signs and magnitudes.
    rows = [
        (i, [((i * 31 + j * 17) % 13 - 6) / 7.0 for j in range(DIM)])
        for i in range(8)
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    canary_bits = F.array(
        *[
            F.when(
                _dot_literal(F.col("v"), _hyperplane(p, DIM)) >= 0, F.lit(1)
            )
            .otherwise(F.lit(0))
            .cast("long")
            for p in range(N_PLANES)
        ]
    )
    checks = df.select(
        canary_bits.alias("bits"),
        *[
            sign_bucket(F.col("v"), dim=DIM, num_planes=k).alias(f"b{k}")
            for k in sorted(dial_values)
        ],
    ).collect()
    for r in checks:
        for k in sorted(dial_values):
            composed = sum(b << p for p, b in enumerate(r["bits"][:k]))
            assert r[f"b{k}"] == composed, (
                f"sign_bucket(num_planes={k}) no longer composes the "
                "q207 canary's plane signs — the dial has exited the "
                "canary's cover"
            )
