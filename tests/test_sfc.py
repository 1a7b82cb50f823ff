"""SFC kernel properties: bijection on the full grid, Hilbert unit-step
adjacency (the defining curve property), Z-order bit layout vs the scalar
reference, JVM expression vs numpy twin equivalence, and locality sanity."""

from __future__ import annotations

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from lakehouse_sfc_spark.sfc.hilbert import hilbert_index_np
from lakehouse_sfc_spark.sfc.zorder import (
    zorder_index_np,
    zorder_index_py,
    zorder_key_expr,
)
from lakehouse_sfc_spark.sfc.keys import add_sfc_key


def _full_grid(bits: int, dims: int) -> np.ndarray:
    side = 1 << bits
    return np.array(
        list(itertools.product(range(side), repeat=dims)), dtype=np.uint64
    )


@pytest.mark.parametrize("dims,bits", [(2, 4), (3, 3), (4, 2)])
def test_zorder_bijection(dims, bits):
    grid = _full_grid(bits, dims)
    keys = zorder_index_np(grid, bits)
    assert sorted(keys.tolist()) == list(range((1 << bits) ** dims))


@pytest.mark.parametrize("dims,bits", [(2, 4), (3, 3), (4, 2), (5, 2)])
def test_hilbert_bijection(dims, bits):
    grid = _full_grid(bits, dims)
    keys = hilbert_index_np(grid, bits)
    assert sorted(keys.tolist()) == list(range((1 << bits) ** dims))


@pytest.mark.parametrize("dims,bits", [(2, 5), (3, 3), (4, 2)])
def test_hilbert_adjacency(dims, bits):
    """Consecutive Hilbert indices must be unit-Manhattan-distance grid
    neighbors — this is what makes the curve better than Morton for range
    locality."""
    grid = _full_grid(bits, dims)
    keys = hilbert_index_np(grid, bits)
    order = np.argsort(keys)
    walk = grid[order].astype(np.int64)
    steps = np.abs(np.diff(walk, axis=0)).sum(axis=1)
    assert (steps == 1).all()


def test_zorder_matches_scalar_reference():
    rng = np.random.default_rng(7)
    pts = rng.integers(0, 1 << 8, size=(500, 3), dtype=np.uint64)
    vec = zorder_index_np(pts, 8)
    for p, k in zip(pts.tolist(), vec.tolist()):
        assert zorder_index_py(tuple(p), 8) == k


def test_zorder_monotone_per_dimension():
    """Fixing all other dims, the key is monotone in each dim."""
    bits = 6
    side = 1 << bits
    for d in range(3):
        coords = np.zeros((side, 3), dtype=np.uint64)
        coords[:, d] = np.arange(side, dtype=np.uint64)
        keys = zorder_index_np(coords, bits)
        assert (np.diff(keys.astype(np.int64)) > 0).all()


def test_zorder_expr_matches_numpy(spark):
    rng = np.random.default_rng(11)
    pts = rng.integers(0, 1 << 12, size=(1000, 3), dtype=np.int64)
    pdf = spark.createDataFrame(
        [(int(a), int(b), int(c)) for a, b, c in pts], "x long, y long, z long"
    )
    out = pdf.select(
        zorder_key_expr([F.col("x"), F.col("y"), F.col("z")], 12).alias("k")
    ).collect()
    expected = zorder_index_np(pts.astype(np.uint64), 12)
    assert [r.k for r in out] == expected.astype(np.int64).tolist()


@pytest.mark.parametrize("curve", ["zorder", "hilbert"])
def test_add_sfc_key_on_real_table(spark, curve):
    from lakehouse_sfc_spark.sources.loader import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    keyed = add_sfc_key(li, ["l_shipdate", "l_quantity"], curve=curve, bits=8)
    stats = keyed.agg(
        F.countDistinct("_sfc"), F.min("_sfc"), F.max("_sfc"), F.count("*")
    ).collect()[0]
    assert stats[1] >= 0
    assert stats[2] < (1 << 16)
    assert stats[0] > 100  # keys actually spread over the grid
    assert stats[3] == li.count()


def test_sfc_locality_beats_random(spark):
    """Rows sorted by z-key over (x, y) should put near-equal x values into
    the same chunk far more often than unsorted data — a cheap proxy for
    file-skipping effectiveness."""
    from lakehouse_sfc_spark.sources.loader import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    keyed = add_sfc_key(li, ["l_quantity", "l_extendedprice"], curve="zorder")
    rows = (
        keyed.select("l_quantity", "_sfc").orderBy("_sfc").collect()
    )
    qty = np.array([r.l_quantity for r in rows])
    n_chunks = 20
    chunks = np.array_split(qty, n_chunks)
    sorted_span = np.mean([c.max() - c.min() for c in chunks])
    full_span = qty.max() - qty.min()
    # each z-ordered chunk should cover well under the full quantity range
    assert sorted_span < 0.8 * full_span
