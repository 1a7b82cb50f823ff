"""Z-order (Morton) curve key.

The reference delegates Z-ordering to engine extensions (Delta
``OPTIMIZE ... ZORDER BY`` at delta_write_layout.py:195-219, Iceberg
``zorder(...)`` sort order at iceberg_write_layout.py:251-265, Hudi
``hoodie.clustering...strategy=z-order`` at tpch_all_loader.py:117-122).
Here the key is computed natively.

Spark-first design: the bit interleave is a pure Catalyst column expression
(``shiftleft`` / ``shiftright`` / bitwise AND/OR) — it stays inside
whole-stage codegen with zero Python involvement, so computing the key over
100 TB is just another projected expression in the scan stage.  A numpy twin
(``zorder_index_np``) backs the property tests and the driver-side tooling.
"""

from __future__ import annotations

from functools import reduce

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F


def interleave_positions(n_dims: int, bits: int, dim: int) -> list[tuple[int, int]]:
    """(src_bit, dst_bit) pairs for dimension ``dim`` in MSB-first interleave:
    bit j of dim i lands at position j*n + (n-1-i), so dim 0 is the most
    significant dimension at every bit level."""
    return [(j, j * n_dims + (n_dims - 1 - dim)) for j in range(bits)]


def zorder_key_expr(cells: list[Column], bits: int) -> Column:
    """Morton key as a JVM-side expression over integer cell columns in
    [0, 2^bits).  d*bits shift/mask/or terms — codegen folds these into one
    projection."""
    n = len(cells)
    if n * bits > 63:
        raise ValueError(f"{n} dims x {bits} bits exceeds a signed long")
    if n == 1:
        return cells[0].cast("long")
    terms: list[Column] = []
    for i, cell in enumerate(cells):
        c = cell.cast("long")
        for src, dst in interleave_positions(n, bits, i):
            terms.append(F.shiftleft(F.shiftright(c, src).bitwiseAND(F.lit(1)), dst))
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def interleave_np(cells: np.ndarray, bits: int) -> np.ndarray:
    """MSB-first bit interleave of an (N, d) uint64 array -> (N,) uint64.
    Identical bit layout to ``zorder_key_expr``."""
    n = cells.shape[1]
    out = np.zeros(len(cells), dtype=np.uint64)
    one = np.uint64(1)
    for i in range(n):
        col = cells[:, i].astype(np.uint64)
        for src, dst in interleave_positions(n, bits, i):
            out |= ((col >> np.uint64(src)) & one) << np.uint64(dst)
    return out


def zorder_index_np(cells: np.ndarray, bits: int) -> np.ndarray:
    if cells.ndim != 2:
        raise ValueError("cells must be (N, d)")
    if cells.shape[1] == 1:
        return cells[:, 0].astype(np.uint64)
    return interleave_np(cells, bits)


def zorder_index_py(coords: tuple[int, ...], bits: int) -> int:
    """Slow scalar reference for tests."""
    n = len(coords)
    out = 0
    for i, v in enumerate(coords):
        for j in range(bits):
            out |= ((v >> j) & 1) << (j * n + (n - 1 - i))
    return out
