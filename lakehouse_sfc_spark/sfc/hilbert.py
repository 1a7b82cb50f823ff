"""Hilbert curve key (d dimensions), vectorized.

The reference gets Hilbert layouts only through Hudi's clustering strategy
(``hoodie.clustering.layout.optimize.strategy=hilbert``,
hudi_write_layout.py:111-115).  Here the index is computed with Skilling's
transpose algorithm ("Programming the Hilbert curve", AIP Conf. Proc. 707,
2004 — public domain), vectorized over numpy arrays and exposed as an
Arrow-batched pandas_udf: the only Python in the layout path, amortized over
10k-row batches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from lakehouse_sfc_spark.sfc.zorder import interleave_np


def _axes_to_transpose(X: np.ndarray, bits: int) -> np.ndarray:
    """Skilling AxesToTranspose, vectorized: (N, d) uint64 grid coordinates
    -> transpose-form Hilbert index (bit j of X[:, i] is index bit j*d+...)."""
    X = X.astype(np.uint64).copy()
    N, n = X.shape
    one = np.uint64(1)
    M = one << np.uint64(bits - 1)

    # Inverse undo excess work
    Q = M
    while Q > one:
        P = Q - one
        for i in range(n):
            hi = (X[:, i] & Q) != 0
            # invert low bits of X[0] where this dim's Q bit is set
            X[hi, 0] ^= P
            # otherwise exchange low bits of X[0] and X[i]
            lo = ~hi
            t = (X[lo, 0] ^ X[lo, i]) & P
            X[lo, 0] ^= t
            X[lo, i] ^= t
        Q >>= one

    # Gray encode
    for i in range(1, n):
        X[:, i] ^= X[:, i - 1]
    t = np.zeros(N, dtype=np.uint64)
    Q = M
    while Q > one:
        mask = (X[:, n - 1] & Q) != 0
        t[mask] ^= Q - one
        Q >>= one
    for i in range(n):
        X[:, i] ^= t
    return X


def hilbert_index_np(cells: np.ndarray, bits: int) -> np.ndarray:
    """(N, d) integer grid coords in [0, 2^bits) -> (N,) uint64 Hilbert
    index.  d=1 degenerates to identity."""
    if cells.ndim != 2:
        raise ValueError("cells must be (N, d)")
    if cells.shape[1] == 1:
        return cells[:, 0].astype(np.uint64)
    transpose = _axes_to_transpose(cells, bits)
    return interleave_np(transpose, bits)


def hilbert_key_udf(cells: list[Column], bits: int) -> Column:
    """Hilbert key over integer cell columns as an Arrow-batched pandas_udf."""
    n = len(cells)
    if n * bits > 63:
        raise ValueError(f"{n} dims x {bits} bits exceeds a signed long")

    @F.pandas_udf(LongType())
    def _hilbert(*cols: pd.Series) -> pd.Series:
        arr = np.column_stack(
            [c.to_numpy(dtype=np.int64, na_value=0) for c in cols]
        ).astype(np.uint64)
        return pd.Series(hilbert_index_np(arr, bits).astype(np.int64))

    return _hilbert(*cells)
