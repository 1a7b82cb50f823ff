"""Column normalization + SFC key attachment.

Each layout column is mapped to an integer grid cell in [0, 2^bits):

- ``minmax`` (default): cell = floor((v - min) / span * (2^bits - 1)) — pure
  JVM arithmetic; min/max come from ONE aggregate pass over the input.
  Dates/timestamps normalize through their epoch value; strings hash
  (xxhash64 masked to the grid) since they have no usable span.
- ``rank``: equi-depth cells via approxQuantile boundaries (driver-tiny) +
  vectorized searchsorted — skew-robust, used when a column is heavily
  non-uniform.  This mirrors what Delta's Z-order does with
  range_partition_id, without needing an engine extension.

The reference inherits each engine's internal normalization; byte-identical
cross-engine layouts are a non-goal (SURVEY.md §7.4) — locality is what
matters.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.types import LongType

from lakehouse_sfc_spark.sfc.hilbert import hilbert_key_udf
from lakehouse_sfc_spark.sfc.zorder import zorder_key_expr

CURVES = ("linear", "zorder", "hilbert")


@dataclass
class ColumnGrid:
    """How one layout column maps onto the SFC grid."""

    name: str
    kind: str  # "span" | "hash" | "rank"
    lo: float | None = None
    hi: float | None = None
    boundaries: list[float] | None = None


def _orderable_as_double(df: DataFrame, col: str) -> Column | None:
    """Numeric/date/timestamp/bool column as double; None if not orderable
    (strings fall back to hash cells)."""
    dt = df.schema[col].dataType
    c = F.col(col)
    if isinstance(dt, T.TimestampNTZType):
        # NTZ cannot cast to double directly; route through ltz (session tz
        # is fixed, ordering preserved)
        return c.cast("timestamp").cast("double")
    if isinstance(dt, T.TimestampType):
        return c.cast("double")
    if isinstance(dt, T.DateType):
        return c.cast("timestamp").cast("double")
    if isinstance(dt, T.BooleanType):
        return c.cast("int").cast("double")
    if isinstance(dt, T.NumericType):
        return c.cast("double")
    return None


def column_grids(
    df: DataFrame, cols: list[str], bits: int, mode: str = "minmax"
) -> list[ColumnGrid]:
    """Plan the per-column grid.  One aggregate job for all min/max pairs
    (minmax) or one approxQuantile pass (rank) — never a job per column."""
    doubles = {c: _orderable_as_double(df, c) for c in cols}
    grids: list[ColumnGrid] = []
    orderable = [c for c in cols if doubles[c] is not None]

    if mode == "rank" and orderable:
        n_cells = 1 << bits
        probs = [i / n_cells for i in range(1, n_cells)]
        proj = df.select(
            *[doubles[c].alias(f"__d_{c}") for c in orderable]
        )
        all_bounds = proj.stat.approxQuantile(
            [f"__d_{c}" for c in orderable], probs, 1.0 / (4 * n_cells)
        )
        bounds_by_col = dict(zip(orderable, all_bounds))
        for c in cols:
            if doubles[c] is None:
                grids.append(ColumnGrid(c, "hash"))
            else:
                grids.append(ColumnGrid(c, "rank", boundaries=bounds_by_col[c]))
        return grids

    if orderable:
        aggs = []
        for c in orderable:
            aggs.append(F.min(doubles[c]).alias(f"__min_{c}"))
            aggs.append(F.max(doubles[c]).alias(f"__max_{c}"))
        row = df.agg(*aggs).collect()[0]
        stats = {c: (row[f"__min_{c}"], row[f"__max_{c}"]) for c in orderable}
    else:
        stats = {}
    for c in cols:
        if doubles[c] is None:
            grids.append(ColumnGrid(c, "hash"))
        else:
            lo, hi = stats[c]
            grids.append(ColumnGrid(c, "span", lo=lo, hi=hi))
    return grids


def cell_columns(df: DataFrame, grids: list[ColumnGrid], bits: int) -> list[Column]:
    """Grid-cell expression per layout column (nulls -> cell 0)."""
    n_cells = (1 << bits) - 1
    out: list[Column] = []
    for g in grids:
        if g.kind == "hash":
            cell = F.xxhash64(F.col(g.name)).bitwiseAND(F.lit(n_cells))
        elif g.kind == "rank":
            bounds = np.asarray(g.boundaries, dtype=np.float64)
            dcol = _orderable_as_double(df, g.name)

            @F.pandas_udf(LongType())
            def _bucket(s: pd.Series, _b=bounds) -> pd.Series:
                v = s.to_numpy(dtype=np.float64, na_value=-np.inf)
                return pd.Series(np.searchsorted(_b, v, side="right").astype(np.int64))

            cell = _bucket(dcol)
        else:  # span
            lo, hi = g.lo, g.hi
            dcol = _orderable_as_double(df, g.name)
            if lo is None or hi is None or hi <= lo:
                cell = F.lit(0).cast("long")
            else:
                scaled = (dcol - F.lit(lo)) / F.lit(hi - lo) * F.lit(float(n_cells))
                cell = F.least(
                    F.greatest(F.floor(scaled), F.lit(0)), F.lit(n_cells)
                ).cast("long")
        out.append(F.coalesce(cell, F.lit(0)).alias(f"__cell_{g.name}"))
    return out


def default_bits(n_dims: int) -> int:
    return min(16, 63 // max(1, n_dims))


def add_sfc_key(
    df: DataFrame,
    cols: list[str],
    curve: str = "zorder",
    bits: int | None = None,
    mode: str = "minmax",
    key_col: str = "_sfc",
) -> DataFrame:
    """Attach the SFC key column.  ``linear`` needs no key (lexicographic
    sort on the raw columns is the curve); callers branch on that."""
    if curve not in CURVES:
        raise ValueError(f"curve must be one of {CURVES}, got {curve!r}")
    if curve == "linear":
        raise ValueError("linear layout sorts raw columns; no key to add")
    bits = bits or default_bits(len(cols))
    grids = column_grids(df, cols, bits, mode=mode)
    cells = cell_columns(df, grids, bits)
    if curve == "zorder":
        key = zorder_key_expr([c for c in cells], bits)
    else:
        key = hilbert_key_udf([c for c in cells], bits)
    return df.withColumn(key_col, key)
