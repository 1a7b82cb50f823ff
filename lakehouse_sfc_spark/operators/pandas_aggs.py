"""Grouped-aggregate Pandas UDF kernels (SURVEY §2.10 Arrow UDF surface).

Deliberately NO ``from __future__ import annotations`` here: the kernels
are registered through PySpark's type-hint eval-type inference
(``pd.Series -> scalar`` ⇒ grouped-agg), the supported replacement for the
deprecated ``PandasUDFType.GROUPED_AGG`` constant — stringified annotations
would defeat the inference.

Determinism contract (the reason these kernels look paranoid):
- ``to_numpy(dtype="float64")`` pins the multiply to float64 regardless of
  the Arrow/pandas dtype the batch arrived as (a float32 batch multiplied
  in float32 rounds differently and breaks the bit-exact oracle hash).
- ``np.isfinite`` drops NaN AND ±Inf, not just NULL: engines disagree on
  NaN ordering/casting (DuckDB treats NaN as a value and errors casting it
  to int; pandas ``dropna`` silently removes it).  The SQL oracle mirrors
  the same filter with ``FILTER (WHERE isfinite(value))``.
- Accumulation is int64 fixed-point ticks — integer addition is
  order-independent, so partition order can't change the result.  Domain
  precondition: |value| < 2^63/1e4 ≈ 9.2e14, or the tick cast overflows
  (DuckDB errors, numpy wraps — divergent by construction).

Scale note: GROUPED_AGG materializes the WHOLE group per call (one Arrow
batch spanning the group — it is not a partial/combiner aggregation), so it
is only safe when every group fits in executor memory.  Bounded-group
precondition aside, the plan is the same single hash exchange as a built-in
SUM (ObjectHashAggregate).  For unbounded groups at 100 TB, compute the
fixed-point SUM with built-ins instead:
``F.sum(F.floor(F.col(c) * 10000).cast("long"))``.
"""

import numpy as np
import pandas as pd


def sum_ticks_kernel(v: pd.Series) -> int:
    """Sum of floor(value·1e4) as int64 over FINITE values; SQL SUM of an
    empty/all-NULL group is NULL, not 0 — match it."""
    a = v.to_numpy(dtype="float64", na_value=np.nan)
    a = a[np.isfinite(a)]
    if not len(a):
        return None
    return int(np.floor(a * 10000.0).astype("int64").sum())


def count_finite_kernel(v: pd.Series) -> int:
    """COUNT of finite values (mirrors the oracle's isfinite filter)."""
    a = v.to_numpy(dtype="float64", na_value=np.nan)
    return int(np.isfinite(a).sum())
