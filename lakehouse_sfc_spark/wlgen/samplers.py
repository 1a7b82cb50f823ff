"""Selectivity-targeted predicate samplers over histogram inverse CDFs
(reference semantics: wlg/sampler/predicates.py).

- ``sample_between``: uniform window start p ∈ [0, 1-s], bounds =
  invCDF(p), invCDF(p+s) — a BETWEEN hitting ~s selectivity.
- ``sample_eq_from_topk``: equality value drawn ∝ top-k frequency.
- ``sample_copula``: correlated multi-dim box via a Gaussian copula
  (constant off-diagonal ρ, Cholesky), per-dim marginal selectivity
  target^(1/d).
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from lakehouse_sfc_spark.profiler.stats import UniDist


def sample_between(dist: UniDist, target_sel: float, rng) -> tuple[float, float]:
    s = max(0.0, min(1.0, target_sel))
    start = rng.uniform(0.0, max(0.0, 1.0 - s))
    lo = dist.inv_cdf(start)
    hi = dist.inv_cdf(min(1.0, start + s))
    return (hi, lo) if lo > hi else (lo, hi)


def sample_eq_from_topk(topk: Sequence[tuple[str, int]], rng) -> str:
    if not topk:
        raise ValueError("top-k list must be non-empty for equality sampling")
    total = sum(freq for _, freq in topk)
    if total <= 0:
        return topk[0][0]
    needle = rng.uniform(0, total)
    acc = 0.0
    for value, freq in topk:
        acc += freq
        if needle <= acc:
            return value
    return topk[-1][0]


def _phi(x: float) -> float:
    """Standard normal CDF."""
    return 0.5 * (1.0 + math.erf(x / math.sqrt(2.0)))


def _cholesky_const_rho(d: int, rho: float) -> list[list[float]]:
    """Cholesky factor of the d×d matrix with unit diagonal and constant
    off-diagonal rho (clamped to keep it positive definite)."""
    rho = max(-0.99, min(0.99, rho))
    m = [[1.0 if i == j else rho for j in range(d)] for i in range(d)]
    L = [[0.0] * d for _ in range(d)]
    for i in range(d):
        for j in range(i + 1):
            s = sum(L[i][k] * L[j][k] for k in range(j))
            if i == j:
                v = m[i][i] - s
                L[i][j] = math.sqrt(v if v > 0 else 1e-9)
            else:
                L[i][j] = 0.0 if L[j][j] == 0 else (m[i][j] - s) / L[j][j]
    return L


def sample_copula(
    dists: Sequence[UniDist],
    target_sel: float,
    rho: float = 0.4,
    rng=None,
) -> list[tuple[float, float]]:
    if rng is None:
        raise ValueError("a seeded random generator is required")
    d = len(dists)
    if d == 0:
        return []
    L = _cholesky_const_rho(d, rho)
    z = [rng.gauss(0.0, 1.0) for _ in range(d)]
    uniforms = [
        _phi(sum(L[i][k] * z[k] for k in range(d))) for i in range(d)
    ]
    marginal = max(1e-6, min(1.0, target_sel) ** (1.0 / d))
    half = min(0.5, marginal / 2.0)
    out: list[tuple[float, float]] = []
    for dist, u in zip(dists, uniforms):
        lo = dist.inv_cdf(max(0.0, u - half))
        hi = dist.inv_cdf(min(1.0, u + half))
        out.append((hi, lo) if lo > hi else (lo, hi))
    return out
