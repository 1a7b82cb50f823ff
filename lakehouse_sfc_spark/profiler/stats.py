"""ColumnStats container, UniDist inverse-CDF, and YAML round-trip.

Serialization shape mirrors the reference so downstream tooling (workload
generator, advisor) is interchangeable:
- ``ColumnStats.to_dict`` -> wlg/profiler/stats.py:28-46
- ``save_yaml``/``load_yaml`` payload {"columns": {...}, "metadata": {...}}
  -> wlg/profiler/dist_store.py:63-90
- ``UniDist.inv_cdf`` histogram inverse CDF -> dist_store.py:15-47
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import numpy as np
import yaml


@dataclass
class ColumnStats:
    count: int
    nulls: int
    kind: str  # numeric | datetime | boolean | categorical
    min: float | str | None
    max: float | str | None
    quantiles: dict[float, float]
    hist: tuple[list[int], list[float]] | None
    cardinality: int | None
    topk: list[tuple[str, int]]

    def to_dict(self) -> dict[str, object]:
        return {
            "count": int(self.count),
            "nulls": int(self.nulls),
            "kind": self.kind,
            "min": self.min,
            "max": self.max,
            "quantiles": {float(k): float(v) for k, v in self.quantiles.items()},
            "hist": (
                [int(c) for c in self.hist[0]],
                [float(e) for e in self.hist[1]],
            )
            if self.hist is not None
            else None,
            "cardinality": None if self.cardinality is None else int(self.cardinality),
            "topk": [(str(v), int(c)) for v, c in self.topk],
        }

    @classmethod
    def from_dict(cls, payload: dict[str, object]) -> ColumnStats:
        hist = payload.get("hist")
        hist_t = None
        if hist is not None:
            counts, edges = hist
            hist_t = ([int(x) for x in counts], [float(x) for x in edges])
        return cls(
            count=int(payload.get("count", 0)),
            nulls=int(payload.get("nulls", 0)),
            kind=str(payload.get("kind", "unknown")),
            min=payload.get("min"),
            max=payload.get("max"),
            quantiles={
                float(k): float(v)
                for k, v in (payload.get("quantiles") or {}).items()
            },
            hist=hist_t,
            cardinality=(
                None
                if payload.get("cardinality") is None
                else int(payload["cardinality"])
            ),
            topk=[(str(v), int(c)) for v, c in (payload.get("topk") or [])],
        )


class UniDist:
    """Histogram-backed inverse CDF (uniform interpolation inside each bin)."""

    def __init__(self, counts, edges) -> None:
        self.counts = np.asarray(list(counts), dtype=float)
        self.edges = np.asarray(list(edges), dtype=float)
        if len(self.edges) != len(self.counts) + 1:
            raise ValueError("Histogram edges must have length counts + 1")
        self.total = self.counts.sum()
        if self.total <= 0:
            self.cdf = np.zeros_like(self.counts, dtype=float)
        else:
            self.cdf = np.cumsum(self.counts) / self.total

    def inv_cdf(self, p: float) -> float:
        if not 0.0 <= p <= 1.0:
            raise ValueError("p must be within [0, 1]")
        if self.total <= 0:
            return float(self.edges[0])
        if p == 1.0:
            return float(self.edges[-1])
        idx = int(np.searchsorted(self.cdf, p, side="left"))
        idx = min(idx, len(self.counts) - 1)
        cdf_prev = 0.0 if idx == 0 else float(self.cdf[idx - 1])
        bin_prob = float(self.counts[idx] / self.total)
        if bin_prob <= 0.0:
            return float(self.edges[idx])
        fraction = (p - cdf_prev) / bin_prob
        lower = float(self.edges[idx])
        upper = float(self.edges[idx + 1])
        return lower + fraction * (upper - lower)


def build_uni_dists(stats: dict[str, ColumnStats]) -> dict[str, UniDist]:
    out: dict[str, UniDist] = {}
    for name, col in stats.items():
        if col.hist is None:
            continue
        counts, edges = col.hist
        if counts and edges:
            out[name] = UniDist(counts, edges)
    return out


def save_yaml(
    stats: dict[str, ColumnStats],
    path: str | Path,
    metadata: dict[str, object] | None = None,
) -> None:
    payload: dict[str, object] = {
        "columns": {name: s.to_dict() for name, s in stats.items()}
    }
    if metadata:
        payload["metadata"] = dict(metadata)
    with Path(path).open("w", encoding="utf-8") as fh:
        yaml.safe_dump(payload, fh, sort_keys=True)


def load_yaml(path: str | Path) -> tuple[dict[str, ColumnStats], dict[str, object]]:
    with Path(path).open("r", encoding="utf-8") as fh:
        payload = yaml.safe_load(fh) or {}
    stats = {
        name: ColumnStats.from_dict(d)
        for name, d in (payload.get("columns") or {}).items()
    }
    return stats, (payload.get("metadata") or {})
