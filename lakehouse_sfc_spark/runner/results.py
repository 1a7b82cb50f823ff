"""Results analysis: collection, averaging, geometric-mean speedups, and
workload/result visualization data.

Reference parity:
- L8 results collection   -> scripts/parse_tpch_results.py:152-770
- A13 repeat averaging    -> lakehouse_op/run_queries copy.py:1219-1252
- A14 geomean speedup     -> wlg/cli/main.py:1080-1105
- G11 viz-results         -> wlg/cli/main.py:977-1189
- G10 workload coverage   -> wlg/cli/main.py:668-974

All analysis is driver-side pandas (metric tables are tiny — one row per
query×engine×layout).  Plotting is optional: every viz function always writes
its underlying aggregate as CSV, and renders a PNG only when matplotlib is
importable (it is not baked into every runtime).
"""

from __future__ import annotations

import math
import os
from collections.abc import Iterable

import pandas as pd


def collect_results(paths: Iterable[str | os.PathLike]) -> pd.DataFrame:
    """Concatenate per-run metric CSVs (written by
    ``runner.write_results_csv``) into one frame, deriving ``engine`` /
    ``layout`` / ``spec`` columns from the directory layout
    ``<root>/<engine>/<layout>/<spec>.csv`` when present
    (parse_tpch_results.py:152-239 infers the same from its results tree)."""
    frames = []
    for p in paths:
        p = os.fspath(p)
        df = pd.read_csv(p)
        parts = os.path.normpath(p).split(os.sep)
        df["spec"] = os.path.splitext(parts[-1])[0]
        df["layout"] = parts[-2] if len(parts) >= 2 else "unknown"
        df["engine"] = parts[-3] if len(parts) >= 3 else "spark"
        frames.append(df)
    if not frames:
        return pd.DataFrame()
    return pd.concat(frames, ignore_index=True)


def average_repeats(
    df: pd.DataFrame,
    group_cols: tuple[str, ...] = ("engine", "layout", "spec", "query"),
    metric_cols: tuple[str, ...] | None = None,
) -> pd.DataFrame:
    """Mean of each numeric metric over repeated runs of the same query
    (run_queries copy.py:1219-1252: per-query mean over --repeat N)."""
    keys = [c for c in group_cols if c in df.columns]
    if metric_cols is None:
        metrics = [
            c
            for c in df.columns
            if c not in keys and pd.api.types.is_numeric_dtype(df[c])
        ]
    else:
        metrics = [c for c in metric_cols if c in df.columns]
    out = df.groupby(keys, as_index=False)[metrics].mean()
    out["n_runs"] = df.groupby(keys).size().to_numpy()
    return out


def geomean_speedup(
    df: pd.DataFrame,
    baseline_layout: str = "baseline",
    metric: str = "elapsedTime_s",
) -> pd.DataFrame:
    """Per (engine, layout): exp(mean(log(baseline_time / layout_time))) over
    the queries both ran (wlg/cli/main.py:1080-1105).  > 1 means the layout
    is faster than baseline.  ``spec`` joins the key when present so the
    same query name in two specs never cross-matches."""
    keys = ["engine", "query"] + (["spec"] if "spec" in df.columns else [])
    base = (
        df[df["layout"] == baseline_layout]
        .set_index(keys)[metric]
        .rename("base_metric")
    )
    rows = []
    for (engine, layout), grp in df.groupby(["engine", "layout"]):
        if layout == baseline_layout:
            continue
        joined = grp.set_index(keys)[[metric]].join(base, how="inner")
        joined = joined[(joined[metric] > 0) & (joined["base_metric"] > 0)]
        if joined.empty:
            continue
        logs = (joined["base_metric"] / joined[metric]).map(math.log)
        rows.append(
            {
                "engine": engine,
                "layout": layout,
                "geomean_speedup": math.exp(logs.mean()),
                "n_queries": len(joined),
            }
        )
    return pd.DataFrame(rows, columns=["engine", "layout", "geomean_speedup", "n_queries"])


def _maybe_pyplot():
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except Exception:
        return None


def viz_results(
    df: pd.DataFrame, out_dir: str, metric: str = "elapsedTime_s"
) -> dict[str, str]:
    """G11 'viz-results': geomean speedup table, per-query speedup matrix,
    and ECDF points (wlg/cli/main.py:977-1189).  CSVs always; PNGs when
    matplotlib exists."""
    os.makedirs(out_dir, exist_ok=True)
    written: dict[str, str] = {}

    speed = geomean_speedup(df, metric=metric)
    speed_path = os.path.join(out_dir, "geomean_speedup.csv")
    speed.to_csv(speed_path, index=False)
    written["geomean_speedup"] = speed_path

    pivot = df.pivot_table(
        index="query", columns="layout", values=metric, aggfunc="mean"
    )
    pivot_path = os.path.join(out_dir, f"per_query_{metric}.csv")
    pivot.to_csv(pivot_path)
    written["per_query"] = pivot_path

    ecdf = (
        df[["layout", metric]]
        .sort_values(metric)
        .assign(
            ecdf=lambda d: d.groupby("layout")[metric].rank(method="first")
            / d.groupby("layout")[metric].transform("size")
        )
    )
    ecdf_path = os.path.join(out_dir, f"ecdf_{metric}.csv")
    ecdf.to_csv(ecdf_path, index=False)
    written["ecdf"] = ecdf_path

    plt = _maybe_pyplot()
    if plt is not None:
        fig, ax = plt.subplots(figsize=(7, 4))
        for layout, grp in ecdf.groupby("layout"):
            ax.plot(grp[metric], grp["ecdf"], drawstyle="steps-post", label=layout)
        ax.set_xlabel(metric)
        ax.set_ylabel("ECDF")
        ax.legend()
        png = os.path.join(out_dir, f"ecdf_{metric}.png")
        fig.savefig(png, bbox_inches="tight")
        plt.close(fig)
        written["ecdf_png"] = png
    return written


def workload_coverage(
    workload: list[dict], stats: dict, column: str
) -> pd.DataFrame:
    """G10 'viz' substance: where each query's [lo, hi] range for ``column``
    sits relative to the column's histogram edges (wlg/cli/main.py:668-974
    overlays these on the histogram; the coverage table IS the data that
    plot renders).  ``workload`` rows are fill_spec outputs with ``params``;
    ``stats`` is the profiler's per-column payload with hist edges."""
    col_stats = stats.get(column, {})
    hist = col_stats.get("hist") or {}
    if isinstance(hist, (list, tuple)):
        # profiler stats.yaml shape: [counts, edges] (ColumnStats.to_dict)
        edges = list(hist[1]) if len(hist) > 1 else []
    else:
        edges = hist.get("edges") or []
    lo_d, hi_d = col_stats.get("min"), col_stats.get("max")
    span = None
    try:
        span = float(hi_d) - float(lo_d)
    except (TypeError, ValueError):
        pass
    rows = []
    for i, item in enumerate(workload):
        params = item.get("params", {})
        lo = params.get(f"{column}_lo", params.get("lo"))
        hi = params.get(f"{column}_hi", params.get("hi"))
        if lo is None or hi is None:
            continue
        width_ratio = None
        if span:
            try:
                width_ratio = (float(hi) - float(lo)) / span
            except (TypeError, ValueError):
                pass
        rows.append(
            {
                "query_idx": i,
                "column": column,
                "lo": lo,
                "hi": hi,
                "width_ratio": width_ratio,
                "n_hist_bins": max(len(edges) - 1, 0),
            }
        )
    return pd.DataFrame(
        rows,
        columns=["query_idx", "column", "lo", "hi", "width_ratio", "n_hist_bins"],
    )
