"""Results-analysis tests: collection (L8), repeat averaging (A13), geomean
speedup (A14), viz data emitters (G10/G11), cache control (M7), eventlog
export (M10)."""

from __future__ import annotations

import math
import os

import pandas as pd
import pytest

from lakehouse_sfc_spark.runner.results import (
    average_repeats,
    collect_results,
    geomean_speedup,
    viz_results,
    workload_coverage,
)
from lakehouse_sfc_spark.runner.runner import cache_control, export_eventlogs
from lakehouse_sfc_spark.sources.loader import load_table

SF = "/root/testdata/sf0.001"


def _results_tree(tmp_path):
    rows_by_layout = {
        "baseline": [("q1", 1.0), ("q2", 2.0)],
        "zorder": [("q1", 0.5), ("q2", 0.5)],
    }
    paths = []
    for layout, rows in rows_by_layout.items():
        d = tmp_path / "spark" / layout
        d.mkdir(parents=True)
        p = d / "rq1.csv"
        pd.DataFrame(
            [{"query": q, "elapsedTime_s": t} for q, t in rows]
        ).to_csv(p, index=False)
        paths.append(str(p))
    return paths


def test_collect_results_derives_engine_layout_spec(tmp_path):
    df = collect_results(_results_tree(tmp_path))
    assert set(df["layout"]) == {"baseline", "zorder"}
    assert set(df["engine"]) == {"spark"}
    assert set(df["spec"]) == {"rq1"}
    assert len(df) == 4


def test_geomean_speedup(tmp_path):
    df = collect_results(_results_tree(tmp_path))
    speed = geomean_speedup(df)
    row = speed[speed["layout"] == "zorder"].iloc[0]
    # speedups: q1 1.0/0.5=2, q2 2.0/0.5=4 -> geomean sqrt(8)
    assert row["geomean_speedup"] == pytest.approx(math.sqrt(8.0))
    assert row["n_queries"] == 2


def test_average_repeats():
    df = pd.DataFrame(
        [
            {"engine": "spark", "layout": "b", "spec": "s", "query": "q1",
             "elapsedTime_s": 1.0},
            {"engine": "spark", "layout": "b", "spec": "s", "query": "q1",
             "elapsedTime_s": 3.0},
        ]
    )
    out = average_repeats(df)
    assert len(out) == 1
    assert out.iloc[0]["elapsedTime_s"] == pytest.approx(2.0)
    assert out.iloc[0]["n_runs"] == 2


def test_viz_results_writes_csvs(tmp_path):
    df = collect_results(_results_tree(tmp_path))
    written = viz_results(df, str(tmp_path / "viz"))
    for key in ("geomean_speedup", "per_query", "ecdf"):
        assert os.path.exists(written[key])
    speed = pd.read_csv(written["geomean_speedup"])
    assert "geomean_speedup" in speed.columns


def test_workload_coverage():
    workload = [
        {"params": {"l_quantity_lo": 10, "l_quantity_hi": 20}},
        {"params": {"other": 1}},
    ]
    stats = {
        "l_quantity": {
            "min": 0.0,
            "max": 50.0,
            "hist": {"edges": [0, 10, 20, 30, 40, 50]},
        }
    }
    cov = workload_coverage(workload, stats, "l_quantity")
    assert len(cov) == 1
    assert cov.iloc[0]["width_ratio"] == pytest.approx(0.2)
    assert cov.iloc[0]["n_hist_bins"] == 5


def test_cache_control_modes(spark):
    load_table(spark, SF, "orders").createOrReplaceTempView("orders_cc")
    cache_control(spark, "orders_cc", "cache_table")
    assert spark.catalog.isCached("orders_cc")
    cache_control(spark, None, "none")
    assert not spark.catalog.isCached("orders_cc")
    df = cache_control(spark, "orders_cc", "persist")
    assert df.storageLevel.useMemory
    df.unpersist()
    with pytest.raises(ValueError):
        cache_control(spark, "orders_cc", "bogus")


def test_export_eventlogs_without_logging(spark, tmp_path):
    # test session has no event logging: export is a clean no-op
    assert export_eventlogs(spark, str(tmp_path / "ev")) == []
