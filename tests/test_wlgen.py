"""Workload generator tests: seed determinism, mode semantics, interval
rules (incl. date alignment), constraints, samplers, and an end-to-end
profile → fill → execute loop on real testdata."""

from __future__ import annotations

import datetime as dt
import random

import pytest

from lakehouse_sfc_spark.profiler.stats import UniDist
from lakehouse_sfc_spark.wlgen import (
    Templates,
    fill_spec,
    sample_between,
    sample_copula,
    sample_eq_from_topk,
    write_sql_dir,
)
from lakehouse_sfc_spark.wlgen.fill import _safe_eval

STATS = {
    "columns": {
        "l_shipdate": {
            "min": "1992-01-02", "max": "1998-12-01", "kind": "datetime",
        },
        "l_quantity": {"min": 1.0, "max": 50.0, "kind": "numeric"},
        "category": {
            "kind": "categorical",
            "topk": [["books", 50], ["games", 40], ["music", 30], ["tools", 20]],
        },
    },
    "metadata": {"schema": {"l_quantity": "double"}},
}

SPEC = {
    "generation": {"n": 8, "mode": "random", "seed": 42},
    "templates": [
        {
            "id": "Q1",
            "sql": (
                "SELECT COUNT(*) FROM {{tbl}} "
                "WHERE l_shipdate BETWEEN DATE ':sd_lo' AND DATE ':sd_hi' "
                "AND l_quantity BETWEEN :q_lo AND :q_hi"
            ),
            "params": {
                "sd_lo": {"type": "date"},
                "sd_hi": {"type": "date", "constraint": "sd_hi >= sd_lo"},
                "q_lo": {"type": "float"},
                "q_hi": {"type": "float", "constraint": "q_hi >= q_lo"},
            },
            "interval_rules": [
                {"column": "l_shipdate", "lo": "sd_lo", "hi": "sd_hi",
                 "type": "date", "ratio_range": [0.05, 0.12]},
                {"column": "l_quantity", "lo": "q_lo", "hi": "q_hi",
                 "type": "float", "ratio": 0.2},
            ],
        }
    ],
}


def test_fill_deterministic_with_seed():
    a = fill_spec(SPEC, STATS, table="lineitem")
    b = fill_spec(SPEC, STATS, table="lineitem")
    assert a == b
    assert len(a) == 8
    assert all("{{tbl}}" not in e["sql"] and ":sd_lo" not in e["sql"] for e in a)


def test_interval_rule_widths_and_constraints():
    out = fill_spec(SPEC, STATS, table="t")
    span = (dt.date(1998, 12, 1) - dt.date(1992, 1, 2)).days
    for e in out:
        p = e["params"]
        w = (dt.date.fromisoformat(p["sd_hi"]) - dt.date.fromisoformat(p["sd_lo"])).days
        assert 0.04 * span <= w <= 0.13 * span
        assert p["q_hi"] - p["q_lo"] == pytest.approx(0.2 * 49.0, rel=1e-6)
        assert 1.0 <= p["q_lo"] <= p["q_hi"] <= 50.0


def test_date_align_with_caps():
    spec = {
        "generation": {"n": 20, "mode": "random", "seed": 7},
        "templates": [{
            "id": "AL",
            "sql": "SELECT 1 WHERE ':rd_lo' <= ':rd_hi' AND ':sd_lo' <= ':sd_hi'",
            "params": {
                "sd_lo": {"type": "date"}, "sd_hi": {"type": "date"},
                "rd_lo": {"type": "date"}, "rd_hi": {"type": "date"},
            },
            "interval_rules": [
                {"column": "l_shipdate", "lo": "sd_lo", "hi": "sd_hi",
                 "type": "date", "ratio": 0.1},
                {"column": "l_shipdate", "lo": "rd_lo", "hi": "rd_hi",
                 "type": "date", "ratio": 0.05,
                 "align_with": {"lo": "sd_lo", "hi": "sd_hi"},
                 "lag_days": [2, 30], "max_start_gap_days": 14,
                 "clip_to_domain": True},
            ],
        }],
    }
    out = fill_spec(spec, STATS)
    for e in out:
        p = e["params"]
        start_gap = (
            dt.date.fromisoformat(p["rd_lo"]) - dt.date.fromisoformat(p["sd_lo"])
        ).days
        assert start_gap <= 14
        assert dt.date.fromisoformat(p["rd_lo"]) >= dt.date(1992, 1, 2)
        assert dt.date.fromisoformat(p["rd_hi"]) <= dt.date(1998, 12, 1)


def test_categorical_interval_rule_contiguous_slice():
    spec = {
        "generation": {"n": 10, "mode": "random", "seed": 1},
        "templates": [{
            "id": "C",
            "sql": "SELECT * FROM t WHERE category BETWEEN ':c_lo' AND ':c_hi'",
            "params": {"c_lo": {"type": "string"}, "c_hi": {"type": "string"}},
            "interval_rules": [
                {"column": "category", "lo": "c_lo", "hi": "c_hi",
                 "type": "string", "ratio": 0.5},
            ],
        }],
    }
    values = sorted(["books", "games", "music", "tools"])
    for e in fill_spec(spec, STATS):
        lo, hi = e["params"]["c_lo"], e["params"]["c_hi"]
        i, j = values.index(lo), values.index(hi)
        assert j - i + 1 == 2  # 0.5 × 4 values -> contiguous slice of 2


def test_grid_and_lhs_modes():
    for mode in ("grid", "lhs"):
        spec = {
            "generation": {"n": 9, "mode": mode, "seed": 3},
            "templates": [{
                "id": "G",
                "sql": "SELECT :a, :b",
                "params": {
                    "a": {"type": "int", "range": [0, 100]},
                    "b": {"type": "float", "range": [0.0, 1.0]},
                },
            }],
        }
        out = fill_spec(spec, STATS)
        assert len(out) == 9
        for e in out:
            assert 0 <= e["params"]["a"] <= 100
            assert 0.0 <= e["params"]["b"] <= 1.0


def test_unsatisfiable_constraint_raises():
    spec = {
        "generation": {"n": 2, "mode": "random", "seed": 5},
        "templates": [{
            "id": "BAD",
            "sql": "SELECT :x",
            "params": {"x": {"type": "int", "range": [0, 10],
                             "constraint": "x > 100"}},
        }],
    }
    with pytest.raises(RuntimeError, match="unsatisfiable"):
        fill_spec(spec, STATS)


def test_safe_eval_rejects_calls():
    assert _safe_eval("a + 1 >= b", {"a": 1, "b": 2})
    with pytest.raises(ValueError, match="disallowed"):
        _safe_eval("__import__('os').system('x')", {})
    with pytest.raises(ValueError, match="disallowed"):
        _safe_eval("(lambda: 1)()", {})


def test_sample_between_targets_selectivity():
    rng = random.Random(42)
    counts = [100] * 10
    edges = [float(i) for i in range(11)]
    d = UniDist(counts, edges)
    widths = []
    for _ in range(200):
        lo, hi = sample_between(d, 0.2, rng)
        assert 0.0 <= lo <= hi <= 10.0
        widths.append(hi - lo)
    # uniform histogram: width ≈ selectivity × span
    assert sum(widths) / len(widths) == pytest.approx(2.0, rel=0.05)


def test_sample_eq_frequency_weighted():
    rng = random.Random(0)
    topk = [("hot", 90), ("cold", 10)]
    draws = [sample_eq_from_topk(topk, rng) for _ in range(500)]
    assert 0.8 < draws.count("hot") / 500 < 0.98


def test_sample_copula_shapes():
    rng = random.Random(9)
    d = UniDist([10] * 10, [float(i) for i in range(11)])
    boxes = sample_copula([d, d, d], target_sel=0.125, rng=rng)
    assert len(boxes) == 3
    for lo, hi in boxes:
        assert 0.0 <= lo <= hi <= 10.0


def test_templates_render():
    t = Templates("lineitem")
    a = t.box(["x", "y"], [(0, 1), (2, 3)])
    assert "x BETWEEN :x_lo AND :x_hi" in a.sql and "AND y BETWEEN" in a.sql
    c = t.equality("k", 7)
    assert c.sql.endswith("WHERE k = :k")
    d = t.fact_dim_join("o_orderkey", "orders", "o_orderkey",
                        {"o_totalprice": (1.0, 2.0)})
    assert "JOIN orders ON lineitem.o_orderkey = orders.o_orderkey" in d.sql


def test_end_to_end_profile_fill_run(spark, tmp_path):
    """profile lineitem → fill the Q1-style spec from real stats → run the
    generated SQL — the reference's G1→G2→runner loop on our engine."""
    from lakehouse_sfc_spark.profiler import profile_df, save_yaml, load_yaml
    from lakehouse_sfc_spark.sources.loader import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    stats, meta = profile_df(li.select("l_shipdate", "l_quantity"))
    path = tmp_path / "stats.yaml"
    save_yaml(stats, path, metadata={"schema": meta["schema"]})
    loaded, _ = load_yaml(path)
    payload = {
        "columns": {k: v.to_dict() for k, v in loaded.items()},
        "metadata": {"schema": meta["schema"]},
    }

    spec = {
        "generation": {"n": 3, "mode": "random", "seed": 42},
        "templates": [{
            "id": "E2E",
            "sql": (
                "SELECT COUNT(*) AS c FROM {{tbl}} "
                "WHERE l_quantity BETWEEN :q_lo AND :q_hi"
            ),
            "params": {
                "q_lo": {"type": "float"},
                "q_hi": {"type": "float", "constraint": "q_hi >= q_lo"},
            },
            "interval_rules": [
                {"column": "l_quantity", "lo": "q_lo", "hi": "q_hi",
                 "type": "float", "ratio_range": [0.1, 0.3]},
            ],
        }],
    }
    out = fill_spec(spec, payload, table="lineitem")
    paths = write_sql_dir(out, tmp_path / "sql")
    assert len(paths) == 3

    li.createOrReplaceTempView("lineitem")
    total = li.count()
    for e in out:
        c = spark.sql(e["sql"]).collect()[0][0]
        assert 0 <= c <= total
