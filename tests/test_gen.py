"""G8 gen-workload + G9 spec-matrix tests."""

from __future__ import annotations

from lakehouse_sfc_spark.profiler.stats import ColumnStats
from lakehouse_sfc_spark.wlgen.gen import (
    RQ1_BANDS,
    RQ4_VARIANTS,
    gen_workload,
    rq1_specs,
    rq2_specs,
    rq4_apply_variant,
)


def _num_stats(lo=0.0, hi=100.0):
    return ColumnStats(
        count=1000,
        nulls=0,
        kind="numeric",
        min=lo,
        max=hi,
        quantiles={0.25: 25.0, 0.5: 50.0, 0.75: 75.0},
        hist=([250, 250, 250, 250], [lo, 25.0, 50.0, 75.0, hi]),
        cardinality=100,
        topk=[],
    )


def _cat_stats():
    return ColumnStats(
        count=1000,
        nulls=0,
        kind="categorical",
        min=None,
        max=None,
        quantiles={},
        hist=None,
        cardinality=3,
        topk=[("a", 600), ("b", 300), ("c", 100)],
    )


def test_gen_workload_deterministic_and_shaped():
    stats = {
        "x": _num_stats(),
        "y": _num_stats(10.0, 20.0),
        "cat": _cat_stats(),
    }
    w1 = gen_workload(stats, "t", ["x", "y"], "cat", n=4, seed=7)
    w2 = gen_workload(stats, "t", ["x", "y"], "cat", n=4, seed=7)
    assert w1 == w2  # seeded determinism
    tpls = {row["tpl"] for row in w1}
    assert tpls == {"A", "B", "C"}
    for row in w1:
        assert ":" in row["sql"] and row["params"]
        if row["tpl"] == "B":
            assert row["params"]["x_lo"] <= row["params"]["x_hi"]
        if row["tpl"] == "C":
            assert row["params"]["cat"] in {"a", "b", "c"}


def test_gen_workload_quantile_fallback():
    s = _num_stats()
    s.hist = None  # force the quantile-fallback dist
    w = gen_workload({"x": s}, "t", ["x"], None, n=2, templates=("B",))
    assert len(w) == 2
    for row in w:
        assert 25.0 <= row["params"]["x_lo"] <= 75.0


def test_rq1_specs_matrix():
    specs = rq1_specs()
    assert len(specs) == len(RQ1_BANDS) * 8
    s1 = [s for s in specs if s["band"] == "S1"][0]
    assert s1["selectivity"] == (0.0, 0.001)
    assert s1["n_range"] == 10 and s1["n_point"] == 25


def test_rq2_specs_dims():
    specs = rq2_specs()
    assert [s["n_dims"] for s in specs] == [3, 4, 5]
    assert len(set(tuple(s["columns"]) for s in specs)) == 3


def test_rq4_variants_compose():
    base = "SELECT * FROM lineitem WHERE l_quantity < 10"
    plain = rq4_apply_variant(base, RQ4_VARIANTS[0])
    assert plain == base
    full = rq4_apply_variant(base, RQ4_VARIANTS[3])
    assert "GROUP BY l_returnflag" in full
    assert full.endswith("LIMIT 1000")
    assert "ORDER BY cnt" in full
