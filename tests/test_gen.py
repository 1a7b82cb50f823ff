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


def test_rq2_specs_matrix():
    """Band-specific selectivities x column-ORDER configs + point fan-outs
    (generate_tpch_rq2_specs.py:30-75)."""
    specs = rq2_specs()
    ranges = [s for s in specs if s.get("kind") != "point"]
    points = [s for s in specs if s.get("kind") == "point"]
    # 2 active bands x 13 column configs
    assert len(ranges) == 2 * 13
    assert {s["band"] for s in ranges} == {"S3", "S4"}
    s3 = [s for s in ranges if s["band"] == "S3"][0]
    s4 = [s for s in ranges if s["band"] == "S4"][0]
    assert s3["selectivity"] == (0.01, 0.1)
    assert s4["selectivity"] == (0.1, 0.2)
    # order permutations are distinct configs over the same column SET
    c1 = [tuple(s["columns"]) for s in ranges
          if s["column_config"].startswith("C1_") and s["band"] == "S3"]
    assert len(c1) == 6 and len(set(c1)) == 6
    assert len({frozenset(c) for c in c1}) == 1
    assert {s["n_dims"] for s in ranges} == {3, 4, 5}
    # point probes: 3 fan-outs x 5 columns
    assert len(points) == 3 * 5
    assert {s["fanout"] for s in points} == {1, 4, 16}


def test_rq2_point_materializes_in_list():
    from lakehouse_sfc_spark.wlgen.gen import materialize_rq2_spec

    desc = next(
        s for s in rq2_specs()
        if s.get("kind") == "point" and s["fanout"] == 4
        and s["columns"] == ["l_suppkey"]
    )
    (spec,) = materialize_rq2_spec(desc)
    tpl = spec["templates"][0]
    assert tpl["sql"].count(":l_suppkey_v") == 4
    assert "IN (" in tpl["sql"]
    # pairwise distinctness constraints on every value after the first
    assert tpl["params"]["l_suppkey_v2"]["constraint"] == (
        "l_suppkey_v2 != l_suppkey_v1"
    )
    assert len(tpl["interval_rules"]) == 4
    # range descriptors still go through the RQ1 path
    rdesc = next(s for s in rq2_specs() if s.get("kind") != "point")
    assert len(materialize_rq2_spec(rdesc)) == 2


def test_rq4_variants_compose():
    base = "SELECT * FROM lineitem WHERE l_quantity < 10"
    plain = rq4_apply_variant(base, RQ4_VARIANTS[0])
    assert plain == base
    full = rq4_apply_variant(base, RQ4_VARIANTS[3])
    assert "GROUP BY l_returnflag" in full
    assert full.endswith("LIMIT 1000")
    assert "ORDER BY cnt" in full
