"""advisorq registry entries: relational-twin vs Python-library parity.

The driver gate proves Spark == DuckDB on the scaled-integer scoring; these
tests close the triangle by proving the relational formulation == the actual
advisor library (recommend.py) the pytest surface has always verified.
"""

from __future__ import annotations

import duckdb
import pytest

from lakehouse_sfc_spark.advisor.recommend import (
    column_cooccurrence,
    rank_tables,
    recommend_column_sets,
    score_workload,
)
from lakehouse_sfc_spark.advisor.sql_analyze import analyze_workload
from lakehouse_sfc_spark.queries.advisorq import (
    _ADV_EV_ORACLE,
    _ADV_EVENTS_GOLDEN,
    _ADV_WORKLOAD,
    _COMBO_SQL,
    _RANK_SQL,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{SF_DIR}/lineitem.parquet'"
    )
    return c


def test_events_golden_matches_extractor():
    """The hard-coded oracle golden IS the extractor's current output —
    if the extractor changes behavior, this fails before the driver does."""
    evs = analyze_workload(_ADV_WORKLOAD)
    got = [
        f"('{e.query}','{e.table}','{e.column}','{e.ptype}',"
        f"{'true' if e.in_or else 'false'},"
        f"{'true' if e.is_join else 'false'})"
        for e in evs
    ]
    pinned = [
        ln.rstrip(",") for ln in _ADV_EVENTS_GOLDEN.strip().splitlines()
    ]
    assert got == pinned


def test_rank_sql_matches_library(con):
    sql_rows = con.execute(_RANK_SQL.format(EV=_ADV_EV_ORACLE)).fetchall()
    evs = analyze_workload(_ADV_WORKLOAD)
    lib = rank_tables(score_workload(evs), column_cooccurrence(evs))
    assert len(sql_rows) == len(lib)
    for sr, lr in zip(sql_rows, lib):
        assert sr[0] == lr["table"]
        assert sr[1] == pytest.approx(lr["layout_opportunity_score"])
        assert sr[2] == pytest.approx(lr["total_score"])
        assert sr[3] == lr["filter_events"]
        assert sr[4] == lr["join_events"]
        assert sr[5] == lr["candidate_columns"]
        assert sr[6] == lr["cooccur_count_sum"]
        assert sr[7] == lr["cooccur_count_max"]
        assert sr[8] == lr["eligible_for_multicol_layout"]


def test_combo_sql_matches_library(con):
    sql_rows = con.execute(
        _COMBO_SQL.format(EV=_ADV_EV_ORACLE, LI="lineitem")
    ).fetchall()
    evs = analyze_workload(_ADV_WORKLOAD)
    sc = score_workload(evs)
    co = column_cooccurrence(evs)
    cols = [
        "l_shipdate", "l_quantity", "l_discount", "l_extendedprice",
        "l_returnflag", "l_orderkey", "l_partkey",
    ]
    urs = {}
    for c in cols:
        nd, n = con.execute(
            f"SELECT COUNT(DISTINCT {c}), COUNT(*) FROM lineitem"
        ).fetchone()
        urs[c] = nd / n
    kinds = {c: "numeric" for c in cols}
    kinds["l_shipdate"] = "date"
    kinds["l_returnflag"] = "string"
    lib = recommend_column_sets(
        sc, co, evs, "lineitem", column_kinds=kinds, unique_ratios=urs
    )
    assert len(sql_rows) == len(lib) == 12
    for sr, lr in zip(sql_rows, lib):
        assert sr[0] == ",".join(lr["columns"])
        assert sr[1] == lr["k"]
        assert sr[2] == ",".join(lr["suggested_order"])
        assert sr[3] == pytest.approx(lr["combo_score"])
        assert sr[4] == pytest.approx(lr["singleton_score"])
        assert sr[5] == pytest.approx(lr["pair_bonus"])
        assert sr[6] == lr["query_coverage"]
