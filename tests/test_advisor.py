"""Advisor tests: predicate extraction from realistic TPC-H-style SQL,
scoring weights, co-occurrence, table ranking, column-set recommendation."""

from __future__ import annotations

from lakehouse_sfc_spark.advisor import (
    analyze_sql,
    analyze_workload,
    anchor_score,
    column_cooccurrence,
    rank_tables,
    recommend_column_sets,
    score_workload,
)
from lakehouse_sfc_spark.advisor.sql_analyze import (
    classify_predicate,
    clause_spans,
    flatten_bool,
)

Q_RANGE = """
-- shipped window
SELECT l_orderkey FROM lineitem
WHERE l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1996-06-30'
  AND l_quantity >= 10
GROUP BY l_orderkey ORDER BY l_orderkey LIMIT 10
"""

Q_JOIN = """
SELECT o.o_orderkey
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderdate = DATE '1995-03-15'
   OR l.l_returnflag = 'R'
"""

Q_COMMA_JOIN = """
SELECT * FROM customer c, orders o
WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING'
  AND o_totalprice IN (1, 2, 3)
"""


def test_clause_spans_stop_at_keywords():
    spans = clause_spans(Q_RANGE.lower(), "where")
    assert len(spans) == 1
    assert "between" in spans[0]
    assert "group by" not in spans[0]
    assert "limit" not in spans[0]


def test_flatten_bool_or_discount():
    leaves = flatten_bool("a = 1 AND (b = 2 OR c = 3)")
    assert ("a = 1", False) in leaves
    assert ("b = 2", True) in leaves and ("c = 3", True) in leaves


def test_classify():
    assert classify_predicate("x BETWEEN 1 AND 2") == "range"
    assert classify_predicate("x IN (1,2)") == "in"
    assert classify_predicate("x LIKE 'a%'") == "like"
    assert classify_predicate("x IS NOT NULL") == "null"
    assert classify_predicate("x >= 5") == "range"
    assert classify_predicate("x = 5") == "eq"


def test_analyze_range_query():
    evs = analyze_sql(Q_RANGE, "q_range")
    cols = {(e.table, e.column, e.ptype) for e in evs}
    assert ("lineitem", "l_shipdate", "range") in cols
    assert ("lineitem", "l_quantity", "range") in cols
    assert all(not e.is_join for e in evs)


def test_analyze_join_query():
    evs = analyze_sql(Q_JOIN, "q_join")
    joins = [e for e in evs if e.is_join]
    assert len(joins) == 1
    assert joins[0].column in ("l_orderkey", "o_orderkey")
    ors = [e for e in evs if e.in_or]
    assert {e.column for e in ors} == {"o_orderdate", "l_returnflag"}


def test_analyze_comma_join_alias_resolution():
    evs = analyze_sql(Q_COMMA_JOIN, "q_comma")
    by_col = {e.column: e for e in evs}
    assert by_col["c_custkey"].is_join
    assert by_col["c_mktsegment"].table == "customer"
    assert by_col["o_totalprice"].ptype == "in"
    assert by_col["o_totalprice"].table == "orders"


def test_scoring_weights_and_or_discount():
    evs = analyze_workload({"q1": Q_JOIN})
    scores = score_workload(evs)
    od = scores[("orders", "o_orderdate")]
    # eq=5, halved under OR -> 2.5 (orders has no role weight)
    assert od["score"] == 2.5
    rf = scores[("lineitem", "l_returnflag")]
    # eq=5 × 0.5 (OR) × 1.2 (lineitem role) = 3.0
    assert rf["score"] == 3.0


def test_cooccurrence_counts_distinct_queries():
    evs = analyze_workload({"a": Q_RANGE, "b": Q_RANGE})
    co = column_cooccurrence(evs)
    assert co[("lineitem", "l_quantity", "l_shipdate")] == 2


def test_anchor_score_multipliers():
    row = {"score": 10.0, "filters": 2, "joins": 0, "range": 1, "eq": 1, "in": 0}
    base = 10.0 + 1.0 + 0.4 + 0.2
    assert anchor_score(row) == base
    assert anchor_score(row, kind="datetime") == base * 1.15
    assert anchor_score(row, unique_ratio=1e-5) == base * 0.55
    assert anchor_score(row, unique_ratio=0.99) == base * 0.75


def test_rank_tables_and_recommend():
    workload = {
        "q1": Q_RANGE,
        "q2": Q_JOIN,
        "q3": Q_COMMA_JOIN,
        "q4": """SELECT COUNT(*) FROM lineitem
                 WHERE l_shipdate >= DATE '1997-01-01'
                   AND l_discount BETWEEN 0.05 AND 0.07""",
    }
    evs = analyze_workload(workload)
    scores = score_workload(evs)
    co = column_cooccurrence(evs)
    tables = rank_tables(scores, co)
    assert tables[0]["table"] == "lineitem"  # most predicate mass
    recs = recommend_column_sets(scores, co, evs, "lineitem")
    assert recs
    best = recs[0]
    assert "l_shipdate" in best["columns"]
    assert best["suggested_order"][0] == max(
        best["columns"],
        key=lambda c: anchor_score(scores[("lineitem", c)]),
    )
    assert all(
        recs[i]["combo_score"] >= recs[i + 1]["combo_score"]
        for i in range(len(recs) - 1)
    )
