"""Layout advisor: parse a SQL workload into predicate events, score
columns/tables, recommend multi-column layout keys (SURVEY.md §2.13 L1-L7)."""

from lakehouse_sfc_spark.advisor.sql_analyze import (
    PredicateEvent,
    analyze_sql,
    analyze_workload,
)
from lakehouse_sfc_spark.advisor.recommend import (
    anchor_score,
    column_cooccurrence,
    rank_tables,
    recommend_column_sets,
    score_workload,
)

__all__ = [
    "PredicateEvent",
    "analyze_sql",
    "analyze_workload",
    "score_workload",
    "column_cooccurrence",
    "anchor_score",
    "rank_tables",
    "recommend_column_sets",
]
