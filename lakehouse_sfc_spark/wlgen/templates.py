"""SQL template renderers A-D (reference semantics: wlg/templates/sql.py):
A = multi-dim BETWEEN box, B = 1-dim BETWEEN, C = equality on a
high-cardinality column, D = fact-dim equi join with dim filters."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class TemplateSpec:
    name: str
    sql: str
    params: dict


class Templates:
    def __init__(self, table: str):
        self.table = table

    def box(self, columns, ranges) -> TemplateSpec:
        """Template A: conjunctive multi-dimensional BETWEEN."""
        preds, params = [], {}
        for col, (lo, hi) in zip(columns, ranges):
            params[f"{col}_lo"], params[f"{col}_hi"] = lo, hi
            preds.append(f"{col} BETWEEN :{col}_lo AND :{col}_hi")
        return TemplateSpec(
            "A",
            f"SELECT * FROM {self.table} WHERE " + " AND ".join(preds),
            params,
        )

    def between(self, column, bounds) -> TemplateSpec:
        """Template B: single-column BETWEEN."""
        lo, hi = bounds
        return TemplateSpec(
            "B",
            f"SELECT * FROM {self.table} "
            f"WHERE {column} BETWEEN :{column}_lo AND :{column}_hi",
            {f"{column}_lo": lo, f"{column}_hi": hi},
        )

    def equality(self, column, value) -> TemplateSpec:
        """Template C: point predicate."""
        return TemplateSpec(
            "C",
            f"SELECT * FROM {self.table} WHERE {column} = :{column}",
            {column: value},
        )

    def fact_dim_join(
        self, fact_key, dim_table, dim_key, filters=None
    ) -> TemplateSpec:
        """Template D: fact⋈dim with BETWEEN filters on the dim side."""
        params, preds = {}, []
        for col, (lo, hi) in (filters or {}).items():
            params[f"{col}_lo"], params[f"{col}_hi"] = lo, hi
            preds.append(f"{dim_table}.{col} BETWEEN :{col}_lo AND :{col}_hi")
        where = f" WHERE {' AND '.join(preds)}" if preds else ""
        return TemplateSpec(
            "D",
            f"SELECT {self.table}.* FROM {self.table} JOIN {dim_table}"
            f" ON {self.table}.{fact_key} = {dim_table}.{dim_key}{where}",
            params,
        )
