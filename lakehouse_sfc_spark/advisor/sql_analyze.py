"""SQL workload analysis: depth-aware WHERE/ON clause extraction, boolean
flattening with OR tracking, predicate classification, alias resolution.

Behavioral contract mirrors notebooks/sql_layout_toolkit.py:101-530 —
clause spans stop at the next top-level clause keyword, OR branches are
flagged (scored at half weight downstream), predicates classify as
eq/in/range/like/null/other, a predicate whose both sides are column
references counts as a join, and TPC-H column prefixes (l_/o_/c_/...)
resolve tables when no alias information is available.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_TPCH_PREFIX = {
    "c": "customer",
    "o": "orders",
    "l": "lineitem",
    "s": "supplier",
    "n": "nation",
    "r": "region",
    "p": "part",
    "ps": "partsupp",
}

_KEYWORDS = {
    "select", "from", "where", "group", "order", "having", "limit", "join",
    "inner", "left", "right", "full", "outer", "cross", "on", "and", "or",
    "not", "as", "by", "union", "all", "distinct", "between", "in", "like",
    "is", "null", "exists", "case", "when", "then", "else", "end",
}

_COLUMN_RE = re.compile(r"\b([a-z_][a-z0-9_]*\.)?([a-z_][a-z0-9_]*)\b", re.I)
_IDENT_RE = re.compile(r"^[a-z_][a-z0-9_]*$", re.I)

_CLAUSE_STOPS = {
    "where": ("group by", "order by", "having", "limit", "union", "qualify",
              "window"),
    "on": ("join", "inner", "left", "right", "full", "cross", "where",
           "group by", "order by", "having", "limit", "union"),
    "from": ("where", "group by", "order by", "having", "limit", "union",
             "qualify", "window"),
}


@dataclass(frozen=True)
class PredicateEvent:
    query: str
    table: str
    column: str
    ptype: str  # eq | in | range | like | null | other
    in_or: bool
    is_join: bool


def strip_comments(sql: str) -> str:
    sql = re.sub(r"--[^\n]*", " ", sql)
    sql = re.sub(r"/\*.*?\*/", " ", sql, flags=re.S)
    return sql


def _skip_string(sql: str, i: int) -> int:
    quote = sql[i]
    i += 1
    while i < len(sql):
        if sql[i] == quote:
            if quote == "'" and i + 1 < len(sql) and sql[i + 1] == "'":
                i += 2
                continue
            return i + 1
        i += 1
    return i


def _phrase_at(sql: str, i: int, phrase: str) -> bool:
    words = phrase.split()
    pos = i
    for w in words:
        while pos < len(sql) and sql[pos].isspace():
            pos += 1
        if sql[pos : pos + len(w)].lower() != w:
            return False
        end = pos + len(w)
        if end < len(sql) and (sql[end].isalnum() or sql[end] == "_"):
            return False
        if pos > 0 and (sql[pos - 1].isalnum() or sql[pos - 1] == "_"):
            return False
        pos = end
    return True


def clause_spans(sql: str, keyword: str) -> list[str]:
    """Bodies of every top-level ``keyword`` clause (depth-aware scan)."""
    stops = _CLAUSE_STOPS.get(keyword, ("group by", "order by", "limit"))
    out = []
    i, depth = 0, 0
    lowered = sql.lower()
    n = len(sql)
    while i < n:
        ch = sql[i]
        if ch in "'\"":
            i = _skip_string(sql, i)
            continue
        if ch == "(":
            depth += 1
            i += 1
            continue
        if ch == ")":
            depth = max(0, depth - 1)
            i += 1
            continue
        if not ch.isspace() and _phrase_at(lowered, i, keyword):
            start = i + len(keyword)
            while start < n and sql[start].isspace():
                start += 1
            k, inner = start, depth
            while k < n:
                c2 = sql[k]
                if c2 in "'\"":
                    k = _skip_string(sql, k)
                    continue
                if c2 == "(":
                    inner += 1
                    k += 1
                    continue
                if c2 == ")":
                    if inner == depth:
                        break
                    inner -= 1
                    k += 1
                    continue
                if inner == depth and (
                    c2 == ";" or any(_phrase_at(lowered, k, s) for s in stops)
                ):
                    break
                k += 1
            out.append(sql[start:k].strip())
            i = k
            continue
        i += 1
    return out


def flatten_bool(expr: str, in_or: bool = False) -> list[tuple[str, bool]]:
    """Split a boolean expression into leaf predicates, tagging every leaf
    that lives under an OR (scored at half weight)."""
    expr = _strip_outer_parens(expr)
    if not expr:
        return []
    ors = _split_top_bool(expr, "or")
    if len(ors) > 1:
        out = []
        for p in ors:
            out.extend(flatten_bool(p, in_or=True))
        return out
    ands = _split_top_bool(expr, "and")
    if len(ands) > 1:
        out = []
        for p in ands:
            out.extend(flatten_bool(p, in_or=in_or))
        return out
    return [(expr.strip(), in_or)]


def _strip_outer_parens(expr: str) -> str:
    expr = expr.strip()
    while expr.startswith("(") and expr.endswith(")"):
        depth = 0
        for idx, ch in enumerate(expr):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0 and idx != len(expr) - 1:
                    return expr
        expr = expr[1:-1].strip()
    return expr


def _split_top_bool(expr: str, op: str) -> list[str]:
    parts, buf, i, depth = [], [], 0, 0
    lowered = expr.lower()
    n = len(expr)
    # BETWEEN lo AND hi: the AND is part of the ternary operator, not a
    # boolean conjunction — without this, `x BETWEEN DATE 'a' AND DATE 'b'`
    # splits into a half-predicate and a spurious `DATE 'b'` leaf that
    # scores a phantom column named `date`
    pending_between = False
    while i < n:
        ch = expr[i]
        if ch in "'\"":
            j = _skip_string(expr, i)
            buf.append(expr[i:j])
            i = j
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if depth == 0 and not ch.isspace():
            if _phrase_at(lowered, i, "between"):
                pending_between = True
            elif _phrase_at(lowered, i, op):
                if op == "and" and pending_between:
                    pending_between = False  # the BETWEEN's own AND
                else:
                    parts.append("".join(buf))
                    buf = []
                    i += len(op)
                    continue
        buf.append(ch)
        i += 1
    parts.append("".join(buf))
    return [p.strip() for p in parts if p.strip()]


def classify_predicate(pred: str) -> str:
    p = pred.strip().lower()
    if re.search(r"\bis\s+(not\s+)?null\b", p):
        return "null"
    if re.search(r"\blike\b", p):
        return "like"
    if re.search(r"\bbetween\b", p):
        return "range"
    if re.search(r"\bin\s*\(", p):
        return "in"
    if re.search(r"(<=|>=|<>|!=|<|>)", p):
        return "range"
    if re.search(r"(?<![<>=!])=(?!=)", p):
        return "eq"
    return "other"


def _comparison_sides(pred: str) -> tuple[str | None, str | None]:
    p = pred.strip()
    if re.search(r"(?is)\b(between|in\s*\(|is\s+(not\s+)?null)\b", p):
        return None, None
    for op in ("<=", ">=", "<>", "!=", "=", "<", ">"):
        if op in p:
            left, right = p.split(op, 1)
            return left.strip(), right.strip()
    return None, None


def _is_column_expr(expr: str, alias_map: dict[str, str]) -> bool:
    expr = expr.strip().rstrip(")").lstrip("(").strip()
    m = re.match(r"^([a-z_][a-z0-9_]*)\.([a-z_][a-z0-9_]*)$", expr, re.I)
    if m:
        return True
    if _IDENT_RE.match(expr) and expr.lower() not in _KEYWORDS:
        return _resolve_table(expr, alias_map) is not None
    return False


def alias_map_of(sql: str) -> dict[str, str]:
    """alias -> table for FROM/JOIN clauses, incl. comma joins."""
    out: dict[str, str] = {}
    for body in clause_spans(sql, "from"):
        for part in _split_top_commas(body):
            # keep only the head table ref — JOIN chains are handled below
            part = re.split(
                r"(?is)\b(?:natural\s+)?(?:inner|left|right|full|cross)?"
                r"\s*(?:outer\s+)?join\b",
                part,
            )[0]
            toks = part.split()
            if not toks or toks[0].startswith("("):
                continue
            table = toks[0].split(".")[-1].lower()
            if table in _KEYWORDS or not _IDENT_RE.match(table):
                continue
            out[table] = table
            alias = None
            if len(toks) >= 3 and toks[1].lower() == "as":
                alias = toks[2].lower()
            elif len(toks) >= 2:
                alias = toks[1].lower()
            if alias and alias not in _KEYWORDS and _IDENT_RE.match(alias):
                out[alias] = table
    for m in re.finditer(
        r"(?is)\bjoin\s+([a-z_][a-z0-9_.]*)(?:\s+(?:as\s+)?([a-z_][a-z0-9_]*))?",
        sql,
    ):
        table = m.group(1).split(".")[-1].lower()
        if table in _KEYWORDS:
            continue
        out[table] = table
        alias = (m.group(2) or "").lower()
        if alias and alias not in _KEYWORDS:
            out[alias] = table
    return out


def _split_top_commas(expr: str) -> list[str]:
    parts, buf, depth = [], [], 0
    for ch in expr:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf))
    return [p.strip() for p in parts if p.strip()]


def _resolve_table(column: str, alias_map: dict[str, str]) -> str | None:
    """qualified 'a.col' via alias map; bare TPC-H columns via prefix."""
    if "." in column:
        qual, _ = column.rsplit(".", 1)
        return alias_map.get(qual.lower(), qual.lower())
    m = re.match(r"^(ps|[a-z])_", column.lower())
    if m:
        return _TPCH_PREFIX.get(m.group(1))
    if len(alias_map) == 1:
        return next(iter(alias_map.values()))
    return None


def _leading_column(pred: str) -> str | None:
    for m in _COLUMN_RE.finditer(pred):
        qual, name = m.group(1), m.group(2)
        token = (qual or "") + name
        if name.lower() in _KEYWORDS:
            continue
        if not qual and not re.match(r"^(ps|[a-z])_", name.lower()):
            # bare non-TPC-H-style name: accept only if it's clearly a column
            # (heuristic: has a following comparison context) — keep it.
            pass
        return token
    return None


def analyze_sql(sql: str, query_id: str = "q") -> list[PredicateEvent]:
    sql = strip_comments(sql)
    amap = alias_map_of(sql)
    events: list[PredicateEvent] = []
    for keyword in ("where", "on"):
        for body in clause_spans(sql, keyword):
            for pred, in_or in flatten_bool(body):
                col_token = _leading_column(pred)
                if not col_token:
                    continue
                left, right = _comparison_sides(pred)
                is_join = bool(
                    left
                    and right
                    and _is_column_expr(left, amap)
                    and _is_column_expr(right, amap)
                )
                column = col_token.rsplit(".", 1)[-1].lower()
                table = _resolve_table(col_token, amap) or "?"
                events.append(
                    PredicateEvent(
                        query=query_id,
                        table=table,
                        column=column,
                        ptype=classify_predicate(pred),
                        in_or=in_or,
                        is_join=is_join,
                    )
                )
    return events


def analyze_workload(queries: dict[str, str]) -> list[PredicateEvent]:
    """{query_id: sql} -> all predicate events."""
    out: list[PredicateEvent] = []
    for qid, sql in queries.items():
        out.extend(analyze_sql(sql, qid))
    return out
