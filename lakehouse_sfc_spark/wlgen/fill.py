"""Spec filling: turn a workload spec (templates with ``:param``
placeholders + param defs + interval_rules) into concrete SQL, in three
sampling modes (random / grid / lhs).

Reference semantics mirrored (wlg/cli/main.py fill command):
- params covered by an interval rule are NOT sampled; the rule fills both
  ends of the window;
- interval rules pick a window width = ratio (or uniform in ratio_range) ×
  the column span, placed uniformly; int rules honor ``align_step``;
  date rules support ``align_with`` + ``lag_days`` + ``max_start_gap_days``
  / ``max_end_gap_days`` + ``clip_to_domain``; categorical rules take a
  contiguous slice of the sorted top-k values;
- domains resolve from the rule's explicit ``domain`` else stats.yaml
  min/max (datetime epoch-ms converted to ISO dates);
- constraints are boolean expressions over the param row;
- substitution replaces longest placeholder names first.

Deliberate fixes over the reference (SURVEY.md §7.4): random mode has an
attempt cap instead of looping forever on unsatisfiable constraints, and
constraints are evaluated through an AST whitelist, not bare ``eval``.
"""

from __future__ import annotations

import ast
import datetime as dt
import itertools
import math
import random
from pathlib import Path

import yaml

_FLOAT_TYPES = {"float", "number", "numeric"}
_CAT_TYPES = {"string", "categorical"}
_INT_SCHEMA = {"int", "integer", "bigint", "long", "int32", "int64"}

_MAX_RANDOM_ATTEMPTS_PER_QUERY = 1000


# --- safe constraint evaluation --------------------------------------------

_ALLOWED_NODES = (
    ast.Expression, ast.BoolOp, ast.And, ast.Or, ast.UnaryOp, ast.Not,
    ast.USub, ast.Compare, ast.Eq, ast.NotEq, ast.Lt, ast.LtE, ast.Gt,
    ast.GtE, ast.BinOp, ast.Add, ast.Sub, ast.Mult, ast.Div, ast.Mod,
    ast.Name, ast.Load, ast.Constant,
)


def _safe_eval(expr: str, env: dict) -> bool:
    """Evaluate a constraint with an AST whitelist: names, constants,
    comparisons, boolean ops, basic arithmetic — nothing else."""
    tree = ast.parse(expr, mode="eval")
    for node in ast.walk(tree):
        if not isinstance(node, _ALLOWED_NODES):
            raise ValueError(
                f"constraint {expr!r} uses disallowed syntax: "
                f"{type(node).__name__}"
            )
    try:
        return bool(eval(compile(tree, "<constraint>", "eval"), {"__builtins__": {}}, dict(env)))
    except Exception:
        return False


# --- value coercion helpers -------------------------------------------------


def _epochms_to_iso(x):
    if isinstance(x, (int, float)):
        return (
            dt.datetime(1970, 1, 1) + dt.timedelta(milliseconds=float(x))
        ).date().isoformat()
    return x


def _to_date(x) -> dt.date:
    if isinstance(x, dt.datetime):
        return x.date()
    if isinstance(x, dt.date):
        return x
    if isinstance(x, (int, float)):
        return dt.date.fromisoformat(str(_epochms_to_iso(x)))
    return dt.date.fromisoformat(str(x))


def _date_span_days(lo, hi) -> int:
    return (_to_date(hi) - _to_date(lo)).days


def _cast_value(ptype: str, v):
    if v is None:
        return None
    if ptype == "int":
        return int(v)
    if ptype in _FLOAT_TYPES:
        return float(v)
    if ptype == "date":
        return str(v)
    return v


class _Stats:
    """Thin view over a stats.yaml payload ({"columns": {...}} or flat)."""

    def __init__(self, payload: dict | None):
        payload = payload or {}
        self.cols = payload.get("columns", payload) or {}
        self.schema = (payload.get("metadata") or {}).get("schema", {}) or {}

    def minmax(self, col: str):
        meta = self.cols.get(col) or {}
        return meta.get("min"), meta.get("max")

    def topk_values(self, col: str) -> list:
        meta = self.cols.get(col) or {}
        vals = []
        for item in meta.get("topk") or []:
            vals.append(item[0] if isinstance(item, (list, tuple)) and item else item)
        return [v for v in vals if v is not None]

    def is_int_column(self, col: str) -> bool:
        dtype = str(self.schema.get(col, "")).lower()
        return dtype.split(":")[0] in _INT_SCHEMA or dtype.startswith("int")


def _param_column(name: str) -> str:
    """'l_suppkey_v1' -> 'l_suppkey' (reference param naming convention)."""
    return name.split("_v", 1)[0] if "_v" in name else name


# --- per-mode samplers ------------------------------------------------------


class _ParamSampler:
    def __init__(self, stats: _Stats, rng: random.Random):
        self.stats = stats
        self.rng = rng

    def _choices(self, pname: str, pdef: dict) -> list[str]:
        explicit = pdef.get("choices") or []
        if explicit:
            return [str(c) for c in explicit]
        return [str(v) for v in self.stats.topk_values(_param_column(pname))]

    def one(self, pname: str, pdef: dict):
        ptype = pdef["type"]
        lo, hi = pdef.get("range", [None, None])
        step = pdef.get("step")
        col = _param_column(pname)
        rng = self.rng
        if self.stats.is_int_column(col):
            topk = self.stats.topk_values(col)
            if topk:
                return int(rng.choice(topk))
        if ptype == "date":
            lo, hi = _epochms_to_iso(lo), _epochms_to_iso(hi)
            if lo is None or hi is None:
                raise ValueError(f"date param {pname!r} requires range [lo, hi]")
            days = max(0, _date_span_days(lo, hi))
            return (_to_date(lo) + dt.timedelta(days=rng.randint(0, days))).isoformat()
        if ptype == "int" or (ptype in _FLOAT_TYPES and self.stats.is_int_column(col)):
            if lo is None or hi is None:
                raise ValueError(f"int param {pname!r} requires range or interval rule")
            loi, hii = int(float(lo)), int(float(hi))
            if step:
                stepi = int(step)
                kmax = max(0, (hii - loi) // stepi)
                return loi + rng.randint(0, kmax) * stepi
            return rng.randint(loi, hii)
        if ptype in _FLOAT_TYPES:
            if lo is None or hi is None:
                raise ValueError(f"float param {pname!r} requires range or interval rule")
            lof, hif = float(lo), float(hi)
            if step:
                stepf = float(step)
                cnt = int(round((hif - lof) / stepf)) + 1
                return round(lof + rng.randint(0, max(0, cnt - 1)) * stepf, 12)
            return rng.uniform(lof, hif)
        if ptype in _CAT_TYPES:
            vals = self._choices(pname, pdef)
            if vals:
                return rng.choice(vals)
            if lo is not None:
                return lo
            raise ValueError(f"categorical param {pname!r} needs choices/topk/range")
        return lo

    def grid(self, pname: str, pdef: dict, m: int) -> list:
        ptype = pdef["type"]
        lo, hi = pdef.get("range", [None, None])
        step = pdef.get("step")
        col = _param_column(pname)
        if ptype == "date":
            lo, hi = _epochms_to_iso(lo), _epochms_to_iso(hi)
            if lo is None or hi is None:
                raise ValueError(f"date param {pname!r} needs range for grid")
            days = max(1, _date_span_days(lo, hi))
            idxs = [round(i * days / (m - 1)) for i in range(m)] if m > 1 else [0]
            base = _to_date(lo)
            return [(base + dt.timedelta(days=i)).isoformat() for i in idxs]
        if ptype == "int" or (ptype in _FLOAT_TYPES and self.stats.is_int_column(col)):
            if lo is None or hi is None:
                raise ValueError(f"{ptype} param {pname!r} needs range for grid")
            loi, hii = int(float(lo)), int(float(hi))
            if step:
                return list(range(loi, hii + 1, int(step)))[:m]
            if m == 1:
                return [(loi + hii) // 2]
            return [int(round(loi + i * (hii - loi) / (m - 1))) for i in range(m)]
        if ptype in _FLOAT_TYPES:
            if lo is None or hi is None:
                raise ValueError(f"float param {pname!r} needs range for grid")
            lof, hif = float(lo), float(hi)
            if step:
                stepf = float(step)
                cnt = int(round((hif - lof) / stepf)) + 1
                return [round(lof + i * stepf, 12) for i in range(min(cnt, m))]
            if m == 1:
                return [0.5 * (lof + hif)]
            return [lof + i * (hif - lof) / (m - 1) for i in range(m)]
        if ptype in _CAT_TYPES:
            vals = self._choices(pname, pdef)
            if not vals:
                raise ValueError(f"categorical param {pname!r} needs values for grid")
            return [vals[i % len(vals)] for i in range(m)]
        return [lo] * m

    def lhs(self, pname: str, pdef: dict, m: int) -> list:
        """Latin hypercube: one draw per stratum, then shuffled."""
        ptype = pdef["type"]
        lo, hi = pdef.get("range", [None, None])
        col = _param_column(pname)
        rng = self.rng
        if ptype == "date":
            lo, hi = _epochms_to_iso(lo), _epochms_to_iso(hi)
            if lo is None or hi is None:
                raise ValueError(f"date param {pname!r} needs range for lhs")
            days = max(1, _date_span_days(lo, hi))
            picks = [
                rng.randint(i * days // m, max(i * days // m, (i + 1) * days // m))
                for i in range(m)
            ]
            rng.shuffle(picks)
            base = _to_date(lo)
            return [(base + dt.timedelta(days=k)).isoformat() for k in picks]
        if ptype == "int" or ptype in _FLOAT_TYPES:
            if lo is None or hi is None:
                raise ValueError(f"{ptype} param {pname!r} needs range for lhs")
            lof, hif = float(lo), float(hi)
            pts = []
            for i in range(m):
                x = rng.uniform(
                    lof + i * (hif - lof) / m, lof + (i + 1) * (hif - lof) / m
                )
                as_int = ptype == "int" or self.stats.is_int_column(col)
                pts.append(int(round(x)) if as_int else x)
            rng.shuffle(pts)
            return pts
        if ptype in _CAT_TYPES:
            vals = self._choices(pname, pdef)
            if not vals:
                raise ValueError(f"categorical param {pname!r} needs values for lhs")
            return [rng.choice(vals) for _ in range(m)]
        return [lo] * m


# --- interval rules ---------------------------------------------------------


def _rule_domain(rule: dict, stats: _Stats):
    if "domain" in rule:
        lo, hi = rule["domain"]
    else:
        lo, hi = stats.minmax(rule.get("column"))
    if rule.get("type") == "date":
        lo, hi = _epochms_to_iso(lo), _epochms_to_iso(hi)
    return lo, hi


def _rule_width_ratio(rule: dict, rng: random.Random) -> float:
    if rule.get("ratio_range"):
        a, b = (float(x) for x in rule["ratio_range"])
        return rng.uniform(min(a, b), max(a, b))
    if rule.get("ratio") is not None:
        return float(rule["ratio"])
    raise ValueError("interval_rule requires 'ratio' or 'ratio_range'")


def _apply_categorical_rule(row, rule, stats: _Stats, rng, width_ratio):
    values = sorted({str(v) for v in stats.topk_values(rule.get("column"))})
    if not values:
        raise ValueError(
            f"missing top-k for categorical interval rule "
            f"(column={rule.get('column')})"
        )
    width = min(len(values), max(1, int(round(width_ratio * len(values)))))
    start = rng.randint(0, max(0, len(values) - width))
    row[rule["lo"]] = values[start]
    row[rule["hi"]] = values[start + width - 1]


def _apply_int_rule(row, rule, dom, rng, width_ratio):
    L, H = int(dom[0]), int(dom[1])
    width = max(1, int(round(width_ratio * (H - L))))
    step = int(rule.get("align_step", 1))
    width = max(step, (width // step) * step)
    start_max = max(L, H - width)
    lo = L if start_max <= L else rng.randrange(L, start_max + 1, step)
    lo = ((lo - L) // step) * step + L
    row[rule["lo"]] = lo
    row[rule["hi"]] = min(lo + width, H)


def _apply_float_rule(row, rule, dom, rng, width_ratio):
    L, H = float(dom[0]), float(dom[1])
    width = max(0.0, width_ratio * (H - L))
    start = rng.uniform(L, max(L, H - width))
    row[rule["lo"]] = start
    row[rule["hi"]] = start + width


def _apply_date_rule(row, rule, dom, rng, width_ratio):
    d0, d1 = _to_date(dom[0]), _to_date(dom[1])
    span = max(1, (d1 - d0).days)
    width = dt.timedelta(days=max(1, int(round(width_ratio * span))))

    align = rule.get("align_with")
    if align:
        base_lo = _to_date(row[align["lo"]])
        base_hi = _to_date(row[align["hi"]])
        lag_bounds = rule.get("lag_days", [0, 0])
        lag = rng.randint(int(min(lag_bounds)), int(max(lag_bounds)))
        lo = base_lo + dt.timedelta(days=lag)
        hi = lo + width
        if rule.get("max_start_gap_days") is not None:
            cap = base_lo + dt.timedelta(days=int(rule["max_start_gap_days"]))
            if lo > cap:
                lo, hi = cap, cap + width
        if rule.get("max_end_gap_days") is not None:
            cap = base_hi + dt.timedelta(days=int(rule["max_end_gap_days"]))
            if hi > cap:
                hi, lo = cap, cap - width
        if rule.get("clip_to_domain", False):
            if lo < d0:
                lo, hi = d0, d0 + width
            if hi > d1:
                hi, lo = d1, d1 - width
        if hi < lo:
            hi = lo
    else:
        latest_start = max(d0, d1 - width)
        lo = d0 + dt.timedelta(days=rng.randint(0, max(0, (latest_start - d0).days)))
        hi = lo + width
    row[rule["lo"]] = lo.isoformat()
    row[rule["hi"]] = hi.isoformat()


def _apply_interval_rules(row, rules, stats: _Stats, rng):
    for rule in rules or []:
        tp = rule["type"]
        width_ratio = _rule_width_ratio(rule, rng)
        if tp in _CAT_TYPES:
            _apply_categorical_rule(row, rule, stats, rng, width_ratio)
            continue
        dom = _rule_domain(rule, stats)
        if dom[0] is None or dom[1] is None:
            raise ValueError(
                f"missing domain for interval rule (column={rule.get('column')})"
            )
        if tp == "int":
            _apply_int_rule(row, rule, dom, rng, width_ratio)
        elif tp in _FLOAT_TYPES:
            _apply_float_rule(row, rule, dom, rng, width_ratio)
        elif tp == "date":
            _apply_date_rule(row, rule, dom, rng, width_ratio)
        else:
            raise ValueError(f"unsupported interval_rule type: {tp}")


# --- driver -----------------------------------------------------------------


def _constraints_ok(row: dict, param_defs: dict) -> bool:
    for pdef in (param_defs or {}).values():
        expr = pdef.get("constraint")
        if expr and not _safe_eval(expr, row):
            return False
    return True


def _format_literal(name: str, val, param_defs: dict) -> str:
    ptype = (param_defs.get(name) or {}).get("type")
    if ptype in _CAT_TYPES:
        return "'" + str(val).replace("'", "''") + "'"
    return str(val)


def _substitute(sql: str, row: dict, param_defs: dict) -> str:
    # longest names first so :col_v1 never clobbers the prefix of :col_v10
    for k, v in sorted(row.items(), key=lambda kv: -len(kv[0])):
        sql = sql.replace(f":{k}", _format_literal(k, v, param_defs))
    return sql


def render_sql(sql: str, params: dict) -> str:
    """Substitute ``:name`` placeholders with VALUE-TYPED literals: strings
    quote-escaped, floats via repr() (full double precision, parsed
    identically by Spark and DuckDB), everything else str().  The
    spec-driven path uses ``_substitute`` (param_defs decide quoting); this
    is the public form for callers that only hold sampled values
    (workload emit, fuzzing)."""

    def fmt(v) -> str:
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        if isinstance(v, float):
            return repr(v)
        return str(v)

    for k, v in sorted(params.items(), key=lambda kv: -len(kv[0])):
        sql = sql.replace(f":{k}", fmt(v))
    return sql


def fill_spec(
    spec: dict,
    stats_payload: dict | None = None,
    table: str | None = None,
) -> list[dict]:
    """Fill every template of ``spec``; returns
    [{"tpl": id, "sql": text, "params": row}, ...].

    ``table`` substitutes the ``{{tbl}}`` placeholder when given.
    """
    gen = spec.get("generation") or {}
    n = int(gen.get("n", 10))
    mode = str(gen.get("mode", "random")).lower()
    seed = gen.get("seed")
    rng = random.Random(0 if seed is None else seed)
    stats = _Stats(stats_payload)
    sampler = _ParamSampler(stats, rng)

    outputs: list[dict] = []
    for tpl in spec.get("templates") or []:
        sql = tpl["sql"]
        if table:
            sql = sql.replace("{{tbl}}", table)
        param_defs = tpl.get("params", {}) or {}
        names = list(param_defs)
        rules = tpl.get("interval_rules", []) or []
        covered = {r["lo"] for r in rules} | {r["hi"] for r in rules}
        free = [nm for nm in names if nm not in covered]

        rows: list[dict] = []
        if mode == "grid":
            k = max(1, math.ceil(n ** (1.0 / max(1, len(free)))))
            grids = [
                [None] * k if nm in covered else sampler.grid(nm, param_defs[nm], k)
                for nm in names
            ]
            for combo in itertools.product(*grids):
                row = {
                    nm: _cast_value(param_defs[nm]["type"], v)
                    for nm, v in zip(names, combo)
                }
                _apply_interval_rules(row, rules, stats, rng)
                if _constraints_ok(row, param_defs):
                    rows.append(row)
                if len(rows) >= n:
                    break
        elif mode == "lhs":
            sets = [
                [None] * n if nm in covered else sampler.lhs(nm, param_defs[nm], n)
                for nm in names
            ]
            for i in range(n):
                row = {
                    nm: _cast_value(param_defs[nm]["type"], sets[j][i])
                    for j, nm in enumerate(names)
                }
                _apply_interval_rules(row, rules, stats, rng)
                if _constraints_ok(row, param_defs):
                    rows.append(row)
        else:  # random, with an attempt cap (reference loops forever)
            attempts_left = n * _MAX_RANDOM_ATTEMPTS_PER_QUERY
            while len(rows) < n:
                if attempts_left <= 0:
                    raise RuntimeError(
                        f"template {tpl.get('id', 'T')!r}: constraints look "
                        f"unsatisfiable after {n * _MAX_RANDOM_ATTEMPTS_PER_QUERY}"
                        " attempts"
                    )
                attempts_left -= 1
                row = {
                    nm: None
                    if nm in covered
                    else _cast_value(
                        param_defs[nm]["type"], sampler.one(nm, param_defs[nm])
                    )
                    for nm in names
                }
                _apply_interval_rules(row, rules, stats, rng)
                if _constraints_ok(row, param_defs):
                    rows.append(row)

        for row in rows[:n]:
            outputs.append(
                {
                    "tpl": tpl.get("id", "T"),
                    "sql": _substitute(sql, row, param_defs),
                    "params": row,
                }
            )
    return outputs


def write_workload(outputs: list[dict], path: str | Path) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with Path(path).open("w", encoding="utf-8") as fh:
        yaml.safe_dump({"workload": outputs}, fh, sort_keys=False)


def write_sql_dir(outputs: list[dict], sql_dir: str | Path) -> list[Path]:
    d = Path(sql_dir)
    d.mkdir(parents=True, exist_ok=True)
    paths = []
    for i, entry in enumerate(outputs, 1):
        p = d / f"{i:03d}_{entry['tpl']}.sql"
        p.write_text(entry["sql"], encoding="utf-8")
        paths.append(p)
    return paths
