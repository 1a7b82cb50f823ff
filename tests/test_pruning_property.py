"""Property-based pruner correctness (hypothesis): file pruning must be
CONSERVATIVE — if any row in a file satisfies the predicate conjunction, the
file survives.  False negatives here would silently drop result rows, the
worst failure mode a skipping index can have; randomized row/predicate
generation covers the boundary cases (value == min, == max, empty overlap,
single-row files, all-null chunks) that fixed fixtures miss."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from lakehouse_sfc_spark.table.pruning import Pred, prune_files

_VALS = st.integers(min_value=-50, max_value=50)


def _sidecar(files: dict[str, list[tuple[int, int]]]) -> dict:
    out = {"columns": ["x", "y"], "files": {}}
    for name, rows in files.items():
        xs = [r[0] for r in rows]
        ys = [r[1] for r in rows]
        out["files"][f"file:///nonexistent/{name}.parquet"] = {
            "count": len(rows),
            "cols": {
                "x": {"min": min(xs), "max": max(xs), "nulls": 0},
                "y": {"min": min(ys), "max": max(ys), "nulls": 0},
            },
        }
    return out


@st.composite
def _pred(draw):
    col = draw(st.sampled_from(["x", "y"]))
    op = draw(st.sampled_from(["==", "<", "<=", ">", ">=", "between", "in"]))
    if op == "between":
        a, b = draw(_VALS), draw(_VALS)
        return Pred(col, op, (min(a, b), max(a, b)))
    if op == "in":
        vals = draw(st.lists(_VALS, min_size=1, max_size=5))
        return Pred(col, op, vals)
    return Pred(col, op, draw(_VALS))


def _row_matches(row: tuple[int, int], p: Pred) -> bool:
    v = row[0] if p.col == "x" else row[1]
    if p.op == "==":
        return v == p.value
    if p.op == "<":
        return v < p.value
    if p.op == "<=":
        return v <= p.value
    if p.op == ">":
        return v > p.value
    if p.op == ">=":
        return v >= p.value
    if p.op == "between":
        lo, hi = p.value
        return lo <= v <= hi
    if p.op == "in":
        return v in list(p.value)
    raise AssertionError(p.op)


@settings(max_examples=300, deadline=None)
@given(
    files=st.dictionaries(
        st.sampled_from([f"f{i}" for i in range(6)]),
        st.lists(st.tuples(_VALS, _VALS), min_size=1, max_size=20),
        min_size=1,
        max_size=6,
    ),
    preds=st.lists(_pred(), min_size=1, max_size=4),
)
def test_pruning_never_drops_matching_files(files, preds):
    sidecar = _sidecar(files)
    survivors, metrics = prune_files(sidecar, preds)
    survivor_names = {u.rsplit("/", 1)[-1].split(".")[0] for u in survivors}
    for name, rows in files.items():
        has_match = any(
            all(_row_matches(r, p) for p in preds) for r in rows
        )
        if has_match:
            assert name in survivor_names, (
                f"file {name} holds a matching row but was pruned: "
                f"{rows} vs {preds}"
            )
    assert metrics["files_scanned"] == len(survivors)
    assert metrics["files_total"] == len(files)


@settings(max_examples=100, deadline=None)
@given(preds=st.lists(_pred(), min_size=1, max_size=3))
def test_all_null_chunk_never_survives(preds):
    """Null-rejecting predicates must always prune an all-null file chunk."""
    sidecar = {
        "columns": ["x", "y"],
        "files": {
            "file:///nonexistent/nulls.parquet": {
                "count": 5,
                "cols": {
                    "x": {"min": None, "max": None, "nulls": 5},
                    "y": {"min": None, "max": None, "nulls": 5},
                },
            }
        },
    }
    survivors, _ = prune_files(sidecar, preds)
    assert survivors == []
