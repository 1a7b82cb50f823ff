"""Module-level constant redefinition guard.

Found the hard way (round 7): appending a new operator that redefined
``_KNN_K`` at module level silently changed ``ann_knn_join``'s Spark-side
top-k at CALL time while its oracle f-string had baked in the ORIGINAL
value at DEFINITION time — a rows-count mismatch only the full sweep
caught.  Oracle strings bind constants at import, function bodies at
call: a duplicate module-level assignment therefore desynchronizes the
two halves of an oracle pair.  This test statically forbids duplicate
top-level assignments in every query module."""

from __future__ import annotations

import ast
from pathlib import Path

import pytest

QUERY_DIR = Path(__file__).resolve().parent.parent / (
    "lakehouse_sfc_spark/queries"
)

#: names where rebinding is the point (accumulators, registries, aliases)
ALLOWED = {"__all__"}


@pytest.mark.parametrize(
    "path", sorted(QUERY_DIR.glob("*.py")), ids=lambda p: p.name
)
def test_no_duplicate_module_level_assignments(path):
    tree = ast.parse(path.read_text(encoding="utf-8"))
    seen: dict[str, int] = {}
    dupes = []
    for node in tree.body:  # top level only — function bodies are fine
        targets = []
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name):
                    targets.append(t.id)
        elif isinstance(node, ast.AnnAssign) and isinstance(
            node.target, ast.Name
        ):
            targets.append(node.target.id)
        for name in targets:
            if name in ALLOWED:
                continue
            if name in seen:
                dupes.append((name, seen[name], node.lineno))
            else:
                seen[name] = node.lineno
    assert not dupes, (
        f"{path.name}: module-level names assigned twice (oracle strings "
        f"bind at import, function bodies at call — these desync): "
        + ", ".join(f"{n} (lines {a} and {b})" for n, a, b in dupes)
    )
