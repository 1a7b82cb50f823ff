"""Budget guard for the driver's oracle sweep.

The round driver compares a rotating sample of registry queries against
their DuckDB oracles under a total time budget (~580 s observed); in rounds
1-2 a single slow entry (dedup_minhash_lsh at 138 s) truncated the sample to
50 rows.  This test runs the FULL registry through the committed driver
simulator (tools/driver_sim.py — fresh process, plain untuned local[8]
session, cwd outside the repo, exactly the driver's conditions) and fails
if the whole sweep or any single entry regresses past the budget, so ANY
sample the driver draws stays green.

Budgets: total 420 s (full registry; any 50-query sample is well under the
driver's 580 s), per-entry 10 s (heavy tail today: dedup_minhash_lsh ~5 s
cold — round 6 moved the whole Jaccard oracle family to the intersection-
via-equality-join formulation, 3.3 s → 0.06 s each in DuckDB; see STATE.md
timing ledger).

Set LAKEHOUSE_SKIP_SWEEP=1 to skip locally when iterating on one query.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

TOTAL_BUDGET_S = 420.0
PER_QUERY_BUDGET_S = 10.0


@pytest.mark.slow
@pytest.mark.skipif(
    os.environ.get("LAKEHOUSE_SKIP_SWEEP") == "1",
    reason="LAKEHOUSE_SKIP_SWEEP=1",
)
def test_full_driver_sweep_within_budget(tmp_path):
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "driver_sim.py")],
        cwd=tmp_path,  # the real driver does not run from the repo root
        capture_output=True,
        text=True,
        timeout=560,
    )
    out = proc.stdout
    results = re.findall(
        r"^RESULT (\S+) (MATCH|MISMATCH\S*|rows-only\(\d+\)|ERROR) ([0-9.]+)s",
        out,
        re.M,
    )
    assert results, f"no RESULT lines parsed; stderr tail:\n{proc.stderr[-2000:]}"

    failures = [(n, s) for n, s, _ in results if s not in ("MATCH",)
                and not s.startswith("rows-only")]
    assert proc.returncode == 0 and not failures, (
        f"driver-sim failures: {failures}\n{out[-2000:]}"
    )

    from lakehouse_sfc_spark.queries.registry import QUERIES

    names = {n for n, _, _ in results}
    missing = set(QUERIES) - names
    assert not missing, f"registry entries never swept: {sorted(missing)}"

    timings = {n: float(t) for n, _, t in results}
    total = sum(timings.values())
    slow = {n: t for n, t in timings.items() if t > PER_QUERY_BUDGET_S}
    assert not slow, (
        f"entries over the {PER_QUERY_BUDGET_S:.0f}s per-query budget: {slow}"
    )
    assert total <= TOTAL_BUDGET_S, (
        f"full sweep took {total:.0f}s > {TOTAL_BUDGET_S:.0f}s budget; "
        f"slowest: {sorted(timings.items(), key=lambda kv: -kv[1])[:8]}"
    )
