"""Budget guard for the driver's oracle sweep.

The round driver compares a rotating sample of registry queries against
their DuckDB oracles under a total time budget (~580 s observed); in rounds
1-2 a single slow entry (dedup_minhash_lsh at 138 s) truncated the sample to
50 rows.  This test runs the FULL registry through the committed driver
simulator (tools/driver_sim.py — fresh process, plain untuned local[8]
session, cwd outside the repo, exactly the driver's conditions) and fails
if the whole sweep or any single entry regresses past the budget, so ANY
sample the driver draws stays green.

Budgets are CALIBRATION-SCALED (r10 verdict task 2): the flat 10 s/query
budget went red on round 10's degraded host for two streaming entries that
MATCHed — a suite that fails on host weather trains people to ignore red.
Budgets now scale by tools.host_calib.budget_scale() (worst of single-core
and N-way-parallel slowdown vs the anchor host, floored at 1.0, capped at
4.0) and the streaming family gets a documented 15 s base tier (fixed
multi-microbatch Trigger.AvailableNow costs).  The scale NEVER loosens the
budget on a healthy host — test_budget_teeth below pins that a genuinely
2x-slow query still fails there.

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
sys.path.insert(0, str(REPO))

from tools.host_calib import (  # noqa: E402
    PER_QUERY_BUDGET_S,
    STREAMING_QUERY_BUDGET_S,
    budget_scale,
    per_query_budget,
)

TOTAL_BUDGET_S = 420.0  # anchor-host full-registry total (judge-measured 461 s
# on a 1.7x host ==> ~270 s anchor-equivalent; 420 leaves slack for growth)
SWEEP_TIMEOUT_S = 900.0  # anchor-host hard kill; also calibration-scaled.
# r10 lesson: the old flat 560 was only 1.2x the judge's measured 461 s sweep.


def test_budget_teeth():
    """The calibration scaling must not blunt the budget: on the anchor host
    (scale 1.0) a genuinely 2x-slow batch query still fails, the streaming
    tier is a documented constant (not unbounded), and the scale cap holds."""
    assert per_query_budget("q1_filter", 1.0) == PER_QUERY_BUDGET_S
    assert 2 * PER_QUERY_BUDGET_S > per_query_budget("q1_filter", 1.0), (
        "a 2x-slow query must exceed the anchor-host budget"
    )
    # Streaming tier: higher base, same scaling.
    assert per_query_budget("stream_dedup", 1.0) == STREAMING_QUERY_BUDGET_S
    assert per_query_budget("sessionize_stateful", 1.0) == STREAMING_QUERY_BUDGET_S
    # A fast host must not tighten below base, nor a slow host loosen
    # beyond the documented scale.
    assert per_query_budget("q1_filter", 0.5) == PER_QUERY_BUDGET_S
    assert per_query_budget("q1_filter", 1.7) == pytest.approx(17.0)
    # budget_scale itself: anchor-speed measurements ==> 1.0; broken-host
    # measurements cap at 4.0.
    assert budget_scale(cpu_sec=0.05, mcore_sec=0.10) == 1.0
    assert budget_scale(cpu_sec=5.0, mcore_sec=50.0) == 4.0


@pytest.mark.slow
@pytest.mark.skipif(
    os.environ.get("LAKEHOUSE_SKIP_SWEEP") == "1",
    reason="LAKEHOUSE_SKIP_SWEEP=1",
)
def test_full_driver_sweep_within_budget(tmp_path):
    scale = budget_scale()  # measured BEFORE the sweep loads the host
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "driver_sim.py")],
        cwd=tmp_path,  # the real driver does not run from the repo root
        capture_output=True,
        text=True,
        timeout=SWEEP_TIMEOUT_S * scale,
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
    slow = {
        n: (t, per_query_budget(n, scale))
        for n, t in timings.items()
        if t > per_query_budget(n, scale)
    }
    assert not slow, (
        f"entries over the calibration-scaled per-query budget "
        f"(host scale {scale}): {slow}"
    )
    assert total <= TOTAL_BUDGET_S * scale, (
        f"full sweep took {total:.0f}s > {TOTAL_BUDGET_S * scale:.0f}s "
        f"budget (host scale {scale}); "
        f"slowest: {sorted(timings.items(), key=lambda kv: -kv[1])[:8]}"
    )
