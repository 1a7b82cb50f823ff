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
    adjudicate_breaches,
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

    # r11 verdict task 1a: the sweep must leave a per-entry timing artifact
    # (spark_s vs oracle_s vs wall) so a breach is adjudicable post-hoc.
    import json

    art = REPO / ".scratch" / "sweep_times.json"
    assert art.exists(), "driver_sim did not write .scratch/sweep_times.json"
    data = json.loads(art.read_text())
    assert set(data["entries"]) == names
    assert all(
        {"spark_s", "oracle_s", "wall_s"} <= set(v)
        for v in data["entries"].values()
    )

    timings = {n: float(t) for n, _, t in results}
    total = sum(timings.values())
    slow = {
        n: t for n, t in timings.items() if t > per_query_budget(n, scale)
    }

    def _rerun(names):
        """Fresh subset sweep for the breaching entries only."""
        p = subprocess.run(
            [sys.executable, str(REPO / "tools" / "driver_sim.py"), *names],
            cwd=tmp_path,
            capture_output=True,
            text=True,
            timeout=SWEEP_TIMEOUT_S * budget_scale(),
        )
        return {
            n: float(t)
            for n, _s, t in re.findall(
                r"^RESULT (\S+) (\S+) ([0-9.]+)s", p.stdout, re.M
            )
        }

    # r11 verdict task 1: a per-entry breach re-probes calibration (the
    # host may have stalled AFTER the pre-sweep probe) and re-runs the
    # entry once; only a rerun that also breaches fails the suite.
    confirmed = adjudicate_breaches(slow, scale, budget_scale, _rerun)
    assert not confirmed, (
        f"entries over the calibration-scaled per-query budget after "
        f"re-probe + one rerun (pre-sweep host scale {scale}): {confirmed}"
    )
    assert total <= TOTAL_BUDGET_S * scale, (
        f"full sweep took {total:.0f}s > {TOTAL_BUDGET_S * scale:.0f}s "
        f"budget (host scale {scale}); "
        f"slowest: {sorted(timings.items(), key=lambda kv: -kv[1])[:8]}"
    )


def test_breach_adjudication_fixture():
    """Fixture tests for the breach path (r11 verdict task 1): a breach
    caused by a post-probe host stall clears on re-probe; a transient
    entry stall clears on the single rerun; a genuine regression is
    confirmed and fails — and a clean sweep never probes or reruns."""
    calls = {"reprobe": 0, "rerun": []}

    def reprobe_2x():
        calls["reprobe"] += 1
        return 2.0

    def reprobe_flat():
        calls["reprobe"] += 1
        return 1.0

    def rerun_fast(names):
        calls["rerun"].append(list(names))
        return {n: 1.0 for n in names}

    def rerun_slow(names):
        calls["rerun"].append(list(names))
        return {n: 99.0 for n in names}

    # 1. No breaches: nothing probed, nothing rerun.
    assert adjudicate_breaches({}, 1.0, reprobe_flat, rerun_fast) == {}
    assert calls == {"reprobe": 0, "rerun": []}

    # 2. Host stalled after the pre-sweep probe: 15 s at scale 1.0 breaches
    # the 10 s budget, but the fresh probe says the host is 2x slow -> the
    # 20 s budget clears it without any rerun.
    assert adjudicate_breaches(
        {"q1_filter": 15.0}, 1.0, reprobe_2x, rerun_fast
    ) == {}
    assert calls["rerun"] == []

    # 3. Transient per-entry stall: still over budget at the fresh scale,
    # but the one rerun comes back fast -> green.
    assert adjudicate_breaches(
        {"q1_filter": 76.8}, 1.0, reprobe_flat, rerun_fast
    ) == {}
    assert calls["rerun"] == [["q1_filter"]]

    # 4. Genuine regression: breaches again on rerun -> confirmed, with
    # the full adjudication trail in the failure payload.
    out = adjudicate_breaches(
        {"q1_filter": 76.8}, 1.0, reprobe_flat, rerun_slow
    )
    assert out["q1_filter"]["first_s"] == 76.8
    assert out["q1_filter"]["rerun_s"] == 99.0
    assert out["q1_filter"]["budget_s"] == 10.0

    # 5. An entry the rerun failed to time at all (crash) stays confirmed.
    out = adjudicate_breaches(
        {"q1_filter": 76.8}, 1.0, reprobe_flat, lambda names: {}
    )
    assert out["q1_filter"]["rerun_s"] is None
