"""Repeated-sweep stress test for environment-sensitive registry entries.

Round 4's two driver failures (p_json_extract, a_grouped_agg_pandas) and one
transient driver-sim flake (dedup_embedding_cosine, STATE.md ¶8) all passed
every single local run and failed only in the driver's environment or
intermittently — so a single green sweep is not evidence of determinism.
This test runs N fresh-process driver_sim sweeps over the subset whose
results flow through pandas/Arrow UDFs, JSON parsing, float ordering, or
streaming state (the constructs with any nondeterminism surface at all) and
asserts every run produced the SAME spark-side value hash per entry — a
different hash in ANY run means partition-order/dtype/batch-boundary
sensitivity that the driver will eventually sample.

Opt-in slow (~4-5 min): part of the default suite via the `slow` marker,
skip with LAKEHOUSE_SKIP_STRESS=1 (or -m "not slow") while iterating.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
from collections import defaultdict
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

RUNS = 5
SENSITIVE = [
    "p_json_extract",
    "a_grouped_agg_pandas",
    "dedup_embedding_cosine",
    "sessionize_stateful",
    "sessionize_events",
    "stream_tumbling_agg",
    "stream_dedup",
    "stream_interval_join",
    "stream_session_window",
    "stream_decontaminate",
    "stream_asof_enrich",
]


@pytest.mark.slow
@pytest.mark.skipif(
    os.environ.get("LAKEHOUSE_SKIP_STRESS") == "1",
    reason="LAKEHOUSE_SKIP_STRESS=1",
)
def test_sensitive_entries_hash_stable_across_processes(tmp_path):
    hashes: dict[str, set[str]] = defaultdict(set)
    statuses: dict[str, list[str]] = defaultdict(list)
    for run in range(RUNS):
        proc = subprocess.run(
            [sys.executable, str(REPO / "tools" / "driver_sim.py"), *SENSITIVE],
            cwd=tmp_path,
            env={**os.environ, "PRINT_HASH": "1"},
            capture_output=True,
            text=True,
            timeout=560,
        )
        results = re.findall(
            r"^RESULT (\S+) (MATCH|\S+) [0-9.]+s(?: hash=(\S+))?",
            proc.stdout,
            re.M,
        )
        assert len(results) == len(SENSITIVE), (
            f"run {run}: parsed {len(results)}/{len(SENSITIVE)} results; "
            f"stderr tail:\n{proc.stderr[-1500:]}"
        )
        for name, status, h in results:
            statuses[name].append(status)
            if h:
                hashes[name].add(h)

    bad_status = {n: s for n, s in statuses.items() if set(s) != {"MATCH"}}
    assert not bad_status, f"non-MATCH statuses across {RUNS} runs: {bad_status}"
    unstable = {n: sorted(hs) for n, hs in hashes.items() if len(hs) != 1}
    assert not unstable, (
        f"value hash varied across fresh processes: {unstable}"
    )


@pytest.mark.slow
@pytest.mark.skipif(
    os.environ.get("LAKEHOUSE_SKIP_STRESS") == "1",
    reason="LAKEHOUSE_SKIP_STRESS=1",
)
def test_full_sweep_on_adversarial_fixture(tmp_path):
    """The ENTIRE registry must stay oracle-MATCH on the adversarial
    fixture (tools/make_adv_fixture.py): NULLs in every mutable column,
    multi-byte unicode + NBSP text, empty strings, exact-duplicate rows
    and embeddings, zero-norm vectors, duplicate (ts, user) event ties,
    dense top-k value ties, an empty dimension group.  Round 7's first
    run of this caught 16 real parity bugs (NULL ordering, CASE-on-NULL,
    NULL-payload kernels, zero-norm division, duplicate-key ingest) that
    five rounds of ASCII/tie-sparse sweeps never exposed."""
    from tools.make_adv_fixture import build

    adv = build(str(tmp_path / "sf0.001-adv"))
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "driver_sim.py")],
        cwd=tmp_path,
        env={**os.environ, "SF_DIR": adv},
        capture_output=True,
        text=True,
        timeout=1700,
    )
    m = re.search(r"^TOTAL (\d+) queries [0-9.]+s fails=(\d+) (\[.*\])",
                  proc.stdout, re.M)
    assert m, f"no TOTAL line; stderr tail:\n{proc.stderr[-2000:]}"
    n, fails, names = int(m.group(1)), int(m.group(2)), m.group(3)
    assert n >= 208, f"sweep only covered {n} entries"
    assert fails == 0, (
        f"{fails} registry entries break on adversarial data: {names}\n"
        + "\n".join(
            ln for ln in proc.stdout.splitlines()
            if "MISMATCH" in ln or "ERROR" in ln
        )[:3000]
    )
