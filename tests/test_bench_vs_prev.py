"""Unit tests for bench.py::_vs_prev — the cross-round regression gate.

The driver stores BENCH_r{N}.json as a WRAPPER around this script's JSON
line: {"n","rc","cpus","sf","tail","parsed": {payload}}.  Round 9's gate
read the wrapper directly, so ``prev_q`` was always empty and the gate
never fired (a +30% move went unflagged).  These tests feed a
driver-shaped fixture and assert the gate actually flags an out-of-spread
query — and stays quiet inside the spread.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import _vs_prev  # noqa: E402

_PARSED = {
    "metric": "headline_queries_total",
    "value": 2.0,
    "unit": "sec",
    "queries": {"q1_filter": 0.100, "q3_group_by": 0.200},
    "spread": {
        "q1_filter": {"min": 0.095, "max": 0.110},
        "q3_group_by": {"min": 0.190, "max": 0.220},
    },
    "cpu_calib_sec": 0.10,
    "sf": 0.1,
}


def _write_driver_shaped(tmp_path: Path) -> None:
    """Exactly the driver's wrapper: payload nested under "parsed"."""
    wrapper = {
        "n": 9,
        "rc": 0,
        "cpus": 32,
        "sf": 0.1,
        "tail": "…spark log noise…\n" + json.dumps(_PARSED) + "\n",
        "parsed": _PARSED,
    }
    (tmp_path / "BENCH_r09.json").write_text(json.dumps(wrapper))


def test_driver_wrapped_file_flags_out_of_spread(tmp_path):
    _write_driver_shaped(tmp_path)
    # q1_filter regressed: this round's MIN (0.150) is 36% above the
    # previous round's MAX (0.110) at identical host speed.
    timings = {"q1_filter": 0.155, "q3_group_by": 0.205}
    spread = {
        "q1_filter": {"min": 0.150, "max": 0.160},
        "q3_group_by": {"min": 0.195, "max": 0.215},
    }
    out = _vs_prev(timings, spread, calib=0.10, bench_dir=tmp_path)
    assert out["source"] == "BENCH_r09.json"
    assert "q1_filter" in out["out_of_spread"], (
        "driver-wrapped prev file must still populate prev_q — the r9 gate "
        "read the wrapper and never matched a query name"
    )
    flag = out["out_of_spread"]["q1_filter"]
    assert flag["prev_max"] == 0.110
    assert flag["cur_min_scaled"] == 0.150
    # q3_group_by moved within spread — must NOT be flagged.
    assert "q3_group_by" not in out["out_of_spread"]


def test_driver_wrapped_file_quiet_inside_spread(tmp_path):
    _write_driver_shaped(tmp_path)
    timings = {"q1_filter": 0.105, "q3_group_by": 0.200}
    spread = {
        "q1_filter": {"min": 0.098, "max": 0.112},
        "q3_group_by": {"min": 0.190, "max": 0.210},
    }
    out = _vs_prev(timings, spread, calib=0.10, bench_dir=tmp_path)
    assert out["out_of_spread"] == {}


def test_calibration_ratio_rescales_before_flagging(tmp_path):
    _write_driver_shaped(tmp_path)
    # Host is 2x slower (calib 0.20 vs prev 0.10): raw 0.150 min scales to
    # 0.075 on the previous host — inside spread, no flag.
    timings = {"q1_filter": 0.155}
    spread = {"q1_filter": {"min": 0.150, "max": 0.160}}
    out = _vs_prev(timings, spread, calib=0.20, bench_dir=tmp_path)
    assert out["calib_ratio"] == 2.0
    assert out["out_of_spread"] == {}


def test_bare_payload_still_read(tmp_path):
    # This script's own output (no wrapper) must keep working.
    (tmp_path / "BENCH_r08.json").write_text(json.dumps(_PARSED))
    timings = {"q1_filter": 0.155}
    spread = {"q1_filter": {"min": 0.150, "max": 0.160}}
    out = _vs_prev(timings, spread, calib=0.10, bench_dir=tmp_path)
    assert out["source"] == "BENCH_r08.json"
    assert "q1_filter" in out["out_of_spread"]


def test_numeric_round_ordering(tmp_path):
    # BENCH_r9 vs BENCH_r10: lexicographic glob order would pick r9; the
    # numeric sort must pick r10.
    old = dict(_PARSED, queries={"q1_filter": 99.0}, spread={})
    (tmp_path / "BENCH_r9.json").write_text(json.dumps(old))
    (tmp_path / "BENCH_r10.json").write_text(
        json.dumps({"parsed": _PARSED, "n": 10})
    )
    out = _vs_prev({}, {}, calib=0.10, bench_dir=tmp_path)
    assert out["source"] == "BENCH_r10.json"


def test_no_prev_files(tmp_path):
    out = _vs_prev({}, {}, calib=0.10, bench_dir=tmp_path)
    assert out == {"source": None}


def test_real_committed_bench_files_unwrap(tmp_path):
    """The actual BENCH_r09.json in the repo must yield a non-empty prev_q
    path (regression guard against the wrapper shape drifting again)."""
    repo = Path(__file__).resolve().parent.parent
    latest = repo / "BENCH_r09.json"
    if not latest.exists():
        return
    prev = json.loads(latest.read_text())
    prev = prev.get("parsed", prev)
    assert prev.get("queries"), "unwrapped BENCH_r09 must expose queries"
