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


def test_null_parsed_wrapper_degrades_not_crashes(tmp_path):
    """A failed round's wrapper carries "parsed": null; the gate must
    degrade to a no-flag result, not AttributeError on None.get (r10
    ADVICE item 1)."""
    (tmp_path / "BENCH_r07.json").write_text(
        json.dumps({"n": 7, "rc": 1, "tail": "boom", "parsed": None})
    )
    out = _vs_prev(
        {"q1_filter": 0.1},
        {"q1_filter": {"min": 0.1, "max": 0.1}},
        calib=0.10,
        bench_dir=tmp_path,
    )
    assert out["source"] == "BENCH_r07.json"
    assert out["out_of_spread"] == {}


_PARSED_MULTI = dict(
    _PARSED,
    mcore_calib_sec=0.20,
    scan_mbps=100.0,
)


def test_multi_dim_rescales_by_worst_ratio(tmp_path):
    """r10 verdict task 1: a host with UNCHANGED single-core speed but 3x
    worse parallel throughput must rescale by the parallel dimension —
    the exact shape of the r10 +107% move the single-core probe missed."""
    (tmp_path / "BENCH_r09.json").write_text(
        json.dumps({"n": 9, "parsed": _PARSED_MULTI})
    )
    # Raw timings tripled, single-core calib identical, mcore calib 3x.
    timings = {"q1_filter": 0.300}
    spread = {"q1_filter": {"min": 0.290, "max": 0.320}}
    calibs = {"cpu_calib_sec": 0.10, "mcore_calib_sec": 0.60, "scan_mbps": 100.0}
    out = _vs_prev(timings, spread, calibs, bench_dir=tmp_path)
    assert out["calib_ratio_dim"] == "mcore_calib_sec"
    assert out["calib_ratio"] == 3.0
    assert out["calib_ratios"] == {
        "cpu_calib_sec": 1.0,
        "mcore_calib_sec": 3.0,
        "scan_mbps": 1.0,
    }
    # 0.290 / 3.0 = 0.0967 < prev_max 0.110 — correctly attributed to host.
    assert out["out_of_spread"] == {}


def test_scan_mbps_annotates_but_does_not_rescale(tmp_path):
    """ADVICE r11: scan_mbps is a one-shot cold probe — it must NOT set the
    rescale factor (one noisy read would excuse CPU-bound regressions).  A
    2x IO ratio with flat CPU dims still reports in calib_ratios, the flag
    fires under the CPU-only rescale, and the flag self-adjudicates via
    io_attributed=True (the move clears the gate under IO rescaling)."""
    (tmp_path / "BENCH_r09.json").write_text(
        json.dumps({"n": 9, "parsed": _PARSED_MULTI})
    )
    calibs = {"cpu_calib_sec": 0.10, "mcore_calib_sec": 0.20, "scan_mbps": 50.0}
    out = _vs_prev(
        {"q1_filter": 0.200},
        {"q1_filter": {"min": 0.190, "max": 0.210}},
        calibs,
        bench_dir=tmp_path,
    )
    assert out["calib_ratio_dim"] == "cpu_calib_sec"
    assert out["calib_ratio"] == 1.0
    assert out["calib_ratios"]["scan_mbps"] == 2.0
    flag = out["out_of_spread"]["q1_filter"]
    assert flag["io_ratio"] == 2.0
    assert flag["io_attributed"] is True


def test_io_noise_cannot_mask_cpu_regression(tmp_path):
    """A genuinely 3x-slower query on flat CPU dims is flagged with
    io_attributed=False even when the IO probe claims a 2x-slow disk —
    the IO excuse does not cover the size of the move."""
    (tmp_path / "BENCH_r09.json").write_text(
        json.dumps({"n": 9, "parsed": _PARSED_MULTI})
    )
    calibs = {"cpu_calib_sec": 0.10, "mcore_calib_sec": 0.20, "scan_mbps": 50.0}
    out = _vs_prev(
        {"q1_filter": 0.300},
        {"q1_filter": {"min": 0.300, "max": 0.320}},
        calibs,
        bench_dir=tmp_path,
    )
    flag = out["out_of_spread"]["q1_filter"]
    assert flag["io_attributed"] is False


def test_multi_dim_still_flags_real_regression(tmp_path):
    """All host dims flat ==> a 3x query move must still be flagged (the
    extra dimensions must not blunt the gate's teeth)."""
    (tmp_path / "BENCH_r09.json").write_text(
        json.dumps({"n": 9, "parsed": _PARSED_MULTI})
    )
    calibs = {"cpu_calib_sec": 0.10, "mcore_calib_sec": 0.20, "scan_mbps": 100.0}
    out = _vs_prev(
        {"q1_filter": 0.300},
        {"q1_filter": {"min": 0.290, "max": 0.320}},
        calibs,
        bench_dir=tmp_path,
    )
    assert "q1_filter" in out["out_of_spread"]


def test_prev_without_new_dims_falls_back_to_cpu(tmp_path):
    """A pre-r11 BENCH file has only cpu_calib_sec; the gate must use that
    single shared dimension rather than assuming 1.0."""
    _write_driver_shaped(tmp_path)  # _PARSED: cpu_calib_sec=0.10 only
    calibs = {"cpu_calib_sec": 0.20, "mcore_calib_sec": 9.9, "scan_mbps": 1.0}
    out = _vs_prev(
        {"q1_filter": 0.155},
        {"q1_filter": {"min": 0.150, "max": 0.160}},
        calibs,
        bench_dir=tmp_path,
    )
    assert out["calib_ratios"] == {"cpu_calib_sec": 2.0}
    assert out["calib_ratio"] == 2.0
    assert out["out_of_spread"] == {}


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


def test_vs_baseline_geomean():
    from bench import _vs_baseline

    out = _vs_baseline(
        {"q1_filter": 0.332, "q2_date_range": 0.296, "q3_group_by": 0.398,
         "q4_order_limit": 0.404, "not_priced": 9.9}
    )
    # ratios 2.0, 1.0, 1.0, 0.5 -> geomean 1.0
    assert out["ratios"]["q1_filter"] == 2.0
    assert out["ratios"]["q4_order_limit"] == 0.5
    assert "not_priced" not in out["ratios"]
    assert out["geomean"] == 1.0


def test_vs_baseline_empty():
    from bench import _vs_baseline

    assert _vs_baseline({}) == {"geomean": None, "ratios": {}}


def test_vs_baseline_off_sf_not_comparable():
    """ADVICE r11: _BASELINE_SEC is sf0.1-priced; any other run sf must
    yield an explicit not-comparable block, never ratios."""
    from bench import _vs_baseline

    out = _vs_baseline({"q1_filter": 0.2}, sf=0.01)
    assert out["geomean"] is None
    assert out["ratios"] == {}
    assert out["comparable"] is False
    assert out["sf"] == 0.01


def test_llm_pipeline_families_are_headline():
    """r11 verdict task 3: the dedup/text/ANN families — the repo's
    heaviest movers — must sit under the bench regression gate, not only
    in the (regenerated, never compared) SCALING ladder."""
    import lakehouse_sfc_spark.queries  # noqa: F401  (register all)
    from lakehouse_sfc_spark.queries.registry import QUERIES

    headline = {n for n, s in QUERIES.items() if s.headline}
    assert {
        "dedup_minhash_lsh",
        "text_bm25_topk",
        "dedup_embedding_topk",
    } <= headline
    # and the TPC-H/layout originals stay
    assert {"q1_filter", "q2_date_range", "q3_group_by", "q4_order_limit",
            "layout_zorder_scan"} <= headline
