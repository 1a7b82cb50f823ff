"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Per-query protocol mirrors the reference runner (run_queries.py:597-705):
clear cache, warmup run discarded, then a timed run driven to completion with
a count-style action.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def _cpu_calibration() -> float:
    """Seconds for a fixed single-core workload (md5 over 48 MiB + a 256²
    float matmul), the median of 3.  The VMs the driver schedules rounds on
    differ several-fold in single-core speed (measured: one session's host
    ran the identical headline set ~2.5× slower than the previous
    session's, with this calibration at 0.25 s); comparing
    value/cpu_calib_sec across rounds separates host speed from real
    regressions."""
    import hashlib

    import numpy as np

    a = np.full((256, 256), 1.5)
    blob = bytes(8 << 20)
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        h = hashlib.md5()
        for _ in range(6):
            h.update(blob)
        for _ in range(8):
            a @ a
        samples.append(time.perf_counter() - t0)
    return round(sorted(samples)[1], 4)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.replace("sf", "") or 0.1)

    from lakehouse_sfc_spark.queries.registry import QUERIES
    import lakehouse_sfc_spark.queries  # noqa: F401  (register all)
    from lakehouse_sfc_spark.session import get_spark

    spark = get_spark(app_name="lakehouse_sfc_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    headline = [n for n, s in sorted(QUERIES.items()) if s.headline]
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
    # Global JVM warm pass: run every headline once, discarded, BEFORE any
    # timing.  JIT/codegen/shuffle-machinery warmth is JVM-global and takes
    # ~8 query executions to settle (measured: the alphabetically-first
    # query's timed median runs ~0.15 s hot merely because its per-query
    # warmup is the very first execution in a cold JVM).  The per-query
    # clearCache + warmup protocol below is unchanged.
    for name in headline:
        QUERIES[name].fn(spark, sf_dir).count()
    timings: dict[str, float] = {}
    spread: dict[str, dict[str, float]] = {}
    for name in headline:
        fn = QUERIES[name].fn
        spark.catalog.clearCache()
        fn(spark, sf_dir).count()  # warmup run, discarded
        samples = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        # median damps single-run host noise (reference averages --repeat N
        # runs, run_queries copy.py:1173; median is the robust equivalent);
        # min/max expose the host's run-to-run swing so cross-round deltas
        # smaller than the spread aren't mistaken for regressions.
        timings[name] = round(sorted(samples)[len(samples) // 2], 4)
        spread[name] = {
            "min": round(min(samples), 4),
            "max": round(max(samples), 4),
        }

    total = round(sum(timings.values()), 4)
    calib = _cpu_calibration()
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "spread": spread,
        "repeats": repeats,
        "total_min": round(sum(s["min"] for s in spread.values()), 4),
        "total_max": round(sum(s["max"] for s in spread.values()), 4),
        "cpu_calib_sec": calib,
        "sf": sf,
    }
    out["vs_prev"] = _vs_prev(timings, spread, calib)
    print(json.dumps(out))
    spark.stop()


def _vs_prev(
    timings: dict, spread: dict, calib: float, bench_dir: Path | None = None
) -> dict:
    """Spread-aware regression flagging against the latest BENCH_r*.json.

    A cross-round delta only means something when it clears BOTH rounds'
    run-to-run spreads after host-speed normalization (the calibration
    ratio): a query is flagged out-of-spread only when this round's MIN,
    scaled to the previous host's speed, still exceeds the previous
    round's MAX by >10%.  Anything inside the spreads is JIT/host noise,
    not a plan change — the r7 q3_group_by/layout_zorder_scan lesson."""
    import glob
    import re

    # Sort by the NUMERIC round (lexicographic sort breaks the moment an
    # unpadded BENCH_r9.json meets BENCH_r10.json).
    prevs = sorted(
        glob.glob(str((bench_dir or _REPO) / "BENCH_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    )
    if not prevs:
        return {"source": None}
    src = prevs[-1]
    try:
        with open(src) as fh:
            prev = json.load(fh)
    except (OSError, ValueError):
        return {"source": None}
    # The driver wraps this script's JSON line under "parsed" alongside run
    # metadata ({"n","rc","cpus","sf","tail","parsed":{...}}).  Reading the
    # wrapper directly made prev_q always {} — no query name ever matched and
    # the gate could never fire (it silently passed the r9 +30% host-side
    # move).  Unwrap when present; a bare payload (this script's own output)
    # still reads unchanged.
    prev = prev.get("parsed", prev)
    prev_q = prev.get("queries", {})
    prev_spread = prev.get("spread", {})
    prev_calib = prev.get("cpu_calib_sec") or calib
    ratio = calib / prev_calib if prev_calib else 1.0
    flags: dict[str, dict] = {}
    for name, med in timings.items():
        if name not in prev_q:
            continue
        prev_max = prev_spread.get(name, {}).get("max", prev_q[name])
        cur_min_scaled = spread[name]["min"] / ratio if ratio else med
        if cur_min_scaled > prev_max * 1.10:
            flags[name] = {
                "prev_median": prev_q[name],
                "prev_max": prev_max,
                "cur_median": med,
                "cur_min_scaled": round(cur_min_scaled, 4),
            }
    return {
        "source": Path(src).name,
        "calib_ratio": round(ratio, 4),
        "out_of_spread": flags,
    }


if __name__ == "__main__":
    main()
