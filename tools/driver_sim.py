"""Driver simulator: imports __spark_entry__, smoke-runs entry(), then
compares every queries() entry against its oracle_sql() in DuckDB at sf0.01,
exactly like the round driver (plain untuned session, column-name-sorted
value hash, no date/datetime coercion).

Usage: python /root/repo/.scratch/driver_sim.py [name ...]
  With names: only those queries.  Env SF_DIR overrides the sf0.01 dir.
Prints one line per query: RESULT <name> MATCH|MISMATCH|rows-only(n) <sec>s
and a trailing TOTAL line; exits nonzero on any mismatch/error.

ORACLE_CACHE=1 (opt-in, sf1-probe accelerant — r9 verdict task 7): cache
each oracle's (columns, row count, value hash) keyed by (query name, md5
of the oracle SQL, fingerprint of the fixture's parquet files) in
.scratch/oracle_cache.json, so a ~20-minute exact-all-pairs oracle runs
once per fixture fingerprint instead of once per probe.  The SPARK side
always re-runs; only the oracle result is reused, and any change to the
oracle SQL or the fixture invalidates the entry.  Default OFF: the bare
sim must mirror the round driver exactly.
"""

from __future__ import annotations

import datetime
import hashlib
import os
import sys
import time

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
# DuckDB spills out-of-core sorts/joins to `.tmp/` under the CWD by default;
# a long sf1 oracle once left 7.3 GB there and it got committed.  Spill to
# the gitignored .scratch/ instead.
_DUCK_TMP = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scratch",
    "duckdb_tmp",
)
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(v):
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, datetime.datetime):
        # naive vs aware must be distinguishable, like the driver
        return "dt:" + v.isoformat()
    if isinstance(v, datetime.date):
        return "d:" + v.isoformat()
    if isinstance(v, bytes):
        return "b:" + v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(v[k])}" for k in sorted(v)) + "}"
    return f"{type(v).__name__}:{v!r}"


def render_divergent_cols(cols, rows_a, rows_b):
    """Column names whose canonical values differ between two renders of
    the same DuckDB result (fetchall vs Arrow)."""
    bad = []
    for j, c in enumerate(cols):
        for ra, rb in zip(rows_a, rows_b):
            if canon(ra[j]) != canon(rb[j]):
                bad.append(c)
                break
    return bad


def pandas_rows(con, sql, ocols, frows):
    """Render the oracle result through duckdb's PANDAS fetch path
    (``.df()``) and normalize the known-benign pandas boxings back to the
    fetchall representation: numpy scalars unbox via .item(); DATE columns
    come back as midnight Timestamps; BIGINT columns with any NULL come
    back float64 (both tolerated by the round driver — green rows have
    carried nullable ints and dates since r1).  What must NOT be masked is
    the round-8 red-row class: DECIMAL(38,0) renders Decimal('35') via
    fetchall but 35.0 here — the fetchall guide type is Decimal, not int,
    so the float survives into the hash and the divergence flags locally."""
    import math

    import pandas as pd

    df = con.execute(sql).df()
    guide = {}
    for j in range(len(ocols)):
        for r in frows:
            if r[j] is not None:
                guide[j] = type(r[j])
                break
    out = []
    for i in range(len(df)):
        row = []
        for j in range(len(ocols)):
            v = df.iat[i, j]
            g = guide.get(j)
            if v is None or v is pd.NaT:
                row.append(None)
                continue
            if isinstance(v, float) and math.isnan(v):
                row.append(None)
                continue
            if type(v).__module__ == "numpy" and hasattr(v, "item"):
                v = v.item()
            if isinstance(v, pd.Timestamp):
                v = v.to_pydatetime()
                if g is datetime.date and v.time() == datetime.time(0):
                    v = v.date()
            if g is int and isinstance(v, float) and v.is_integer():
                v = int(v)  # NULL-bearing int64 column rendered float64
            row.append(v)
        out.append(tuple(row))
    return out


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(canon(row[i]) for i in order) for row in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    only = set(sys.argv[1:])
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    t0 = time.time()
    ent = e.entry(spark)
    n = len(ent.collect())
    print(f"ENTRY ok rows={n} {time.time()-t0:.1f}s", flush=True)

    qs = e.queries()
    oracles = e.oracle_sql()

    con = duckdb.connect()
    os.makedirs(_DUCK_TMP, exist_ok=True)
    con.execute(f"SET temp_directory='{_DUCK_TMP}'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    use_cache = bool(os.environ.get("ORACLE_CACHE"))
    cache_path = os.path.join(
        os.path.dirname(_DUCK_TMP), "oracle_cache.json"
    )
    cache: dict[str, dict] = {}
    if use_cache and os.path.exists(cache_path):
        import json

        try:
            with open(cache_path) as fh:
                cache = json.load(fh)
        except (OSError, ValueError):
            cache = {}

    def _fixture_fp() -> str:
        parts = []
        for f in sorted(os.listdir(SF_DIR)):
            if f.endswith(".parquet"):
                st = os.stat(os.path.join(SF_DIR, f))
                parts.append(f"{f}:{st.st_size}:{st.st_mtime_ns}")
        return hashlib.md5("|".join(parts).encode()).hexdigest()[:16]

    fp = _fixture_fp() if use_cache else ""

    fails = []
    total0 = time.time()
    timings = {}
    # Per-entry timing artifact (r11 verdict task 1): the sweep's heavy
    # tail swings 4-19 s on stall-prone hosts with no record of WHERE the
    # time went (Spark side vs oracle side vs total), so adjudicating a
    # budget breach needed a human re-run.  Every sweep now writes
    # .scratch/sweep_times.json with spark_s/oracle_s/wall_s per entry.
    detail: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        spark_s = oracle_s = 0.0
        try:
            df = fn(spark, SF_DIR)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
            spark_s = time.time() - t0
            ckey = None
            if use_cache and name in oracles:
                sqlh = hashlib.md5(oracles[name].encode()).hexdigest()[:12]
                ckey = f"{name}:{sqlh}:{fp}"
                hit = cache.get(ckey)
                if hit is not None:
                    dt = time.time() - t0
                    timings[name] = dt
                    if sorted(cols) != sorted(hit["cols"]):
                        print(
                            f"RESULT {name} MISMATCH(schema,cached) {dt:.1f}s "
                            f"spark={sorted(cols)} oracle={sorted(hit['cols'])}",
                            flush=True,
                        )
                        fails.append(name)
                    elif len(rows) != hit["n"]:
                        print(
                            f"RESULT {name} MISMATCH(rows {len(rows)} vs "
                            f"{hit['n']},cached) {dt:.1f}s",
                            flush=True,
                        )
                        fails.append(name)
                    elif value_hash(cols, rows) != hit["hash"]:
                        print(
                            f"RESULT {name} MISMATCH(hash,cached) {dt:.1f}s",
                            flush=True,
                        )
                        fails.append(name)
                    else:
                        print(
                            f"RESULT {name} MATCH(cached-oracle) {dt:.1f}s",
                            flush=True,
                        )
                    continue
            if name in oracles:
                to0 = time.time()
                orc = con.execute(oracles[name])
                ocols = [d[0] for d in orc.description]
                orows = [tuple(r) for r in orc.fetchall()]
                # Render-parity guard (round-6): the driver fetches oracle
                # rows through an Arrow/pandas path, where e.g. an uncast
                # SUM(BIGINT) (DuckDB HUGEINT) renders as Decimal/float64
                # while fetchall() gives int — a hash divergence invisible
                # to a fetchall-only sim.  Hash BOTH renders and fail on
                # any disagreement so the class is locally reproducible.
                atbl = con.execute(oracles[name]).arrow()
                arows = [
                    tuple(d[c] for c in ocols) for d in atbl.to_pylist()
                ]
                prows = pandas_rows(con, oracles[name], ocols, orows)
                oracle_s = time.time() - to0
                dt = time.time() - t0
                timings[name] = dt
                if value_hash(ocols, orows) != value_hash(ocols, arows):
                    bad = render_divergent_cols(ocols, orows, arows)
                    print(
                        f"RESULT {name} MISMATCH(render) {dt:.1f}s "
                        f"fetchall vs arrow disagree on cols={bad} "
                        "(uncast SUM/HUGEINT-style oracle output?)",
                        flush=True,
                    )
                    fails.append(name)
                elif value_hash(ocols, orows) != value_hash(ocols, prows):
                    bad = render_divergent_cols(ocols, orows, prows)
                    print(
                        f"RESULT {name} MISMATCH(render-pandas) {dt:.1f}s "
                        f"fetchall vs .df() disagree on cols={bad} "
                        "(DECIMAL-typed final output? r8 red-row class)",
                        flush=True,
                    )
                    fails.append(name)
                elif sorted(cols) != sorted(ocols):
                    print(
                        f"RESULT {name} MISMATCH(schema) {dt:.1f}s "
                        f"spark={sorted(cols)} oracle={sorted(ocols)}",
                        flush=True,
                    )
                    fails.append(name)
                elif len(rows) != len(orows):
                    print(
                        f"RESULT {name} MISMATCH(rows {len(rows)} vs "
                        f"{len(orows)}) {dt:.1f}s",
                        flush=True,
                    )
                    fails.append(name)
                elif value_hash(cols, rows) != value_hash(ocols, orows):
                    print(f"RESULT {name} MISMATCH(hash) {dt:.1f}s", flush=True)
                    fails.append(name)
                    if os.environ.get("DUMP"):
                        so = sorted(range(len(cols)), key=lambda i: cols[i])
                        oo = sorted(range(len(ocols)), key=lambda i: ocols[i])
                        sl = sorted("|".join(canon(r[i]) for i in so) for r in rows)
                        ol = sorted("|".join(canon(r[i]) for i in oo) for r in orows)
                        for a, b in zip(sl, ol):
                            if a != b:
                                print(f"  spark : {a}\n  oracle: {b}")
                                break
                else:
                    suffix = (
                        f" hash={value_hash(cols, rows)[:16]}"
                        if os.environ.get("PRINT_HASH")
                        else ""
                    )
                    print(f"RESULT {name} MATCH {dt:.1f}s{suffix}", flush=True)
                    if ckey is not None:
                        import json

                        cache[ckey] = {
                            "cols": ocols,
                            "n": len(orows),
                            "hash": value_hash(ocols, orows),
                        }
                        # tmp + os.replace: a crash mid-dump must not leave
                        # truncated JSON (the loader would reset to {} and
                        # silently drop ~20 min of accumulated oracle runs)
                        tmp = cache_path + ".tmp"
                        with open(tmp, "w") as fh:
                            json.dump(cache, fh)
                        os.replace(tmp, cache_path)
            else:
                dt = time.time() - t0
                timings[name] = dt
                print(f"RESULT {name} rows-only({len(rows)}) {dt:.1f}s", flush=True)
        except Exception as ex:  # noqa: BLE001
            dt = time.time() - t0
            timings[name] = dt
            print(f"RESULT {name} ERROR {dt:.1f}s {type(ex).__name__}: {ex}", flush=True)
            fails.append(name)
        finally:
            detail[name] = {
                "spark_s": round(spark_s, 2),
                "oracle_s": round(oracle_s, 2),
                "wall_s": round(timings.get(name, time.time() - t0), 2),
            }

    total = time.time() - total0
    _write_sweep_times(detail, total, fails, bool(only))
    slow = sorted(timings.items(), key=lambda kv: -kv[1])[:8]
    print(f"TOTAL {len(timings)} queries {total:.1f}s fails={len(fails)} {fails}")
    print("SLOWEST " + " ".join(f"{n}={t:.1f}s" for n, t in slow))
    return 1 if fails else 0


def _write_sweep_times(detail, total, fails, subset: bool) -> None:
    """Atomic dump of the per-entry timing artifact.  Subset runs write to
    a sibling file so a breach-adjudication rerun never clobbers the full
    sweep's record."""
    import json

    name = "sweep_times_subset.json" if subset else "sweep_times.json"
    path = os.path.join(os.path.dirname(_DUCK_TMP), name)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = {
        "sf_dir": SF_DIR,
        "total_s": round(total, 1),
        "fails": fails,
        "entries": detail,
    }
    tmp = f"{path}.tmp.{os.getpid()}"
    try:
        with open(tmp, "w") as fh:
            json.dump(payload, fh, indent=1, sort_keys=True)
        os.replace(tmp, path)
    except OSError:
        pass  # observability artifact only — never fail the sweep over it


if __name__ == "__main__":
    sys.exit(main())
