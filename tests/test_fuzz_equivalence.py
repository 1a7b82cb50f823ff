"""Randomized Spark-vs-DuckDB equivalence fuzzing: workload-generator output
runs verbatim on both engines and must match exactly (sqllogictest-style;
stronger than the reference's assertion-free scripts/test_sql_gen.sh)."""

from __future__ import annotations

import os

import pytest

from lakehouse_sfc_spark.profiler.profile import profile_df
from lakehouse_sfc_spark.sources.loader import load_table, register_tables
from lakehouse_sfc_spark.wlgen.fuzz import fuzz_cases
from tests._compare import compare_query

SF_DIR = os.environ.get("LAKEHOUSE_TEST_SF", "/root/testdata/sf0.001")
FUZZ_SEED = int(os.environ.get("LAKEHOUSE_FUZZ_SEED", "11"))
FUZZ_N = int(os.environ.get("LAKEHOUSE_FUZZ_N", "3"))


@pytest.fixture(scope="module")
def cases(spark):
    fact_stats, _ = profile_df(load_table(spark, SF_DIR, "lineitem"))
    dim_stats, _ = profile_df(load_table(spark, SF_DIR, "supplier"))
    out = fuzz_cases(
        fact_stats, dim_stats=dim_stats, n=FUZZ_N, seed=FUZZ_SEED
    )
    register_tables(spark, SF_DIR)
    return {c.name: c.sql for c in out}


def _expected_names():
    # n rounds of A/B/C (+agg per B) + n joins — computed without Spark so
    # parametrization stays collection-time cheap.
    names = []
    i = 0
    for _ in range(FUZZ_N):
        for tpl in ("A", "B", "C"):
            names.append(f"{tpl}{i}")
            if tpl == "B":
                names.append(f"B{i}_agg")
            i += 1
    names += [f"D{i}" for i in range(FUZZ_N)]
    names += [f"W{i}" for i in range(FUZZ_N)]
    names += [f"G{i}" for i in range(FUZZ_N)]
    names += [f"S{i}" for i in range(FUZZ_N)]
    return names


@pytest.mark.parametrize("name", _expected_names())
def test_fuzz_case_matches_duckdb(spark, cases, name):
    assert name in cases, f"generator did not emit {name}: {sorted(cases)}"
    sql = cases[name]
    compare_query(spark, SF_DIR, lambda s, _d: s.sql(sql), sql)


def test_fuzz_cases_are_deterministic(spark):
    fact_stats, _ = profile_df(load_table(spark, SF_DIR, "lineitem"))
    a = fuzz_cases(fact_stats, n=2, seed=99)
    b = fuzz_cases(fact_stats, n=2, seed=99)
    assert a == b
    c = fuzz_cases(fact_stats, n=2, seed=100)
    assert a != c


def test_rq1_materialized_specs_match_duckdb(spark):
    """G9 end-to-end: RQ1 matrix descriptor -> materialized spec -> fill ->
    the same literal SQL runs on Spark and DuckDB with exact equality."""
    from lakehouse_sfc_spark.wlgen.fill import fill_spec
    from lakehouse_sfc_spark.wlgen.gen import materialize_rq1_spec, rq1_specs

    fact_stats, _ = profile_df(load_table(spark, SF_DIR, "lineitem"))
    payload = {"columns": {n: s.to_dict() for n, s in fact_stats.items()}}
    register_tables(spark, SF_DIR)

    # one date+float config and one int+int config exercise all rule types
    descs = [d for d in rq1_specs(n_range=2, n_point=2) if d["name"] in (
        "RQ1_S3_l_shipdate_l_quantity",
        "RQ1_S4_l_orderkey_l_partkey",
    )]
    assert len(descs) == 2
    ran = 0
    for desc in descs:
        for spec in materialize_rq1_spec(desc):
            outputs = fill_spec(spec, stats_payload=payload, table="lineitem")
            assert outputs
            for row in outputs:
                sql = row["sql"]
                assert ":" not in sql.replace("::", ""), sql
                compare_query(spark, SF_DIR, lambda s, _d: s.sql(sql), sql)
                ran += 1
    assert ran >= 8


def test_events_materialized_specs_match_duckdb(spark):
    """Amazon-analog matrix over events: descriptor -> spec -> fill -> both
    engines agree (timestamp interval rules against a TIMESTAMP(NANOS)
    source column)."""
    from lakehouse_sfc_spark.wlgen.fill import fill_spec
    from lakehouse_sfc_spark.wlgen.gen import events_specs, materialize_rq1_spec

    ev_stats, _ = profile_df(load_table(spark, SF_DIR, "events"))
    payload = {"columns": {n: s.to_dict() for n, s in ev_stats.items()}}
    register_tables(spark, SF_DIR)

    desc = next(
        d for d in events_specs(n_range=2, n_point=2)
        if d["name"] == "AMZ_S3_ts_value"
    )
    ran = 0
    for spec in materialize_rq1_spec(desc):
        for row in fill_spec(spec, stats_payload=payload, table="events"):
            sql = row["sql"]
            compare_query(spark, SF_DIR, lambda s, _d: s.sql(sql), sql)
            ran += 1
    assert ran == 4


def test_rq2_materialized_specs_match_duckdb(spark):
    """RQ2 end-to-end on configs whose columns exist in the test data: a
    band range box with order-permuted columns, and an IN-list point probe
    with fan-out — the same literal SQL agrees across engines."""
    from lakehouse_sfc_spark.wlgen.fill import fill_spec
    from lakehouse_sfc_spark.wlgen.gen import materialize_rq2_spec, rq2_specs

    fact_stats, _ = profile_df(load_table(spark, SF_DIR, "lineitem"))
    payload = {"columns": {n: s.to_dict() for n, s in fact_stats.items()}}
    register_tables(spark, SF_DIR)

    descs = [d for d in rq2_specs(n_range=2, n_point=2) if d["name"] in (
        "RQ2_S3_C2_N3_O2",      # quantity, extendedprice, shipdate box
        "RQ2_Q4_K4_4",          # l_suppkey IN (4 distinct values)
    )]
    assert len(descs) == 2
    ran = 0
    for desc in descs:
        for spec in materialize_rq2_spec(desc):
            for row in fill_spec(spec, stats_payload=payload, table="lineitem"):
                sql = row["sql"]
                assert ":" not in sql.replace("::", ""), sql
                compare_query(spark, SF_DIR, lambda s, _d: s.sql(sql), sql)
                ran += 1
    # 2 filled range boxes (the RQ2 range desc pins n_point=0) + 2 IN-probes
    assert ran == 4
