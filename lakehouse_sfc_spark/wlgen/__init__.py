"""Workload generator: profile-driven parameterized SQL synthesis
(reference: wlg/ — specs with :param templates, selectivity-targeted
sampling, interval rules, random/grid/lhs modes)."""

from lakehouse_sfc_spark.wlgen.fill import fill_spec, write_sql_dir, write_workload
from lakehouse_sfc_spark.wlgen.samplers import (
    sample_between,
    sample_copula,
    sample_eq_from_topk,
)
from lakehouse_sfc_spark.wlgen.templates import Templates

__all__ = [
    "fill_spec",
    "write_workload",
    "write_sql_dir",
    "sample_between",
    "sample_eq_from_topk",
    "sample_copula",
    "Templates",
]
