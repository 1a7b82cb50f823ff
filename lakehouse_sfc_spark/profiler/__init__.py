"""Distributed dataset profiler: the Spark-native re-expression of the
reference's pandas-batch profiler (``wlg/profiler/``), producing the same
``ColumnStats`` / ``stats.yaml`` shape from cluster-side aggregates."""

from lakehouse_sfc_spark.profiler.stats import (
    ColumnStats,
    UniDist,
    build_uni_dists,
    load_yaml,
    save_yaml,
)
from lakehouse_sfc_spark.profiler.profile import profile_df

__all__ = [
    "ColumnStats",
    "UniDist",
    "build_uni_dists",
    "load_yaml",
    "save_yaml",
    "profile_df",
]
