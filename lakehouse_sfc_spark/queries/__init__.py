from lakehouse_sfc_spark.queries.registry import QUERIES, oracles, queries

# Importing the modules registers their queries.
from lakehouse_sfc_spark.queries import core  # noqa: E402,F401
from lakehouse_sfc_spark.queries import joins  # noqa: E402,F401
from lakehouse_sfc_spark.queries import tpch  # noqa: E402,F401
from lakehouse_sfc_spark.queries import tpch_full  # noqa: E402,F401
from lakehouse_sfc_spark.queries import windows  # noqa: E402,F401
from lakehouse_sfc_spark.queries import setops  # noqa: E402,F401
from lakehouse_sfc_spark.queries import datapipe  # noqa: E402,F401
from lakehouse_sfc_spark.queries import textops  # noqa: E402,F401
from lakehouse_sfc_spark.queries import profilerq  # noqa: E402,F401
from lakehouse_sfc_spark.queries import streamq  # noqa: E402,F401
from lakehouse_sfc_spark.queries import layouts  # noqa: E402,F401
from lakehouse_sfc_spark.queries import snapshotsq  # noqa: E402,F401
from lakehouse_sfc_spark.queries import sketchq  # noqa: E402,F401
from lakehouse_sfc_spark.queries import graphq  # noqa: E402,F401
from lakehouse_sfc_spark.queries import behavior  # noqa: E402,F401
from lakehouse_sfc_spark.queries import quality  # noqa: E402,F401
from lakehouse_sfc_spark.queries import advisorq  # noqa: E402,F401

__all__ = ["QUERIES", "queries", "oracles"]
