"""S13 JDBC option assembly (no server in the container: test the option
builder, not the connection)."""

from __future__ import annotations

import pytest

from lakehouse_sfc_spark.sources.loader import jdbc_options


def test_jdbc_options_partitioned():
    opts = jdbc_options(
        "jdbc:postgresql://db:5432/x",
        "public.events",
        partition_column="event_id",
        bounds=(0, 1_000_000),
        num_partitions=32,
    )
    assert opts["partitionColumn"] == "event_id"
    assert opts["lowerBound"] == "0"
    assert opts["upperBound"] == "1000000"
    assert opts["numPartitions"] == "32"
    assert opts["fetchsize"] == "10000"


def test_jdbc_options_requires_bounds():
    with pytest.raises(ValueError):
        jdbc_options("jdbc:x", "t", partition_column="id")
