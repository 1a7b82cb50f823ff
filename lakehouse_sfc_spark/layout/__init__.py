from lakehouse_sfc_spark.layout.writer import LAYOUTS, layout_write
from lakehouse_sfc_spark.layout.stats import collect_file_stats, read_sidecar
from lakehouse_sfc_spark.layout.upsert import (
    build_update_batches,
    build_update_batches_ranged,
    keyed_upsert,
)

__all__ = [
    "LAYOUTS",
    "layout_write",
    "collect_file_stats",
    "read_sidecar",
    "build_update_batches",
    "build_update_batches_ranged",
    "keyed_upsert",
]
