from lakehouse_sfc_spark.table.pruning import Pred, prune_files, read_pruned
from lakehouse_sfc_spark.table.catalog import SfcTable
from lakehouse_sfc_spark.table.snapshots import SnapshotTable

__all__ = ["Pred", "prune_files", "read_pruned", "SfcTable", "SnapshotTable"]
