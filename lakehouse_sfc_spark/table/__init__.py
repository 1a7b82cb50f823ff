from lakehouse_sfc_spark.table.pruning import Pred, prune_files, read_pruned
from lakehouse_sfc_spark.table.catalog import SfcTable

__all__ = ["Pred", "prune_files", "read_pruned", "SfcTable"]
