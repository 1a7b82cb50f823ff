from lakehouse_sfc_spark.sfc.keys import add_sfc_key, cell_columns
from lakehouse_sfc_spark.sfc.zorder import zorder_index_np, zorder_key_expr
from lakehouse_sfc_spark.sfc.hilbert import hilbert_index_np, hilbert_key_udf

__all__ = [
    "add_sfc_key",
    "cell_columns",
    "zorder_index_np",
    "zorder_key_expr",
    "hilbert_index_np",
    "hilbert_key_udf",
]
