from lakehouse_sfc_spark.sources.loader import (
    load_input_df,
    load_table,
    register_tables,
    sniff_format,
    tpch_csv_reader,
)

__all__ = [
    "load_input_df",
    "load_table",
    "register_tables",
    "sniff_format",
    "tpch_csv_reader",
]
