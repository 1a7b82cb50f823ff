"""lakehouse_sfc_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the ``lakehouse_sfc`` reference (SFC data
layouts, workload generation, scan-metric instrumentation) re-expressed
Spark-first, plus large-scale training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing).

Architecture notes (vs the reference at /root/reference):
- The reference delegates physical layout work (Z-order / Hilbert clustering,
  file skipping) to Delta/Hudi/Iceberg engine extensions.  Here that work is
  native Spark: SFC keys are vectorized pandas_udf kernels, clustering is
  ``repartitionByRange`` + ``sortWithinPartitions``, and file skipping is a
  pre-scan pruner over a per-file min/max stats sidecar.
- All query surface is plain DataFrame / Spark SQL so Catalyst does pushdown,
  pruning, join selection and AQE for free.
"""

__version__ = "0.1.0"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
