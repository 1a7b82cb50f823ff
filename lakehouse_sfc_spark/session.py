"""SparkSession factory tuned for the local[32] harness but configured the
way a 1000-executor cluster run would be: AQE on (runtime re-planning, skew
join handling, partition coalescing), broadcast threshold sized for dimension
tables, shuffle parallelism tied to cores (overridable per cluster), and
Arrow enabled for the vectorized Python boundary.

Mirrors the reference session knobs at
``lakehouse_op/run_queries.py:40-62`` (AQE, maxPartitionBytes=256m,
vectorized parquet reader) without any lakehouse-engine extensions.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "lakehouse_sfc_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = default_parallelism()
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Runtime re-planning: coalesce small shuffle partitions, split skewed
        # ones — at 100 TB this is what keeps a bad static plan from stalling.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        # Scan split sizing (reference: run_queries.py:54).
        .config("spark.sql.files.maxPartitionBytes", "256m")
        .config("spark.sql.parquet.enableVectorizedReader", "true")
        # Dimension tables up to 50 MB broadcast (reference: run_queries.py:724).
        .config("spark.sql.autoBroadcastJoinThreshold", str(50 * 1024 * 1024))
        # Arrow for every Python<->JVM crossing (pandas_udf kernels).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
    )
    # Shuffle spill dir on tmpfs when available: this box's /tmp block device
    # stalls erratically under concurrent shuffle writes (measured 8–70 s for
    # the IDENTICAL 93M-row exchange+agg; steady ~7 s on /dev/shm), while a
    # production executor shuffles to local NVMe.  RAM is 4x any local
    # workload's shuffle volume, and the env override restores the default.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        # Capacity gate: shuffle spill exists precisely to exceed RAM, so a
        # blanket tmpfs default would turn disk-spill runs into ENOSPC on
        # small-RAM hosts.  Only prefer /dev/shm when it has >=32 GiB free
        # (this box: 64 GiB tmpfs on 128 GiB RAM, local workloads shuffle
        # <8 GiB).  SPARK_GRAFT_LOCAL_DIR overrides either way ("" = force
        # the Spark default /tmp).
        try:
            st = os.statvfs("/dev/shm")
            if st.f_bavail * st.f_frsize >= 32 << 30:
                local_dir = "/dev/shm/spark-graft-local"
        except OSError:
            pass
    if local_dir:
        os.makedirs(local_dir, exist_ok=True)
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
