"""SparkSession factory with engine-wide tuning (SURVEY.md §4.4).

All sessions: AQE on, Arrow transport on, UTC timestamps (oracle parity),
shuffle partitions sized to the core count.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    master: str | None = None,
    app_name: str = "mvt-engine",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cores = default_parallelism()
    master = master or f"local[{cores}]"
    shuffle = shuffle_partitions or 2 * cores
    # glibc tunables for the Python workers (inherited via the JVM child
    # process): without these, every large numpy buffer is a fresh
    # mmap/fault/zero/munmap cycle — measured 9x slower vectorized encode
    # inside workers on this kernel. Keep freed memory in the arena instead.
    if os.environ.get("SPARK_GRAFT_MALLOC_TUNE", "1") != "0":
        os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
        os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "-1")
        # pyarrow's jemalloc pool returns pages to the OS between batches;
        # on this VM every first touch of a page costs ~0.4ms (lazy-loaded
        # guest memory), so per-batch Arrow buffers re-fault constantly.
        # The system pool rides the retained glibc arena instead (4x faster
        # buffer churn measured in-worker).
        os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")
    return (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 16k-row Arrow batches: the encode stage's working set then fits
        # the retained glibc arena of the FIRST batch, so later batches
        # re-use already-faulted pages instead of first-touching fresh ones
        # (BENCH/encode_probe.py: chunked cold encode 1.66s@8 -> 0.97s@32
        # vs unchunked 2.52 -> 3.19 REGRESSING; Spark A/B at both core
        # counts confirms ~30-40% faster encode stage vs 64k batches).
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_GRAFT_ARROW_BATCH", "16384"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
