"""SparkSession construction with scale-aware defaults.

The reference builds one client per sink cluster with pooled transports
(connector.go:257-276); our equivalent of "transport tuning" is Spark conf:
AQE on (runtime skew-join splitting), Arrow enabled for pandas UDFs, zstd
parquet (the analogue of the reference's gzip request compression,
config/config.go:37).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_local_dirs() -> str | None:
    """Prefer tmpfs for shuffle/spill in local mode: the sandbox has ONE
    physical disk, so disk-backed shuffle is a core-count-independent
    bottleneck that a real cluster (per-executor local disks) doesn't
    have. Overridable via SPARK_LOCAL_DIRS."""
    if os.environ.get("SPARK_LOCAL_DIRS"):
        return None  # Spark reads the env var itself
    # opt-in only: measured on this sandbox, tmpfs shuffle did NOT beat the
    # disk path (page-cache already absorbs it; tmpfs steals cache memory)
    if os.environ.get("SPARK_GRAFT_TMPFS") != "1":
        return None
    shm = "/dev/shm"
    if os.path.isdir(shm) and os.access(shm, os.W_OK):
        d = os.path.join(shm, "spark-local")
        os.makedirs(d, exist_ok=True)
        return d
    return None


def get_spark(
    app_name: str = "fulltext-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for the index pipeline.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (driver contract);
    on a real cluster callers pass nothing and spark-submit supplies it.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(int(cpus) * 2, 8)
        except ValueError:
            shuffle_partitions = 64

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # NOTE: spark.sql.parquet.pushdown.inFilterThreshold stays at its
        # default (10). Raising it pushes large In lists into the parquet
        # reader as a deeply-nested OR-of-Eq chain that overflows the JVM
        # stack (measured: a 1000-value In(kh,...) threw StackOverflowError
        # in FileScanRDD; tasks retried for ~50s per job). Large key lists
        # are evaluated catalyst-side as a vectorized InSet instead; the
        # keymap relies on _kb partition pruning for its O(delta) read.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    local_dirs = _default_local_dirs()
    if local_dirs:
        builder = builder.config("spark.local.dir", local_dirs)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def tiny_df(spark: SparkSession, rows: list, schema: str):
    """DataFrame from a SMALL driver-side row list in ONE partition.

    ``spark.createDataFrame(rows)`` fans the rows across
    defaultParallelism slices, and any job over the result then pays one
    Python-worker roundtrip PER parent partition — measured ~3.7 s to
    write 32 rows at local[32] vs 0.3 s with a single slice. Every tiny
    control-plane table (stats partials, mirror meta) goes through here."""
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
