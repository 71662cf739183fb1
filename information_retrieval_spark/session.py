"""SparkSession factory tuned for this engine.

Local-mode testing uses ``local[N]``; the same config block is what we'd ship
to a real cluster via ``spark-submit --py-files`` (AQE on, Arrow on, sensible
shuffle partitioning). Nothing here is sandbox-specific.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "information_retrieval_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Parameters mirror what a cluster deployment would set via spark-submit;
    in the sandbox we default to ``local[$SPARK_GRAFT_CPUS or *]``.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    # Make this package importable in executor Python workers regardless of
    # the driver's cwd (pandas-UDF closures reference it by module path).
    # On a real cluster the equivalent is `spark-submit --py-files engine.zip`.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pythonpath = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pythonpath.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + pythonpath if pythonpath else "")
        )

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # scan split sizing is left at defaults ON PURPOSE: Spark plans
        # maxSplitBytes = min(maxPartitionBytes, max(openCostInBytes,
        # totalBytes/defaultParallelism)), so file scans already split to
        # ~one partition per core for this engine's table sizes. Raising
        # openCostInBytes (tried) is a trap — it acts as a MINIMUM split
        # size and collapses single-file scans to one task.
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # local mode: the driver heap hosts all executor threads — size it
        # for the core count (8g across 32 pack tasks holding Arrow batches
        # + binary blocks showed GC-bound wall-clock noise at local[32])
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
