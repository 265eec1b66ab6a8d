"""SparkSession factory with scale-appropriate defaults.

Tuned for the sandbox (local[N], single JVM) but written for a
1000-executor cluster: AQE on (runtime shuffle re-planning + skew-join
splitting), Arrow transport for every pandas UDF boundary, bounded Arrow
batch sizes so a mega-turn batch cannot blow Python worker memory, and
shuffle partitions sized to cores (overridable per job at real scale).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "pdf-parser-spark", cpus: str | None = None) -> SparkSession:
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle_parts = max(32, int(cpus) * 2) if str(cpus).isdigit() else 64
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_parts))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
