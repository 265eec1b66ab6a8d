"""Pluggable table IO: parquet in the sandbox, Iceberg on a cluster.

Every read/write in the engine funnels through these two functions so the
storage format is a deployment decision, not an operator concern. The
sandbox has no Iceberg runtime jar, so the default is parquet datasets;
setting ``SPARK_GRAFT_TABLE_FORMAT=iceberg`` (plus the usual catalog
configs on the SparkSession) switches every call site to Iceberg tables,
where the manifest/resume protocol (operators/manifest.py) upgrades to
manifest rows committed in the same transaction as the data append.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def table_format() -> str:
    return os.environ.get("SPARK_GRAFT_TABLE_FORMAT", "parquet")


def read_table(spark: SparkSession, target: str) -> DataFrame:
    """Read a table: a filesystem path (parquet dataset) or, under the
    iceberg format, a catalog table name."""
    fmt = table_format()
    if fmt == "iceberg" and not target.startswith(("/", "file:", "s3:", "hdfs:")):
        return spark.read.format("iceberg").load(target)
    return spark.read.parquet(target)


def write_table(df: DataFrame, target: str, mode: str = "overwrite") -> None:
    fmt = table_format()
    if fmt == "iceberg" and not target.startswith(("/", "file:", "s3:", "hdfs:")):
        df.write.format("iceberg").mode(mode).save(target)
        return
    df.write.mode(mode).parquet(target)
