"""SparkSession factory with scale-oriented defaults.

The engine is designed for a multi-hundred-executor cluster reading ~100 TB;
tests run on ``local[N]``. Every setting here is a cluster-safe default:

- AQE on (runtime re-planning, skew-join splitting, partition coalescing)
- Arrow on (Pandas-UDF extension points use Arrow batches, never per-row)
- session timezone UTC (the reference normalizes all timestamps to UTC:
  connectors/sources/mariadb/trading.json:52 ``database.connectionTimeZone``)
- shuffle partitions sized from the env, not hardcoded to a laptop value
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "cdc-connector-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    On a real cluster ``master`` comes from spark-submit; locally we default
    to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = default_parallelism()
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]"))

    conf = {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.shuffle.partitions": str(shuffle_partitions or cpus),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # parquet scans: keep pushdown + pruning on (defaults, pinned explicitly)
        "spark.sql.parquet.filterPushdown": "true",
        "spark.sql.parquet.aggregatePushdown": "true",
        # Python DataSource predicate pushdown (pgcopy source pushes WHERE
        # clauses into the database); off by default in Spark 4.1
        "spark.sql.python.filterPushdown.enabled": "true",
        # broadcast threshold: small dims (region/nation/supplier) always broadcast
        "spark.sql.autoBroadcastJoinThreshold": "64m",
        "spark.sql.files.maxPartitionBytes": "128m",
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        "spark.ui.enabled": "false",
        "spark.sql.ansi.enabled": "false",
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
