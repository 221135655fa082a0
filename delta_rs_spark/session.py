"""SparkSession factory with scale-appropriate defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]``; the conf choices are the
ones that transfer to a real cluster: AQE on (runtime re-plan, skew-join
splitting, partition coalescing), shuffle partitions sized to the
parallelism, Arrow enabled for any pandas-UDF path, UTC session timezone so
timestamp semantics match the oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "delta_rs_spark", extra_conf: dict | None = None) -> SparkSession:
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # size-based coalescing, not parallelism-first: post-shuffle partitions
        # target advisoryPartitionSizeInBytes (the cluster-recommended setting);
        # with the default "true" AQE never coalesces below the core count, so
        # a 2 KB candidate shuffle still launches 32 tasks
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # scan-node metadata (ReadSchema/PushedFilters/Location) truncates at
        # 100 chars by default, which blinds the plan-audit column-pruning
        # check on any table wider than a few columns
        .config("spark.sql.maxMetadataStringLength", "10000")
        # µs int64 timestamps (not legacy INT96): Delta-correct and keeps
        # parquet footer min/max stats usable for file skipping
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # files with INT64 TIMESTAMP(NANOS) columns (unsupported by Spark)
        # surface as long; sources/tables.py converts to µs timestamps
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        .config("spark.sql.parquet.datetimeRebaseModeInRead", "CORRECTED")
        .config("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
