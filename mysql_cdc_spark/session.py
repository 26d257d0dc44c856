"""Tuned SparkSession builder.

Defaults are chosen for the local[32] test harness but the same knobs
are the ones that matter on a real cluster: AQE (runtime re-planning,
skew-join splitting, partition coalescing) and a shuffle-partition
count sized to the parallelism at hand.  At 100 TB you would raise
``spark.sql.shuffle.partitions`` (or let AQE coalesce from a high
initial number) and rely on the same declarative plans.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "mysql-cdc-spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # AQE: runtime partition coalescing + skew-join handling. On a
        # 1000-executor cluster this is what keeps a skewed CDC key or a
        # hot dedup band from stalling a stage.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", cpus)
        # Input-split sizing: 128 MiB splits keep scan tasks uniform; at
        # 100 TB that is ~800k splits — raise alongside executor count
        # so task count stays ~2-3× total cores.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # Arrow for any pandas-UDF path (similarity / multimodal).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Driver fixtures store ns-precision timestamps; read them as raw
        # int64 everywhere (sources/io.py converts with exact `div 1000`).
        # Set once here so per-read code never mutates session config.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Fixtures also carry naive us-precision timestamps; read them as
        # TimestampType (session tz = UTC, values unchanged) rather than
        # TIMESTAMP_NTZ so the envelope schema is stable across fixture
        # precision changes.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
    )
    return builder.getOrCreate()
