"""Fixture table IO.

The driver's parquet fixtures store some timestamps at nanosecond
precision, which the Spark vectorized parquet reader rejects
(PARQUET_TYPE_ILLEGAL).  We read those columns as raw int64
(`spark.sql.legacy.parquet.nanosAsLong`, runtime-settable) and convert
to TimestampType with exact integer `div 1000` truncation — matching
DuckDB's ns→us truncation so oracle comparisons agree bit-for-bit.

Column detection reads only the parquet footer (driver-side, O(1)).
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pyarrow.types as patypes
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table; ns-timestamp columns arrive as int64
    (``spark.sql.legacy.parquet.nanosAsLong`` is set at session build —
    session.py) and are converted here with exact integer truncation.
    The table may be a single file (driver fixtures) or a directory of
    part files (derived/stress tables)."""
    import glob
    import os

    path = f"{sf_dir}/{name}.parquet"
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        # Defensive for externally-built sessions (e.g. the driver's):
        # this is the one config the fixture reader cannot do without.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled", "true") != "false":
        # Naive us-precision fixture timestamps must read as TimestampType
        # (UTC session), not TIMESTAMP_NTZ, for a stable envelope schema.
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(path)
    schema_file = path
    if os.path.isdir(path):
        parts = sorted(glob.glob(f"{path}/*.parquet"))
        if not parts:
            return df  # empty directory table: nothing to convert
        schema_file = parts[0]
    for field in pq.read_schema(schema_file):
        if patypes.is_timestamp(field.type) and field.type.unit == "ns":
            df = df.withColumn(field.name, F.timestamp_micros(F.expr(f"`{field.name}` div 1000")))
    return df
