"""Bucketed sinks: co-located storage for repeated replays/joins.

The scale notes throughout this engine say "bucket the sink by the
key" — this is that sink.  Writing a table bucketed (and sorted) by
its join/group key means every later equi-join or aggregation on that
key reads pre-partitioned, pre-sorted buckets: NO exchange, NO sort in
the plan (Spark's bucketed SortMergeJoin).  At 100 TB this converts
the dominant shuffle of a replay-join pipeline into a pure scan.

Local caveat: bucketing requires a managed table (saveAsTable → the
session's warehouse dir); bucket counts should be sized so one bucket
≈ one task's worth of data at the deployment's scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, keys: list[str], n_buckets: int = 8
) -> None:
    """Persist `df` as a managed table bucketed+sorted by `keys`."""
    (
        df.write.bucketBy(n_buckets, *keys)
        .sortBy(*keys)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(spark: SparkSession, left: str, right: str, keys: list[str]) -> DataFrame:
    """Join two tables bucketed on the same keys — shuffle-free when
    bucket specs match (verify with .explain: no Exchange)."""
    return spark.table(left).join(spark.table(right), keys)
