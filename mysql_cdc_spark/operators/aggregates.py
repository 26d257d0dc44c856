"""Consumer-side aggregates the reference demonstrates in its harness,
plus the state-reconstruction op a CDC consumer actually needs.

A1 running sum over update stream — reference `reduce-events`,
   src/cdc/mysql_bench.clj:316-334 (filter UPDATE → after-image value →
   running +).
A2 all-after-images-equal invariant — `check-read-data`, :138-148.
A3 count — `big-table-count`, :99-101.
DDL alert — the reference's planned schema-change watch on QUERY
   events (design note src/cdc/mysql_binlog.clj:975-976).
Latest-state — replay the change stream into current table state
   (last image per key wins; delete removes the row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mysql_cdc_spark.model import DT_DELETE, DT_UPDATE, OP_QUERY


def running_sum(rows_dt: DataFrame) -> DataFrame:
    """A1: cumulative sum of after-image `value` over update rows,
    ordered by offset.

    Scale note: a global running sum is inherently a prefix-scan; the
    window over an unpartitioned ORDER BY collapses to one task. For
    the bench-scale stream that is fine; at 100 TB the consumer would
    keep the per-microbatch partial (`groupBy().sum()` with
    outputMode=update — see streaming/runtime.py) instead of a global
    ordered prefix. Both are provided; this one matches the
    reference's semantics exactly.
    """
    w = Window.orderBy("offset").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        rows_dt.filter(F.col("_delta_type") == DT_UPDATE)
        .select(
            "offset",
            "id",
            "value",
            F.sum("value").over(w).alias("running_sum"),
        )
    )


def update_sum(rows_dt: DataFrame) -> DataFrame:
    """A1 scalable form: total of after-image values per (db, tbl) —
    the per-batch partial a streaming consumer accumulates."""
    return (
        rows_dt.filter(F.col("_delta_type") == DT_UPDATE)
        .groupBy("db", "tbl")
        .agg(
            F.sum("value").alias("sum_value"),
            F.count(F.lit(1)).cast("bigint").alias("n_updates"),
        )
    )


def all_equal_check(rows_dt: DataFrame) -> DataFrame:
    """A2: per (db, tbl), are all update after-images equal?

    The reference reduces pairwise equality over decoded after-images
    (mysql_bench.clj:138-148); the distributed form is min==max /
    distinct-count==1 — one shuffle on a tiny key space.
    """
    return (
        rows_dt.filter(F.col("_delta_type") == DT_UPDATE)
        .groupBy("db", "tbl")
        .agg(
            F.count_distinct("value").cast("bigint").alias("n_distinct"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            (F.min("value") == F.max("value")).alias("all_equal"),
        )
    )


def count_changes(rows_dt: DataFrame) -> DataFrame:
    """A3: row-change counts per (db, tbl, _delta_type)."""
    return (
        rows_dt.groupBy("db", "tbl", "_delta_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def ddl_alerts(env: DataFrame) -> DataFrame:
    """Schema-change alerting: QUERY events whose SQL is DDL
    (reference design note mysql_binlog.clj:975-976).

    The op filter and the rlike both push toward the scan; this is a
    narrow filter+project — no shuffle.
    """
    return env.filter(
        (F.col("op") == OP_QUERY)
        & F.col("sql").rlike("^(ALTER|CREATE|DROP) ")
    ).select("offset", "ts", "db", "tbl", "sql")


def latest_state(rows_dt: DataFrame) -> DataFrame:
    """Replay the change stream into current state: for each
    (db, tbl, id) take the image with the highest offset, preferring
    the post-image of an update pair; drop keys whose last change is a
    delete.

    Scale note: one shuffle on (db, tbl, id) — the natural partitioning
    for CDC materialization; at 100 TB you'd bucket the sink by the
    same key so repeated replays stay co-located. `update-before`
    images are excluded up front so the window only ranks real images
    (filter is pushed below the shuffle).
    """
    w = Window.partitionBy("db", "tbl", "id").orderBy(F.col("offset").desc())
    return (
        rows_dt.filter(F.col("_delta_type") != "update-before")
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("_delta_type") != DT_DELETE))
        .select("db", "tbl", "id", "value", F.col("offset").alias("as_of_offset"))
    )
