"""Transaction-level operators over the change stream.

The reference interleaves XID commit events in the stream (reference
src/cdc/mysql_binlog.clj:393-394): a transaction is the contiguous
offset block ENDING at its xid event, and offsets are strictly
increasing (:914-916).  The general tagging rule is therefore

    txn(e) = number of xid events at offsets strictly below e.offset

— every event between two commits (inclusive of the closing xid) gets
the same block id, for transactions of ANY size.  (Round 1 hard-coded
``offset div 4``, which only held for the synthetic fixture's
4-events-per-statement shape — mysql_bench.clj:248-249 is an observed
invariant of single-row statements, not a format guarantee.)

Scale: the running xid count is a chunked distributed prefix scan
(functions/scan.py) — per-chunk windows with a tiny cross-chunk carry,
never a single-task global window.  The per-transaction groupBy
shuffles on txn — a high-cardinality, uniformly distributed sequence
number, so no skew; AQE coalesces the post-shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mysql_cdc_spark.functions.scan import running_agg
from mysql_cdc_spark.model import OP_UPDATE_ROWS, OP_XID, ROW_OPS


def with_txn(env: DataFrame) -> DataFrame:
    """Tag every event with its transaction block id (count of xid
    commits strictly before it in the log)."""
    is_xid = f"CAST(CASE WHEN op = '{OP_XID}' THEN 1 ELSE 0 END AS BIGINT)"
    out = running_agg(env, "offset", is_xid, "txn", inclusive=False)
    return out.withColumn("txn", F.col("txn").cast("bigint"))


def events_per_transaction(env: DataFrame) -> DataFrame:
    """Assemble transactions: event count, offset span, commit xid.

    Over the derived fixture stream this reproduces the reference's
    binlog4 invariant (4 events per single-row statement,
    mysql_bench.clj:252-258): `n_events` is 4 for every transaction —
    but the grouping itself is xid-boundary-general (see module doc).

    Projected to the three needed columns BEFORE the prefix scan, so
    the chunk window sorts narrow rows, not the full envelope.
    """
    return (
        with_txn(env.select("offset", "xid", "op"))
        .groupBy("txn")
        .agg(
            F.expr("CAST(count(1) AS BIGINT) AS n_events"),
            F.expr("min(`offset`) AS first_offset"),
            F.expr("max(`offset`) AS last_offset"),
            F.expr("max(xid) AS xid"),
            F.expr(
                f"CAST(max(CASE WHEN op = '{OP_UPDATE_ROWS}' THEN 1 "
                "ELSE 0 END) AS BIGINT) AS has_update"
            ),
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
    """Attach the commit xid to every row event of its transaction.

    Single-pass form: after txn tagging, the commit xid is a window
    MAX over the (tiny, per-transaction) partition — no self-join, one
    shuffle on the uniform txn key.  Row events of uncommitted trailing
    transactions (no xid yet) are dropped, matching the reference's
    delivery unit of "events up to the last complete commit".
    """
    tagged = with_txn(env)
    w = Window.partitionBy("txn")
    return (
        tagged.withColumn("commit_xid", F.max("xid").over(w))
        .filter(F.col("op").isin(*ROW_OPS) & F.col("commit_xid").isNotNull())
        .select(
            "offset", "txn", "db", "tbl", "op",
            "before_id", "before_value", "after_id", "after_value",
            "commit_xid",
        )
    )
