"""History-shaped consumers of the change stream: slowly-changing-
dimension (type 2) interval building and net-change compaction
between two offsets.

Both are standard downstream uses of a CDC feed (the reference's
stream stops at per-event delta rows — `rows-delta-type`,
src/cdc/jdbc.clj:104-115; these operators answer the two questions a
warehouse consumer asks of that feed: "give me every version with its
validity window" and "give me the minimal delta set between T1 and
T2").

Scale notes are per-function; both are single-shuffle plans keyed on
(db, tbl, id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mysql_cdc_spark.model import DT_DELETE, DT_UPDATE_BEFORE


def scd2_intervals(rows_dt: DataFrame) -> DataFrame:
    """Type-2 dimension build: one row per version of each key with
    its validity interval [valid_from, valid_to) in offset space.

    Every state-setting event (insert / update after-image) opens a
    version; the NEXT event on the same key (including a delete)
    closes it.  Deletes emit no version of their own — they only
    terminate the previous interval — so `valid_to IS NULL` iff the
    version is current.

    Scale: one shuffle on (db, tbl, id) + a per-key ordered window
    for `lead(offset)`.  Unlike latest-state (which we keep as a
    max(struct) aggregate precisely to avoid windows), SCD2's OUTPUT
    is every version, so the window materializes nothing beyond what
    it must emit; per-key cost is bounded by that key's version
    count.  At 100 TB, write the result bucketed by the key so
    incremental rebuilds join co-located.
    """
    w = Window.partitionBy("db", "tbl", "id").orderBy("offset")
    return (
        rows_dt.filter(F.col("_delta_type") != DT_UPDATE_BEFORE)
        .withColumn("valid_to", F.lead("offset").over(w))
        .filter(F.col("_delta_type") != DT_DELETE)
        .select(
            "db",
            "tbl",
            "id",
            "value",
            F.col("offset").alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )


def net_changes(rows_dt: DataFrame, bounds: DataFrame | tuple[int, int]) -> DataFrame:
    """Minimal delta set between two offsets: for each key touched in
    (lo, hi], ONE row classifying the net effect against the state as
    of lo — `insert` (absent → present), `delete` (present → absent),
    `update` (present → present with a different value).  Keys whose
    value round-trips back to the lo-state produce no row (net noop),
    which is the point of compaction: replaying the net set on top of
    state@lo yields state@hi exactly.

    `bounds` is either a literal `(lo, hi)` offset pair or a one-row
    DataFrame with columns `lo`/`hi` (broadcast — lets callers derive
    cutoffs from the stream itself while keeping one job).

    Scale: a single map-side-combined aggregate per key computing two
    conditional max(struct)s (state-before and state-at-hi) in one
    pass — one shuffle on (db, tbl, id), O(1) state per key, no
    window, no self-join.  With literal offsets the `offset <= hi`
    filter pushes into the parquet scan as a row-group prune.
    """
    ev = rows_dt.filter(F.col("_delta_type") != DT_UPDATE_BEFORE)
    if isinstance(bounds, tuple):
        lo_c, hi_c = F.lit(bounds[0]), F.lit(bounds[1])
    else:
        ev = ev.join(F.broadcast(bounds))
        lo_c, hi_c = F.col("lo"), F.col("hi")
    img = F.struct("offset", "value", "_delta_type")
    per_key = (
        ev.filter(F.col("offset") <= hi_c)
        .groupBy("db", "tbl", "id")
        .agg(
            F.max(F.when(F.col("offset") <= lo_c, img)).alias("pre"),
            F.max(img).alias("cur"),
            F.max(F.when(F.col("offset") > lo_c, F.lit(1)).otherwise(F.lit(0))).alias("touched"),
        )
        .filter(F.col("touched") == 1)
    )
    existed = F.col("pre").isNotNull() & (F.col("pre._delta_type") != DT_DELETE)
    exists = F.col("cur._delta_type") != DT_DELETE
    return (
        per_key.withColumn(
            "net_op",
            F.when(~existed & exists, F.lit("insert"))
            .when(existed & ~exists, F.lit("delete"))
            .when(existed & exists & (F.col("pre.value") != F.col("cur.value")), F.lit("update")),
        )
        .filter(F.col("net_op").isNotNull())
        .select(
            "db",
            "tbl",
            "id",
            "net_op",
            F.when(existed, F.col("pre.value")).alias("old_value"),
            F.when(exists, F.col("cur.value")).alias("new_value"),
        )
    )


def schema_evolution(changes: DataFrame) -> DataFrame:
    """Schema-version timeline per table, folded from DDL events.

    The reference's schema system is *dynamic*: the live column set is
    whatever the stream has declared so far (SURVEY §1.4; reference
    discovers schema from the stream rather than a catalog).  This
    operator materializes that idea for ALTER TABLE ADD/DROP COLUMN
    statements: every DDL event becomes one schema version carrying the
    net presence of its column and the table's dynamic-column count
    after the statement.

    Pure integer window algebra — exact on any engine:

      net_after(db,tbl,col)  = Σ ±1 over that column's DDLs ≤ offset
      present Δ              = [net_after > 0] − [net_before > 0]
      n_extra_cols(db,tbl)   = Σ presence Δ over the table's DDLs ≤ offset

    (A DROP of a never-added column drives net negative; presence
    stays false and the count is unaffected — re-ADDs then count from
    the correct baseline.)

    Scale: DDLs are a vanishing fraction of a binlog; both windows run
    on the filtered DDL set only, keyed by table — bounded partitions
    regardless of total log size.
    """
    ddl = changes.where(
        (F.col("op") == "query") & F.col("sql").rlike("^ALTER TABLE ")
    ).select(
        "offset",
        "db",
        "tbl",
        F.regexp_extract("sql", r" (ADD|DROP) COLUMN ", 1).alias("action"),
        F.regexp_extract("sql", r" (ADD|DROP) COLUMN (\w+)", 2).alias("col"),
    )
    signed = ddl.withColumn(
        "delta", F.when(F.col("action") == "ADD", F.lit(1)).otherwise(F.lit(-1))
    )
    col_w = (
        Window.partitionBy("db", "tbl", "col")
        .orderBy("offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_net = signed.withColumn("net_after", F.sum("delta").over(col_w).cast("bigint"))
    present_after = (F.col("net_after") > 0).cast("bigint")
    present_before = ((F.col("net_after") - F.col("delta")) > 0).cast("bigint")
    with_presence = with_net.withColumn("presence_delta", present_after - present_before)
    tbl_w = (
        Window.partitionBy("db", "tbl")
        .orderBy("offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return with_presence.select(
        "offset",
        "db",
        "tbl",
        "action",
        "col",
        "net_after",
        F.sum("presence_delta").over(tbl_w).cast("bigint").alias("n_extra_cols"),
    )


def scd2_lookup(rows_dt: DataFrame) -> DataFrame:
    """Point-in-time dimension lookup against the SCD2 version table:
    for every state-setting change event, find the version of its key
    that was valid JUST BEFORE the event — the "enrich a fact with the
    dimension as it was at fact time" join every warehouse consumer of
    an SCD2 table runs.

    Join shape: LEFT join with the key equality (db, tbl, id) as the
    equi-component — ONE shuffle each side — and the interval
    predicate as a join filter.  This is NOT an all-pairs range join:
    the equi-key bounds candidates to one key's version history, and
    per-key intervals are disjoint, so at most one version matches.
    (Contrast ts_range_join, which has no equi-key and must bucket
    time instead.)  Events with no prior version — first inserts,
    re-inserts after a delete — keep NULL priors.
    """
    facts = rows_dt.filter(F.col("_delta_type") != DT_UPDATE_BEFORE).select(
        "db", "tbl", "id", "offset", "_delta_type", F.col("value").alias("new_value")
    )
    versions = scd2_intervals(rows_dt).select(
        F.col("db").alias("v_db"),
        F.col("tbl").alias("v_tbl"),
        F.col("id").alias("v_id"),
        F.col("value").alias("prior_value"),
        "valid_from",
        "valid_to",
    )
    cond = (
        (F.col("db") == F.col("v_db"))
        & (F.col("tbl") == F.col("v_tbl"))
        & (F.col("id") == F.col("v_id"))
        & (F.col("valid_from") < F.col("offset"))
        & F.col("valid_to").isNotNull()
        & (F.col("offset") <= F.col("valid_to"))
    )
    return facts.join(versions, cond, "left").select(
        "db", "tbl", "id", "offset", "_delta_type", "new_value",
        "prior_value", "valid_from",
    )
