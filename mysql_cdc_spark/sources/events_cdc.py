"""Deterministic change-event stream derived from the `events` fixture.

The reference engine's input is a MySQL binlog: an ordered stream of
(QUERY, TABLE_MAP, WRITE/UPDATE/DELETE_ROWS, XID) events — one
single-row UPDATE statement produces exactly those 4 events (reference
src/cdc/mysql_bench.clj:248-249).  No binlog exists in the test
fixtures, so we *derive* an equivalent stream deterministically from
the driver's `events` parquet table: every source event becomes one
transaction of 4 binlog events, giving us the reference's exact stream
shape (4-events-per-statement, offsets, rotation, xids) in a form both
Spark and the DuckDB oracle can compute.

Derivation rules (shared contract between `changes()` and CHANGES_SQL —
keep the two in lockstep):

  per events row (event_id, ts, user_id, event_type, value):
    db   = 'foo'  if user_id % 2 = 0 else 'bench'
    tbl  = 'auto' if user_id % 2 = 0 else 'big'      (FIXTURES.md §1-2)
    row_op = write_rows  if event_type in (signup, purchase)
             update_rows if event_type in (click, view)
             delete_rows otherwise (error)
    row_id = event_id % 97           (key collisions → latest-state op)
    emit 4 envelope events with seq 0..3:
      seq 0  op=query      sql = DDL text when event_id % 50 = 0
                                 else the matching DML template
      seq 1  op=table_map
      seq 2  op=<row_op>   images: write  → after  = (row_id, value)
                                   update → before = (row_id, value-1.0),
                                            after  = (row_id, value)
                                   delete → before = (row_id, value)
      seq 3  op=xid        xid = event_id
    offset   = event_id * 4 + seq    (strictly increasing, per §1.5)
    log_file = printf('binlog.%06d', event_id // 250000)   (rotation)
    server_id = 1

Scale note: the Spark side is ONE parquet scan + a 4-way sequence
explode and a plain projection — a narrow, fully codegen'd stage with
no shuffle; at 100 TB it parallelizes per input split.  The envelope
columns are computed in a normal Project ABOVE the generator (not
inside an `inline(array(struct(...)))`): Catalyst cannot prune struct
fields through a generator, so the inline formulation paid for all 13
envelope expressions (format_string, SQL-text concat, ...) even in
queries that read three columns; with the projection form, column
pruning deletes the unused expressions outright (verified in
`.explain`).  The oracle side is a 4-way UNION ALL (clarity over speed
— the oracle only ever runs at sf0.01).

Small-input rebalance: a fixture file below one split
(`maxPartitionBytes`) is a single parquet row group — the scan cannot
parallelize no matter the config, and the 4× explode amplifies inside
that one task.  When (and only when) the input is too small to split
naturally, the cheap pre-explode rows are hash-repartitioned by
`event_id` across the session's parallelism.  At production scale the
file count/size clears the threshold and no extra shuffle exists.
(Hash, not round-robin: RoundRobinPartitioning sorts every column of
every row first — `spark.sql.execution.sortBeforeRepartition` — which
measured 5× slower end-to-end.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_cdc_spark.model import (
    DT_DELETE,
    DT_INSERT,
    DT_UPDATE,
    DT_UPDATE_BEFORE,
    OP_DELETE_ROWS,
    OP_UPDATE_ROWS,
    OP_WRITE_ROWS,
    ROW_OPS,
)

# Typed NULL literals (functions, not module constants: building a
# Column requires an active SparkContext, which may not exist at import
# time under pytest collection).
def _NULL_ID():
    return F.lit(None).cast("bigint")


def _NULL_VAL():
    return F.lit(None).cast("double")


def _rebalance_small_input(spark: SparkSession, df: DataFrame, path: str) -> DataFrame:
    """Hash-repartition the pre-explode rows iff the file is too small
    for the scan to split on its own (see module docstring).  Driver-side
    O(1): one stat call, no job."""
    import os

    try:
        max_bytes = int(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
    except ValueError:
        max_bytes = 134217728
    parallelism = spark.sparkContext.defaultParallelism
    natural_splits = max(1, os.path.getsize(path) // max_bytes)
    if natural_splits < parallelism // 2:
        return df.repartition(parallelism, "event_id")
    return df


def _ev_projected(spark: SparkSession, sf_dir: str, rebalance: bool) -> DataFrame:
    """The shared pre-explode projection of the events fixture
    (derivation rules §: db/tbl/row_id/row_op/value), optionally
    rebalanced for one-split inputs.  Used by both `changes` (the full
    4-event envelope) and `rows_changes` (the row-delta fast path)."""
    from mysql_cdc_spark.sources.io import read_table

    ev = read_table(spark, sf_dir, "events").selectExpr(
        "event_id",
        "ts",
        "CASE WHEN user_id % 2 = 0 THEN 'foo' ELSE 'bench' END AS db",
        "CASE WHEN user_id % 2 = 0 THEN 'auto' ELSE 'big' END AS tbl",
        "CAST(event_id % 97 AS BIGINT) AS row_id",
        "CASE WHEN event_type IN ('signup','purchase') THEN "
        f"'{OP_WRITE_ROWS}' WHEN event_type IN ('click','view') THEN "
        f"'{OP_UPDATE_ROWS}' ELSE '{OP_DELETE_ROWS}' END AS row_op",
        "value",
    )
    if rebalance:
        ev = _rebalance_small_input(spark, ev, f"{sf_dir}/events.parquet")
    return ev


def rows_changes(
    spark: SparkSession,
    sf_dir: str,
    rebalance: bool = False,
    update_pairs: bool = True,
) -> DataFrame:
    """``rows_delta_type(changes(...))`` computed WITHOUT the 4-way
    envelope explode (r19 optimization): only the seq-2 row event of
    each statement frame carries delta rows, and its offset is
    ``event_id*4 + 2`` by the derivation rules — so the row-delta
    stream derives straight from the pre-explode events projection,
    skipping the Generate that fanned every event ×4 and the filter
    that immediately discarded 3 of the 4.  Row-identical to the
    explode form (pinned by tests/test_cdc_core.py parity test and by
    every rows_dt oracle gate; measured interleaved at sf0.1:
    update_sum 0.47→0.39 s min, 0.59→0.50 s median).  The envelope
    form (`changes` → `rows_delta_type`) remains THE path for real
    envelope sources (binlog scans, streams) — this fast path exists
    because batch rows_dt queries never look at the non-row events.

    ``update_pairs=False`` (r19) additionally drops the update-before
    retract images at the SOURCE: the result is row-identical to
    ``rows_changes(...).filter(_delta_type != 'update-before')`` (one
    after-image per event), but as a pure single-row projection — no
    inline() Generate at all.  Used by the latest-state family
    (latest_state / state_asof / scd2 / apply_changes and the
    update-only sums), all of which exclude or never select
    update-before rows; consumers of the retract algebra (ivm,
    count_changes, hot_keys, update_pairs) keep the pair form.

    ``rebalance`` defaults to False here (r20) — OPPOSITE of
    `changes()`.  The small-input rebalance exists to fan out the
    envelope's 4× explode + 13 heavy expressions; this fast path has
    neither (one light projection, at most a 2-row inline), and every
    rows_dt consumer aggregates or windows immediately after, whose
    own exchange redistributes anyway — so the extra exchange was pure
    cost.  Measured (interleaved on/off, min-of-4, all 11 rows_dt
    consumers, sf0.1 AND organic x10): off wins 1.4–2.9× everywhere
    (e.g. latest_state 0.60→0.31 s, scd2 0.63→0.25 s at sf0.1;
    ratios 0.38–0.54 at x10).  At production scale the flag is moot:
    the input splits naturally and the rebalance is a no-op either
    way."""
    ev = _ev_projected(spark, sf_dir, rebalance)

    if not update_pairs:
        return ev.selectExpr(
            "CAST(event_id * 4 + 2 AS BIGINT) AS offset",
            "format_string('binlog.%06d', CAST(event_id div 250000 AS INT)) AS log_file",
            "ts",
            "db",
            "tbl",
            "CAST(row_id AS BIGINT) AS id",
            "CAST(value AS DOUBLE) AS value",
            f"CASE WHEN row_op = '{OP_UPDATE_ROWS}' THEN '{DT_UPDATE}' "
            f"WHEN row_op = '{OP_WRITE_ROWS}' THEN '{DT_INSERT}' "
            f"ELSE '{DT_DELETE}' END AS _delta_type",
        )

    def img(val: str, tag: str) -> str:
        return (
            f"named_struct('id', CAST(row_id AS BIGINT), "
            f"'value', CAST({val} AS DOUBLE), '_delta_type', '{tag}')"
        )

    pair = (
        f"CASE WHEN row_op = '{OP_UPDATE_ROWS}' THEN array("
        f"{img('value - 1.0', DT_UPDATE_BEFORE)}, {img('value', DT_UPDATE)}) "
        f"WHEN row_op = '{OP_WRITE_ROWS}' THEN array({img('value', DT_INSERT)}) "
        f"ELSE array({img('value', DT_DELETE)}) END"
    )
    return ev.selectExpr(
        "CAST(event_id * 4 + 2 AS BIGINT) AS offset",
        "format_string('binlog.%06d', CAST(event_id div 250000 AS INT)) AS log_file",
        "ts",
        "db",
        "tbl",
        f"inline({pair})",
    )


def txn_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``transactions.events_per_transaction(changes(...))`` computed
    WITHOUT the explode, prefix scan, or groupBy (r19 optimization).

    By the derivation rules every source event emits exactly one
    transaction: its 4 envelope events occupy offsets ``event_id*4 ..
    event_id*4+3`` and its single xid commit (xid = event_id) sits at
    seq 3.  The general tagging rule — txn(e) = count of xids strictly
    below e.offset — therefore assigns txn = event_id to all 4 events
    (the closing xid of event k is at ``4k+3``, which is below
    ``4e+seq`` iff k < e for any seq in 0..3).  So the per-transaction
    summary is a pure projection of the pre-explode events scan: no
    Generate, no chunk-window prefix scan, no groupBy exchange.
    Row-identical to the general form (pinned by
    tests/test_scan_txn.py parity test and the cdc_txn_events oracle).
    The xid-boundary-general operator (`transactions.py`) remains THE
    path for real envelope sources (binlog scans, streams), whose
    transactions are NOT fixed-size.
    """
    ev = _ev_projected(spark, sf_dir, rebalance=False)
    return ev.selectExpr(
        "CAST(event_id AS BIGINT) AS txn",
        "CAST(4 AS BIGINT) AS n_events",
        "CAST(event_id * 4 AS BIGINT) AS first_offset",
        "CAST(event_id * 4 + 3 AS BIGINT) AS last_offset",
        "CAST(event_id AS BIGINT) AS xid",
        f"CAST(CASE WHEN row_op = '{OP_UPDATE_ROWS}' THEN 1 ELSE 0 END "
        "AS BIGINT) AS has_update",
    )


def committed_rows_direct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``transactions.committed_rows(changes(...))`` without the
    explode or the per-txn window (r19 optimization; same derivation
    argument as `txn_summary`): each transaction's single row event
    sits at offset ``event_id*4+2`` with txn = commit_xid = event_id,
    and the commit is always present (seq 3 exists for every event),
    so the uncommitted-tail filter drops nothing.  Row-identical to
    the general form (pinned by tests/test_scan_txn.py parity test and
    the cdc_committed_rows oracle)."""
    ev = _ev_projected(spark, sf_dir, rebalance=False)
    before_id = f"CASE WHEN row_op = '{OP_WRITE_ROWS}' THEN NULL ELSE row_id END"
    before_value = (
        f"CASE WHEN row_op = '{OP_WRITE_ROWS}' THEN NULL "
        f"WHEN row_op = '{OP_DELETE_ROWS}' THEN value ELSE value - 1.0 END"
    )
    after_id = f"CASE WHEN row_op = '{OP_DELETE_ROWS}' THEN NULL ELSE row_id END"
    after_value = f"CASE WHEN row_op = '{OP_DELETE_ROWS}' THEN NULL ELSE value END"
    return ev.selectExpr(
        "CAST(event_id * 4 + 2 AS BIGINT) AS `offset`",
        "CAST(event_id AS BIGINT) AS txn",
        "db",
        "tbl",
        "row_op AS op",
        f"CAST({before_id} AS BIGINT) AS before_id",
        f"CAST({before_value} AS DOUBLE) AS before_value",
        f"CAST({after_id} AS BIGINT) AS after_id",
        f"CAST({after_value} AS DOUBLE) AS after_value",
        "CAST(event_id AS BIGINT) AS commit_xid",
    )


def changes(spark: SparkSession, sf_dir: str, rebalance: bool = True) -> DataFrame:
    """The change-event envelope stream (batch mode).

    Single scan of events.parquet → explode of the 0..3 statement
    sequence → one projection computing the envelope columns: a narrow
    whole-stage-codegen pipeline, no shuffle (beyond the small-input
    rebalance), pushdown- and pruning-friendly.

    ``rebalance=False`` skips the small-input rebalance: a consumer
    whose FIRST operation is itself a shuffle (the prefix-scan's chunk
    exchange) gets parallelism from that exchange, and the extra
    rebalance shuffle only adds cost (measured 1.7× on txn assembly).
    Narrow consumers (envelope scans, filters) keep the default.
    """
    # The projection is expressed as selectExpr STRINGS, not stacked
    # Column builders: every F.when/F.col/F.cast is a Py4J round-trip,
    # and this builder runs once per query construction for EVERY cdc_*
    # query.  The Column-builder form measured 0.42-0.51 s of pure
    # plan-construction wall per call at r14 (~50% of the bench's
    # "cdc_envelope" number, which the decode_rows_per_sec metric
    # divides by); the string form hands Catalyst one parse unit and
    # constructs in ~30 ms.  The logical plan and result schema are
    # IDENTICAL (pinned by the oracle gate on every cdc_* query).
    ev = _ev_projected(spark, sf_dir, rebalance)

    # Every 50th statement is DDL; the ADD/DROP alternation over a
    # 3-column cycle gives the schema-evolution queries a real
    # column-set timeline to fold (cdc_schema_evolution).
    #
    # r19: the SQL text is selected from PRE-FOLDED string literals
    # instead of per-row CONCAT chains.  db/tbl take exactly two
    # values by the derivation rules and the column digit exactly
    # three, so every possible statement text is one of 18 constants —
    # hand constant-folding the templates (Catalyst cannot fold
    # through the db CASE) turns the hottest envelope expression from
    # string building into a literal pick.  Byte-identical output
    # (pinned by the cdc_envelope/cdc_ddl_alerts oracles and the
    # rows_changes parity test); measured interleaved at sf0.1:
    # envelope 0.42→0.35 s min, 0.57→0.41 s median.
    def _ddl(tbl_full: str) -> str:
        add = " ".join(
            f"WHEN (event_id div 50) % 3 = {k} THEN "
            f"'ALTER TABLE {tbl_full} ADD COLUMN c{k} INT'"
            for k in range(3)
        )
        drop = " ".join(
            f"WHEN (event_id div 50) % 3 = {k} THEN "
            f"'ALTER TABLE {tbl_full} DROP COLUMN c{k}'"
            for k in range(3)
        )
        return (
            f"CASE WHEN (event_id div 50) % 2 = 0 THEN CASE {add} END "
            f"ELSE CASE {drop} END END"
        )

    def _dml(tbl_full: str) -> str:
        return (
            f"CASE WHEN row_op = '{OP_WRITE_ROWS}' THEN "
            f"'INSERT INTO {tbl_full} (id, value) VALUES (?, ?)' "
            f"WHEN row_op = '{OP_UPDATE_ROWS}' THEN "
            f"'UPDATE {tbl_full} SET value = ? WHERE id = ?' "
            f"ELSE 'DELETE FROM {tbl_full} WHERE id = ?' END"
        )

    sql_text = (
        "CASE WHEN event_id % 50 = 0 THEN "
        f"(CASE WHEN db = 'foo' THEN {_ddl('foo.auto')} ELSE {_ddl('bench.big')} END) "
        f"WHEN db = 'foo' THEN {_dml('foo.auto')} ELSE {_dml('bench.big')} END"
    )
    before_id = f"CASE WHEN row_op = '{OP_WRITE_ROWS}' THEN NULL ELSE row_id END"
    before_value = (
        f"CASE WHEN row_op = '{OP_WRITE_ROWS}' THEN NULL "
        f"WHEN row_op = '{OP_DELETE_ROWS}' THEN value ELSE value - 1.0 END"
    )
    after_id = f"CASE WHEN row_op = '{OP_DELETE_ROWS}' THEN NULL ELSE row_id END"
    after_value = f"CASE WHEN row_op = '{OP_DELETE_ROWS}' THEN NULL ELSE value END"
    return ev.selectExpr(
        "*", "explode(array(0, 1, 2, 3)) AS __seq"
    ).selectExpr(
        "CAST(event_id * 4 + __seq AS BIGINT) AS offset",
        # Integer `div`, matching the oracle's `//` exactly past 2^53
        # (a double divide + truncate would not — advisor nit).
        "format_string('binlog.%06d', CAST(event_id div 250000 AS INT)) AS log_file",
        "ts",
        "CAST(1 AS BIGINT) AS server_id",
        "CAST(CASE WHEN __seq = 3 THEN event_id END AS BIGINT) AS xid",
        "db",
        "tbl",
        "CAST(CASE WHEN __seq = 0 THEN 'query' WHEN __seq = 1 THEN 'table_map' "
        "WHEN __seq = 2 THEN row_op ELSE 'xid' END AS STRING) AS op",
        f"CAST(CASE WHEN __seq = 2 THEN {before_id} END AS BIGINT) AS before_id",
        f"CAST(CASE WHEN __seq = 2 THEN {before_value} END AS DOUBLE) AS before_value",
        f"CAST(CASE WHEN __seq = 2 THEN {after_id} END AS BIGINT) AS after_id",
        f"CAST(CASE WHEN __seq = 2 THEN {after_value} END AS DOUBLE) AS after_value",
        f"CAST(CASE WHEN __seq = 0 THEN {sql_text} END AS STRING) AS sql",
    )


def rows_delta_type(env: DataFrame) -> DataFrame:
    """R4: explode row events into delta-type-tagged rows.

    Reference `rows-delta-type` (src/cdc/jdbc.clj:104-115): WRITE rows →
    "insert", DELETE rows → "delete", each UPDATE row → a pair tagged
    "update-before" then "update" (adjacency preserved: both tags share
    the parent offset; `inline` emits them in order within a record).
    Non-row events are dropped.
    """
    def row_struct(id_col: str, val_col: str, tag: str) -> str:
        return (
            f"named_struct('id', CAST({id_col} AS BIGINT), "
            f"'value', CAST({val_col} AS DOUBLE), '_delta_type', '{tag}')"
        )

    pair = (
        f"CASE WHEN op = '{OP_UPDATE_ROWS}' THEN array("
        f"{row_struct('before_id', 'before_value', DT_UPDATE_BEFORE)}, "
        f"{row_struct('after_id', 'after_value', DT_UPDATE)}) "
        f"WHEN op = '{OP_WRITE_ROWS}' THEN array("
        f"{row_struct('after_id', 'after_value', DT_INSERT)}) "
        f"ELSE array({row_struct('before_id', 'before_value', DT_DELETE)}) END"
    )
    return env.filter(F.col("op").isin(*ROW_OPS)).selectExpr(
        "offset", "log_file", "ts", "db", "tbl", f"inline({pair})"
    )


# ---------------------------------------------------------------------------
# DuckDB-oracle equivalent of the derivation above.  `CHANGES_CTE` is a
# WITH-clause body defining views `changes` (the envelope) and `rows_dt`
# (the delta-type explode); oracle queries append their SELECT.
# ---------------------------------------------------------------------------

CHANGES_CTE = """
ev AS (
  SELECT event_id, ts, value,
         CASE WHEN user_id % 2 = 0 THEN 'foo' ELSE 'bench' END AS db,
         CASE WHEN user_id % 2 = 0 THEN 'auto' ELSE 'big' END AS tbl,
         CAST(event_id % 97 AS BIGINT) AS row_id,
         CASE WHEN event_type IN ('signup','purchase') THEN 'write_rows'
              WHEN event_type IN ('click','view') THEN 'update_rows'
              ELSE 'delete_rows' END AS row_op,
         printf('binlog.%06d', CAST(event_id // 250000 AS INT)) AS log_file
  FROM events
),
changes AS (
  SELECT CAST(event_id*4 AS BIGINT) AS "offset", log_file, ts,
         CAST(1 AS BIGINT) AS server_id, CAST(NULL AS BIGINT) AS xid,
         db, tbl, 'query' AS op,
         CAST(NULL AS BIGINT) AS before_id, CAST(NULL AS DOUBLE) AS before_value,
         CAST(NULL AS BIGINT) AS after_id,  CAST(NULL AS DOUBLE) AS after_value,
         CASE WHEN event_id % 50 = 0
                THEN CASE WHEN (event_id // 50) % 2 = 0
                       THEN 'ALTER TABLE ' || db || '.' || tbl || ' ADD COLUMN c'
                            || CAST((event_id // 50) % 3 AS VARCHAR) || ' INT'
                       ELSE 'ALTER TABLE ' || db || '.' || tbl || ' DROP COLUMN c'
                            || CAST((event_id // 50) % 3 AS VARCHAR) END
              WHEN row_op = 'write_rows'
                THEN 'INSERT INTO ' || db || '.' || tbl || ' (id, value) VALUES (?, ?)'
              WHEN row_op = 'update_rows'
                THEN 'UPDATE ' || db || '.' || tbl || ' SET value = ? WHERE id = ?'
              ELSE 'DELETE FROM ' || db || '.' || tbl || ' WHERE id = ?' END AS "sql"
  FROM ev
  UNION ALL
  SELECT CAST(event_id*4+1 AS BIGINT), log_file, ts, 1, NULL, db, tbl, 'table_map',
         NULL, NULL, NULL, NULL, NULL
  FROM ev
  UNION ALL
  SELECT CAST(event_id*4+2 AS BIGINT), log_file, ts, 1, NULL, db, tbl, row_op,
         CASE WHEN row_op = 'write_rows' THEN NULL ELSE row_id END,
         CASE WHEN row_op = 'write_rows' THEN NULL
              WHEN row_op = 'update_rows' THEN value - 1.0
              ELSE value END,
         CASE WHEN row_op = 'delete_rows' THEN NULL ELSE row_id END,
         CASE WHEN row_op = 'delete_rows' THEN NULL ELSE value END,
         NULL
  FROM ev
  UNION ALL
  SELECT CAST(event_id*4+3 AS BIGINT), log_file, ts, 1, CAST(event_id AS BIGINT),
         db, tbl, 'xid', NULL, NULL, NULL, NULL, NULL
  FROM ev
),
rows_dt AS (
  SELECT "offset", log_file, ts, db, tbl,
         after_id AS id, after_value AS value, 'insert' AS _delta_type
  FROM changes WHERE op = 'write_rows'
  UNION ALL
  SELECT "offset", log_file, ts, db, tbl,
         before_id, before_value, 'delete'
  FROM changes WHERE op = 'delete_rows'
  UNION ALL
  SELECT "offset", log_file, ts, db, tbl,
         before_id, before_value, 'update-before'
  FROM changes WHERE op = 'update_rows'
  UNION ALL
  SELECT "offset", log_file, ts, db, tbl,
         after_id, after_value, 'update'
  FROM changes WHERE op = 'update_rows'
)
""".strip()


def with_changes(select_sql: str) -> str:
    """Wrap an oracle SELECT that reads from `changes` / `rows_dt`."""
    return f"WITH {CHANGES_CTE}\n{select_sql}"
