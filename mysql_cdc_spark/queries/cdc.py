"""cdc query registrations (split from queries.py; registration order is governed by _registry.REGISTRATION_ORDER)."""
from __future__ import annotations

from pyspark.sql import functions as F
from mysql_cdc_spark.operators import aggregates, query, relational, transactions
from mysql_cdc_spark.sources.events_cdc import (
    changes,
    committed_rows_direct,
    rows_delta_type,
    txn_summary,
    with_changes,
)
from mysql_cdc_spark.operators import sketches, timeseries
from mysql_cdc_spark.operators import history
from mysql_cdc_spark.queries._registry import register  # noqa: E402
from mysql_cdc_spark.queries._shared import (  # noqa: E402
    _CKSUM_ROW_SPARK,
    _ROW_COLS,
    _head_offset,
    _rows_after,
    _rows_dt,
)



@register(
    "cdc_select_all",
    with_changes(
        'SELECT "offset", ts, db, tbl, id, value, _delta_type '
        "FROM rows_dt WHERE db = 'foo' AND tbl = 'auto'"
    ),
)
def cdc_select_all(spark, sf_dir):
    """`select * from "foo"."auto"` — reference JdbcClient.java:44."""
    # rebalance=False (r20): this consumer prunes the envelope to a
    # handful of columns, so the heavy-expression fan-out the
    # rebalance exists for never runs (interleaved on/off: 0.26 vs
    # 0.19 s at sf0.1, 0.30 vs 0.14 s at x10).
    return query.select_changes(
        changes(spark, sf_dir, rebalance=False), "foo", "auto", columns=_ROW_COLS
    )


@register(
    "cdc_insert_only",
    with_changes(
        'SELECT "offset", ts, db, tbl, id, value, _delta_type '
        "FROM rows_dt WHERE db = 'foo' AND tbl = 'auto' AND _delta_type = 'insert'"
    ),
)
def cdc_insert_only(spark, sf_dir):
    """`select * from "foo"."auto" where _delta_type = 'insert'` —
    the reference's canonical statement (jdbc.clj:117), via its own
    tokenizer/parser path (R1/R2)."""
    # rebalance=False (r20): pruned-envelope consumer, same
    # measurement as cdc_select_all (0.23 vs 0.17 s / 0.29 vs 0.14 s).
    return query.execute_statement(
        changes(spark, sf_dir, rebalance=False),
        "select * from \"foo\".\"auto\" where _delta_type = 'insert'",
    ).select(*_ROW_COLS)


@register(
    "cdc_update_pairs",
    with_changes(
        'SELECT "offset", ts, db, tbl, id, value, _delta_type '
        "FROM rows_dt WHERE _delta_type IN ('update-before','update')"
    ),
)
def cdc_update_pairs(spark, sf_dir):
    """Update before/after adjacency (R4 pair explode, jdbc.clj:111-112)."""
    return (
        _rows_dt(spark, sf_dir)
        .filter(F.col("_delta_type").isin("update-before", "update"))
        .select(*_ROW_COLS)
    )


@register(
    "cdc_running_sum",
    with_changes(
        'SELECT "offset", id, value, '
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER "
        '(ORDER BY "offset" ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) '
        "AS running_sum "
        "FROM rows_dt WHERE _delta_type = 'update'"
    ),
)
def cdc_running_sum(spark, sf_dir):
    """A1: running sum over the update stream (mysql_bench.clj:316-334).

    Distributed chunked prefix scan (functions/scan.py) — bit-identical
    to the oracle's sequential cumsum, but partition-parallel."""
    return aggregates.running_sum(_rows_after(spark, sf_dir))


@register(
    "cdc_update_sum",
    with_changes(
        "SELECT db, tbl, "
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value, "
        "COUNT(*) AS n_updates "
        "FROM rows_dt WHERE _delta_type = 'update' GROUP BY db, tbl"
    ),
)
def cdc_update_sum(spark, sf_dir):
    """A1 (scalable form): per-table update totals."""
    return aggregates.update_sum(_rows_after(spark, sf_dir))


@register(
    "cdc_all_equal",
    with_changes(
        "SELECT db, tbl, COUNT(DISTINCT value) AS n_distinct, "
        "MIN(value) AS min_value, MAX(value) AS max_value, "
        "MIN(value) = MAX(value) AS all_equal "
        "FROM rows_dt WHERE _delta_type = 'update' GROUP BY db, tbl"
    ),
)
def cdc_all_equal(spark, sf_dir):
    """A2: all-after-images-equal invariant (mysql_bench.clj:138-148)."""
    return aggregates.all_equal_check(_rows_after(spark, sf_dir))


@register(
    "cdc_count_changes",
    with_changes(
        "SELECT db, tbl, _delta_type, COUNT(*) AS n FROM rows_dt GROUP BY db, tbl, _delta_type"
    ),
)
def cdc_count_changes(spark, sf_dir):
    """A3: change counts per table and delta type."""
    return aggregates.count_changes(_rows_dt(spark, sf_dir))


@register(
    "cdc_ddl_alerts",
    with_changes(
        'SELECT "offset", ts, db, tbl, "sql" AS sql '
        "FROM changes WHERE op = 'query' AND regexp_matches(\"sql\", '^(ALTER|CREATE|DROP) ')"
    ),
)
def cdc_ddl_alerts(spark, sf_dir):
    """Schema-change alert filter (design note mysql_binlog.clj:975-976)."""
    # rebalance=False (r20): reads only the query-op rows' sql text
    # (0.21 vs 0.13 s at sf0.1, 0.30 vs 0.12 s at x10 interleaved).
    return aggregates.ddl_alerts(changes(spark, sf_dir, rebalance=False))


@register(
    "cdc_latest_state",
    with_changes(
        "SELECT db, tbl, id, value, \"offset\" AS as_of_offset FROM ("
        "  SELECT db, tbl, id, value, \"offset\", _delta_type, "
        "         ROW_NUMBER() OVER (PARTITION BY db, tbl, id ORDER BY \"offset\" DESC) AS rn"
        "  FROM rows_dt WHERE _delta_type <> 'update-before'"
        ") WHERE rn = 1 AND _delta_type <> 'delete'"
    ),
)
def cdc_latest_state(spark, sf_dir):
    """Materialize current table state from the change stream."""
    return aggregates.latest_state(_rows_after(spark, sf_dir))


# Oracle-side general transaction tagging: count of xid commits
# strictly before each event (same rule as operators/transactions.py,
# NOT the fixture-specific `offset div 4`).
_TAGGED_CTE = (
    ", tagged AS (SELECT *, CAST(COALESCE(SUM(CASE WHEN op = 'xid' THEN 1 ELSE 0 END) "
    'OVER (ORDER BY "offset" ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS txn '
    "FROM changes)"
)


@register(
    "cdc_incremental_state",
    with_changes(
        "SELECT db, tbl, id, value, \"offset\" AS as_of_offset FROM ("
        "  SELECT db, tbl, id, value, \"offset\", _delta_type, "
        "         ROW_NUMBER() OVER (PARTITION BY db, tbl, id ORDER BY \"offset\" DESC) AS rn"
        "  FROM rows_dt WHERE _delta_type <> 'update-before'"
        ") WHERE rn = 1 AND _delta_type <> 'delete'"
    ),
)
def cdc_incremental_state(spark, sf_dir):
    """Incremental materialized-view maintenance: build the state
    snapshot from the FIRST half of the log, then apply the second
    half as a change batch (full-outer merge with tombstones,
    operators/aggregates.py:apply_changes) — the result must equal a
    full recompute over the whole log (the oracle)."""
    rows = _rows_after(spark, sf_dir)
    mid = _head_offset(spark, sf_dir) // 2
    snapshot = aggregates.latest_state(rows.filter(F.col("offset") <= mid))
    batch = rows.filter(F.col("offset") > mid)
    return aggregates.apply_changes(snapshot, batch)


@register(
    "cdc_txn_events",
    with_changes(
        _TAGGED_CTE
        + " SELECT txn, COUNT(*) AS n_events, "
        'MIN("offset") AS first_offset, MAX("offset") AS last_offset, MAX(xid) AS xid, '
        "CAST(MAX(CASE WHEN op = 'update_rows' THEN 1 ELSE 0 END) AS BIGINT) AS has_update "
        "FROM tagged GROUP BY txn"
    ),
)
def cdc_txn_events(spark, sf_dir):
    """Transaction assembly at xid boundaries (general rule; the
    derived stream reproduces the 4-events-per-statement invariant,
    mysql_bench.clj:248-258).  Computed via the direct derivation
    (events_cdc.txn_summary — r19; row-identical to
    transactions.events_per_transaction over the envelope, pinned by
    parity test + this oracle)."""
    return txn_summary(spark, sf_dir)


@register(
    "cdc_txn_histogram",
    with_changes(
        _TAGGED_CTE
        + " SELECT n_events, COUNT(*) AS n_txns FROM ("
        "  SELECT txn, COUNT(*) AS n_events FROM tagged GROUP BY txn"
        ") GROUP BY n_events"
    ),
)
def cdc_txn_histogram(spark, sf_dir):
    """Distribution of events per transaction (expect a single (4, N) row)."""
    return (
        txn_summary(spark, sf_dir)
        .groupBy("n_events")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_txns"))
    )


@register(
    "cdc_committed_rows",
    with_changes(
        _TAGGED_CTE
        + ' SELECT "offset", txn, db, tbl, op, before_id, before_value, '
        "after_id, after_value, commit_xid FROM ("
        "  SELECT *, MAX(xid) OVER (PARTITION BY txn) AS commit_xid FROM tagged"
        ") WHERE op IN ('write_rows','update_rows','delete_rows') "
        "AND commit_xid IS NOT NULL"
    ),
)
def cdc_committed_rows(spark, sf_dir):
    """Row events with their commit xid attached (reference commit
    assembly, mysql_binlog.clj:393-394).  Computed via the direct
    derivation (events_cdc.committed_rows_direct — r19; row-identical
    to transactions.committed_rows over the envelope, pinned by parity
    test + this oracle)."""
    return committed_rows_direct(spark, sf_dir)


@register(
    "cdc_envelope",
    with_changes(
        'SELECT "offset", log_file, ts, server_id, xid, db, tbl, op, '
        'before_id, before_value, after_id, after_value, "sql" AS sql FROM changes'
    ),
)
def cdc_envelope(spark, sf_dir):
    """The raw envelope stream itself (S4/D1-D10 product shape)."""
    return changes(spark, sf_dir).select(
        "offset", "log_file", "ts", "server_id", "xid", "db", "tbl", "op",
        "before_id", "before_value", "after_id", "after_value", "sql",
    )


@register(
    "cdc_ivm_join",
    with_changes(
        ", dt AS (SELECT *, CASE WHEN _delta_type IN ('insert', 'update') "
        "THEN 1 ELSE -1 END AS mm FROM rows_dt), "
        # Independent PAIRWISE oracle (ADVICE r9: the old oracle ran
        # the same factorized algebra a1.s*b1.s, so a shared
        # factorization bug would pass): materialize each side's final
        # BAG state as (id, value, net multiplicity), run the actual
        # A x B join at value level, and aggregate over real pairs.
        "a1 AS (SELECT id, CAST(value AS DECIMAL(18,6)) AS v, "
        "CAST(SUM(mm) AS BIGINT) AS mult "
        "FROM dt WHERE db = 'foo' AND tbl = 'auto' GROUP BY 1, 2 "
        "HAVING SUM(mm) <> 0), "
        "b1 AS (SELECT id, CAST(value AS DECIMAL(18,6)) AS v, "
        "CAST(SUM(mm) AS BIGINT) AS mult "
        "FROM dt WHERE db = 'bench' AND tbl = 'big' GROUP BY 1, 2 "
        "HAVING SUM(mm) <> 0) "
        "SELECT a1.id, CAST(SUM(a1.mult * b1.mult) AS BIGINT) AS n_pairs, "
        "CAST(CAST(CAST(SUM(a1.mult * b1.mult * a1.v * b1.v) AS DECIMAL(38,12)) "
        "AS DECIMAL(28,6)) AS DOUBLE) AS sum_ab "
        "FROM a1 JOIN b1 ON a1.id = b1.id GROUP BY 1 "
        "HAVING SUM(a1.mult * b1.mult) <> 0"
    ),
)
def cdc_ivm_join(spark, sf_dir):
    """Materialized aggregated JOIN-view maintenance: per-key pair
    count and value-product sum of the foo.auto x bench.big join,
    maintained FACTORIZED: per-side (count, value-sum) factors kept up
    to date linearly across the base/delta halves of the log, view =
    their per-key product (aggregates.ivm_join_view; the pairwise join
    never materializes — quadratic per hot key and >10 min at the 100x
    soak, vs seconds factorized).  The oracle is INDEPENDENT of that
    algebra: it materializes each side's final bag state at value
    level and aggregates over the genuine pairwise join, so a bug in
    the factorization itself cannot cancel out."""
    rows = _rows_dt(spark, sf_dir)
    mid = _head_offset(spark, sf_dir) // 2
    return aggregates.ivm_join_view(rows, mid)
register(
    "cdc_join_dim",
    with_changes(
        'SELECT "offset", db, tbl, id, value, c_name, c_mktsegment '
        "FROM rows_dt JOIN customer ON id = c_custkey "
        "WHERE _delta_type = 'insert'"
    ),
)(relational.cdc_enriched)
_CKSUM_ROW_ORACLE = (
    "CAST(\"offset\" AS VARCHAR) || '|' || COALESCE(CAST(id AS VARCHAR), 'N') || '|' || "
    "COALESCE(CAST(CAST(value AS DECIMAL(12,2)) AS VARCHAR), 'N') || '|' || _delta_type"
)


@register(
    "cdc_table_checksum",
    with_changes(
        "SELECT db, tbl, COUNT(*) AS n_rows, "
        f"CAST(BIT_XOR({sketches.v52_expr(f'md5({_CKSUM_ROW_ORACLE})')}) AS BIGINT) AS checksum "
        "FROM rows_dt GROUP BY db, tbl"
    ),
)
def cdc_table_checksum(spark, sf_dir):
    """Order-insensitive per-table checksum of the change stream —
    the replica-consistency check a CDC consumer runs against the
    source (BIT_XOR of 52-bit md5 folds commutes with any partitioning
    / arrival order — offsets make rows unique, so cancellation cannot
    hide dupes — one map-side-combined shuffle on (db, tbl))."""
    rows = rows_delta_type(changes(spark, sf_dir))
    return rows.groupBy("db", "tbl").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.expr(f"bit_xor({sketches.v52_expr_spark(f'md5({_CKSUM_ROW_SPARK})')})")
        .cast("bigint")
        .alias("checksum"),
    )


# ---------------------------------------------------------------------------
# Round-3 batch: point-in-time CDC state, corpus mixture, repetition
# and cross-document duplication scoring
# ---------------------------------------------------------------------------


@register(
    "cdc_state_asof",
    with_changes(
        'SELECT db, tbl, id, value, "offset" AS as_of_offset FROM ('
        '  SELECT db, tbl, id, value, "offset", _delta_type, '
        '         ROW_NUMBER() OVER (PARTITION BY db, tbl, id ORDER BY "offset" DESC) AS rn'
        "  FROM rows_dt WHERE _delta_type <> 'update-before'"
        '  AND "offset" <= (SELECT MAX("offset") * 1 // 2 FROM rows_dt)'
        ") WHERE rn = 1 AND _delta_type <> 'delete'"
    ),
)
def cdc_state_asof(spark, sf_dir):
    """Time travel: table state as of the offset-range midpoint —
    same one-shuffle max(struct) replay as cdc_latest_state over the
    cutoff-filtered stream."""
    return aggregates.state_asof(_rows_after(spark, sf_dir))


@register(
    "cdc_scd2",
    with_changes(
        'SELECT db, tbl, id, value, "offset" AS valid_from, valid_to, '
        "valid_to IS NULL AS is_current FROM ("
        '  SELECT db, tbl, id, value, _delta_type, "offset", '
        '         LEAD("offset") OVER (PARTITION BY db, tbl, id ORDER BY "offset") AS valid_to'
        "  FROM rows_dt WHERE _delta_type <> 'update-before'"
        ") WHERE _delta_type <> 'delete'"
    ),
)
def cdc_scd2(spark, sf_dir):
    """Type-2 dimension: every version of every key with its offset
    validity interval (lead-window close, deletes terminate)."""
    return history.scd2_intervals(_rows_after(spark, sf_dir))


@register(
    "cdc_net_changes",
    with_changes(
        ', b AS (SELECT MAX("offset") * 1 // 3 AS lo, MAX("offset") * 2 // 3 AS hi FROM rows_dt), '
        'nev AS (SELECT r.db, r.tbl, r.id, r.value, r._delta_type, r."offset", b.lo, b.hi '
        "FROM rows_dt r CROSS JOIN b WHERE r._delta_type <> 'update-before' AND r.\"offset\" <= b.hi), "
        "pre AS (SELECT db, tbl, id, value, _delta_type, "
        'ROW_NUMBER() OVER (PARTITION BY db, tbl, id ORDER BY "offset" DESC) AS rn '
        'FROM nev WHERE "offset" <= lo), '
        "cur AS (SELECT db, tbl, id, value, _delta_type, "
        'ROW_NUMBER() OVER (PARTITION BY db, tbl, id ORDER BY "offset" DESC) AS rn FROM nev), '
        'touched AS (SELECT DISTINCT db, tbl, id FROM nev WHERE "offset" > lo) '
        "SELECT t.db, t.tbl, t.id, "
        "CASE WHEN NOT (p.id IS NOT NULL AND p._delta_type <> 'delete') AND c._delta_type <> 'delete' THEN 'insert' "
        "     WHEN (p.id IS NOT NULL AND p._delta_type <> 'delete') AND c._delta_type = 'delete' THEN 'delete' "
        "     WHEN (p.id IS NOT NULL AND p._delta_type <> 'delete') AND c._delta_type <> 'delete' AND p.value <> c.value THEN 'update' "
        "END AS net_op, "
        "CASE WHEN p.id IS NOT NULL AND p._delta_type <> 'delete' THEN p.value END AS old_value, "
        "CASE WHEN c._delta_type <> 'delete' THEN c.value END AS new_value "
        "FROM touched t "
        "LEFT JOIN (SELECT * FROM pre WHERE rn = 1) p ON t.db = p.db AND t.tbl = p.tbl AND t.id = p.id "
        "JOIN (SELECT * FROM cur WHERE rn = 1) c ON t.db = c.db AND t.tbl = c.tbl AND t.id = c.id "
        "WHERE CASE WHEN NOT (p.id IS NOT NULL AND p._delta_type <> 'delete') AND c._delta_type <> 'delete' THEN 'insert' "
        "     WHEN (p.id IS NOT NULL AND p._delta_type <> 'delete') AND c._delta_type = 'delete' THEN 'delete' "
        "     WHEN (p.id IS NOT NULL AND p._delta_type <> 'delete') AND c._delta_type <> 'delete' AND p.value <> c.value THEN 'update' "
        "END IS NOT NULL"
    ),
)
def cdc_net_changes(spark, sf_dir):
    """Net-change compaction between the 1/3 and 2/3 offsets of the
    stream: one classified row per touched key (single conditional
    max(struct) aggregate, one shuffle)."""
    rows = _rows_after(spark, sf_dir)
    bounds = rows.agg(
        F.expr("max(offset) * 1 div 3").cast("bigint").alias("lo"),
        F.expr("max(offset) * 2 div 3").cast("bigint").alias("hi"),
    )
    return history.net_changes(rows, bounds)


@register(
    "cdc_hot_keys",
    with_changes(
        ", per_key AS ("
        "  SELECT db, tbl, id, COUNT(*) AS n_changes FROM rows_dt GROUP BY db, tbl, id"
        "), ranked AS ("
        "  SELECT db, tbl, id, n_changes, "
        "         SUM(n_changes) OVER (PARTITION BY db, tbl) AS table_changes, "
        "         ROW_NUMBER() OVER (PARTITION BY db, tbl ORDER BY n_changes DESC, id) AS rank"
        "  FROM per_key"
        ") "
        "SELECT db, tbl, id, CAST(n_changes AS BIGINT) AS n_changes, "
        "CAST(table_changes AS BIGINT) AS table_changes, "
        "CAST(n_changes AS DOUBLE) / CAST(table_changes AS DOUBLE) AS share, "
        "CAST(rank AS BIGINT) AS rank "
        "FROM ranked WHERE rank <= 5"
    ),
)
def cdc_hot_keys(spark, sf_dir):
    """Skew monitor: top-5 most-changed keys per table with their share
    of table change volume — the signal that triggers salting of keyed
    downstream state."""
    return aggregates.hot_keys(_rows_dt(spark, sf_dir))


@register(
    "cdc_ivm_state_sum",
    with_changes(
        "SELECT db, tbl, "
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value, "
        "CAST(COUNT(*) AS BIGINT) AS n_rows FROM ("
        "  SELECT db, tbl, id, value, _delta_type FROM ("
        "    SELECT db, tbl, id, value, _delta_type, "
        "           ROW_NUMBER() OVER (PARTITION BY db, tbl, id ORDER BY \"offset\" DESC) AS rn"
        "    FROM rows_dt WHERE _delta_type <> 'update-before'"
        "  ) WHERE rn = 1 AND _delta_type <> 'delete'"
        ") GROUP BY db, tbl"
    ),
)
def cdc_ivm_state_sum(spark, sf_dir):
    """Incrementally-maintained grouped aggregate: the per-table
    SUM/COUNT of current state is derived from a first-half snapshot
    plus the second half applied as a change batch (apply_changes —
    bucketed merge, delta-only work), never a full-history rescan.
    The oracle recomputes from the whole log; equality proves the
    maintenance algebra.  At 100 TB the batch side is one
    map-side-combined aggregate of NEW data only — the materialized
    view refresh cost is O(delta), not O(history)."""
    rows = _rows_after(spark, sf_dir)
    mid = _head_offset(spark, sf_dir) // 2
    snapshot = aggregates.latest_state(rows.filter(F.col("offset") <= mid))
    merged = aggregates.apply_changes(snapshot, rows.filter(F.col("offset") > mid))
    return merged.groupBy("db", "tbl").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )


@register(
    "cdc_schema_evolution",
    with_changes(
        "SELECT \"offset\", db, tbl, action, col, net_after, "
        "CAST(SUM(presence_delta) OVER (PARTITION BY db, tbl ORDER BY \"offset\" "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_extra_cols "
        "FROM ("
        "  SELECT \"offset\", db, tbl, action, col, delta, "
        "  CAST(SUM(delta) OVER w AS BIGINT) AS net_after, "
        "  CAST(SUM(delta) OVER w > 0 AS BIGINT) "
        "    - CAST((SUM(delta) OVER w - delta) > 0 AS BIGINT) AS presence_delta "
        "  FROM ("
        "    SELECT \"offset\", db, tbl, "
        "    regexp_extract(\"sql\", ' (ADD|DROP) COLUMN ', 1) AS action, "
        "    regexp_extract(\"sql\", ' (ADD|DROP) COLUMN (\\w+)', 2) AS col, "
        "    CASE WHEN regexp_extract(\"sql\", ' (ADD|DROP) COLUMN ', 1) = 'ADD' "
        "         THEN 1 ELSE -1 END AS delta "
        "    FROM changes WHERE op = 'query' AND regexp_matches(\"sql\", '^ALTER TABLE ')"
        "  ) WINDOW w AS (PARTITION BY db, tbl, col ORDER BY \"offset\" "
        "    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        ")"
    ),
)
def cdc_schema_evolution(spark, sf_dir):
    """Dynamic-schema timeline: fold ALTER TABLE ADD/DROP COLUMN DDL
    into per-table schema versions (net column presence + running
    dynamic-column count) with pure integer window algebra — the
    reference's discover-schema-from-the-stream idea materialized
    (SURVEY §1.4)."""
    return history.schema_evolution(changes(spark, sf_dir))


@register(
    "cdc_replication_lag",
    with_changes(
        "SELECT db, tbl, CAST(MAX(\"offset\") AS BIGINT) AS last_offset, "
        "CAST((SELECT MAX(\"offset\") FROM changes) AS BIGINT) AS head_offset, "
        "CAST((SELECT MAX(\"offset\") FROM changes) - MAX(\"offset\") AS BIGINT) AS lag_events, "
        "CAST(COUNT(*) AS BIGINT) AS n_events "
        "FROM changes GROUP BY db, tbl"
    ),
)
def cdc_replication_lag(spark, sf_dir):
    """Replication-lag monitor: per-table distance (in log events)
    between the table's last change and the log head — the ops
    dashboard number for a CDC consumer.  One map-side-combined
    aggregate + a broadcast 1-row head join."""
    env = changes(spark, sf_dir)
    per_tbl = env.groupBy("db", "tbl").agg(
        F.max("offset").cast("bigint").alias("last_offset"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    head = env.agg(F.max("offset").cast("bigint").alias("head_offset"))
    return per_tbl.crossJoin(F.broadcast(head)).select(
        "db",
        "tbl",
        "last_offset",
        "head_offset",
        (F.col("head_offset") - F.col("last_offset")).alias("lag_events"),
        "n_events",
    )


@register(
    "cdc_scd2_lookup",
    with_changes(
        ", versions AS ("
        '  SELECT db, tbl, id, value, "offset" AS valid_from, valid_to FROM ('
        '    SELECT db, tbl, id, value, _delta_type, "offset", '
        '           LEAD("offset") OVER (PARTITION BY db, tbl, id ORDER BY "offset") AS valid_to'
        "    FROM rows_dt WHERE _delta_type <> 'update-before'"
        "  ) WHERE _delta_type <> 'delete'), "
        "facts AS ("
        '  SELECT db, tbl, id, "offset", _delta_type, value AS new_value '
        "  FROM rows_dt WHERE _delta_type <> 'update-before') "
        'SELECT f.db, f.tbl, f.id, f."offset", f._delta_type, f.new_value, '
        "v.value AS prior_value, v.valid_from "
        "FROM facts f LEFT JOIN versions v "
        "ON f.db = v.db AND f.tbl = v.tbl AND f.id = v.id "
        'AND v.valid_from < f."offset" AND v.valid_to IS NOT NULL '
        'AND f."offset" <= v.valid_to'
    ),
)
def cdc_scd2_lookup(spark, sf_dir):
    """Point-in-time SCD2 lookup: every state-setting event joined to
    the version of its key valid just before it (equi-key shuffle join
    + interval filter, never all-pairs); first inserts keep NULL
    priors."""
    return history.scd2_lookup(_rows_after(spark, sf_dir))
