"""ts query registrations (split from queries.py; registration order is governed by _registry.REGISTRATION_ORDER)."""
from __future__ import annotations

from pyspark.sql import functions as F
from mysql_cdc_spark.operators import sketches, timeseries
from mysql_cdc_spark.queries._registry import register  # noqa: E402
from mysql_cdc_spark.queries._shared import (  # noqa: E402
    _events,
)



@register(
    "ts_range_join_capped",
    "WITH iv AS (SELECT event_id AS incident_id, "
    "ts - INTERVAL 30 MINUTE AS w_start, ts + INTERVAL 30 MINUTE AS w_end "
    "FROM events WHERE event_type = 'error' AND value > 100.0), "
    "pairs AS (SELECT iv.incident_id, iv.w_start, iv.w_end, e.event_id, e.value "
    "FROM iv JOIN events e ON e.ts >= iv.w_start AND e.ts < iv.w_end), "
    "capped AS (SELECT * FROM ("
    "  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id "
    "  ORDER BY w_start DESC, incident_id) AS rn FROM pairs"
    ") WHERE rn <= 2) "
    "SELECT incident_id, w_start, w_end, COUNT(*) AS n_events, "
    "CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value "
    "FROM capped GROUP BY 1, 2, 3",
)
def ts_range_join_capped(spark, sf_dir):
    """Result-bounded range join (r8 VERDICT #4): each event is
    attributed to at most 2 containing incident windows (latest
    w_start first), bounding pair volume to O(events × 2) under
    arbitrarily dense overlapping incidents."""
    return timeseries.incident_window_stats_capped(
        _events(spark, sf_dir), max_windows_per_event=2
    )


_ASOF_ORACLE = (
    "WITH l AS (SELECT event_id, ts, user_id, value FROM events WHERE event_type = 'purchase'), "
    "r AS (SELECT user_id, ts, event_id, value, "
    "LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt "
    "FROM events WHERE event_type = 'click') "
    "SELECT l.event_id, l.ts, l.user_id, l.value, "
    "r.event_id AS click_event_id, r.ts AS click_ts, r.value AS click_value "
    "FROM l LEFT JOIN r ON l.user_id = r.user_id AND r.ts <= l.ts "
    "AND (l.ts < r.nxt OR r.nxt IS NULL) AND r.ts >= l.ts - INTERVAL 3600 SECOND"
)


@register("ts_asof_join", _ASOF_ORACLE)
def ts_asof_join(spark, sf_dir):
    """Last-click attribution: each purchase joined as-of backward to
    the user's most recent click within 1 hour.  Union+ordered-window
    formulation — ONE shuffle on user_id, no range explosion (the
    oracle's LEAD-interval LEFT JOIN is the same semantics declared
    relationally).  r12: `asof_join` is skew-ADAPTIVE — a key-count
    pre-agg dispatches to the row-identical chunked form when the
    hottest key exceeds the measured crossover
    (timeseries.ASOF_SKEW_ROW_THRESHOLD); on this fixture it stays
    the plain 1-shuffle plan.  r13: the pre-agg is memoised by the
    inputs' logical plans, so repeat executions (bench passes,
    notebook re-runs) plan with zero guard jobs."""
    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click")
    return timeseries.asof_join(
        purchases,
        clicks,
        on=["user_id"],
        ts="ts",
        payload=["event_id", "ts", "value"],
        tie="event_id",
        prefix="click_",
        tolerance_seconds=3600,
    )


@register("ts_asof_join_chunked", _ASOF_ORACLE)
def ts_asof_join_chunked(spark, sf_dir):
    """The hot-key-parallel as-of join (r11 skew-soak residual closed):
    identical attribution results via time-chunked carry —
    (key, chunk) windows + a per-chunk carry frame — so ONE hot user
    no longer serializes into a single sort partition
    (operators/timeseries.py asof_join_chunked; same oracle as
    ts_asof_join because the results are row-identical)."""
    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click")
    return timeseries.asof_join_chunked(
        purchases,
        clicks,
        on=["user_id"],
        ts="ts",
        payload=["event_id", "ts", "value"],
        tie="event_id",
        prefix="click_",
        tolerance_seconds=3600,
    )


@register(
    "ts_range_join",
    "WITH iv AS (SELECT event_id AS incident_id, "
    "ts - INTERVAL 30 MINUTE AS w_start, ts + INTERVAL 30 MINUTE AS w_end "
    "FROM events WHERE event_type = 'error' AND value > 100.0) "
    "SELECT incident_id, w_start, w_end, COUNT(*) AS n_events, "
    "CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value "
    "FROM iv JOIN events e ON e.ts >= iv.w_start AND e.ts < iv.w_end "
    "GROUP BY 1, 2, 3",
)
def ts_range_join(spark, sf_dir):
    """Interval containment as a bucketed equi-join: ±30min windows
    around high-value errors, aggregating the events inside each.  The
    bucket key keeps Catalyst off the BroadcastNestedLoopJoin path the
    oracle's BETWEEN join would imply."""
    return timeseries.incident_window_stats(_events(spark, sf_dir))


@register(
    "ts_rollup_daily",
    "SELECT date_trunc('day', ts) AS day, event_type, COUNT(*) AS n, "
    "CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value, "
    "MIN(value) AS min_value, MAX(value) AS max_value, "
    "COUNT(DISTINCT date_trunc('minute', ts)) AS n_minutes "
    "FROM events GROUP BY 1, 2",
)
def ts_rollup_daily(spark, sf_dir):
    """Hypertable-style continuous aggregate: day level computed
    through minute → hour → day re-aggregation (each level reads the
    previous one, never raw).  The oracle aggregates raw directly —
    hash equality proves the hierarchy is exact (DECIMAL partials all
    the way down)."""
    return timeseries.rollup_day_via_hierarchy(_events(spark, sf_dir))


# Oracle-side Morton interleave via div/mod/multiply only — a
# different operator family than the operator's shift/and build, so
# the two sides don't share an expression generator.
_Z_ORACLE_TERMS = " + ".join(
    f"((u // {1 << j}) % 2) * {1 << (2 * j)} + "
    f"((h // {1 << j}) % 2) * {1 << (2 * j + 1)}"
    for j in range(8)
)


@register(
    "ts_zorder_files",
    "WITH k AS (SELECT user_id % 256 AS u, "
    "CAST(epoch_us(ts) // 3600000000 AS BIGINT) % 256 AS h FROM events), "
    f"z AS (SELECT u, h, {_Z_ORACLE_TERMS} AS zv FROM k) "
    "SELECT CAST(zv // 1024 AS BIGINT) AS file_id, "
    "CAST(COUNT(*) AS BIGINT) AS n_rows, "
    "MIN(u) AS min_u, MAX(u) AS max_u, MIN(h) AS min_h, MAX(h) AS max_h "
    "FROM z GROUP BY 1",
)
def ts_zorder_files(spark, sf_dir):
    """Z-order (Morton-curve) file layout audit: every event lands in
    one of 64 files by the bit-interleave of (user bucket, hour
    bucket); output is each file's min/max per dimension — the footer
    stats a two-predicate scan prunes on.  The operator interleaves
    with shift/and, the oracle with div/mod — same curve, independent
    expressions (operators/layout.py)."""
    from mysql_cdc_spark.operators import layout

    return layout.zorder_file_stats(_events(spark, sf_dir))


@register(
    "ts_funnel",
    "WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY 1), "
    "s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN s1 ON e.user_id = s1.user_id "
    "WHERE e.event_type = 'click' AND e.ts >= s1.t1 AND e.ts < s1.t1 + INTERVAL 72 HOUR GROUP BY 1), "
    "s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN s2 ON e.user_id = s2.user_id "
    "WHERE e.event_type = 'purchase' AND e.ts >= s2.t2 AND e.ts < s2.t2 + INTERVAL 72 HOUR GROUP BY 1) "
    "SELECT s1.user_id, s1.t1, s2.t2, s3.t3 FROM s1 "
    "LEFT JOIN s2 ON s1.user_id = s2.user_id LEFT JOIN s3 ON s1.user_id = s3.user_id",
)
def ts_funnel(spark, sf_dir):
    """view → click → purchase funnel, each step within 72h of the
    previous: per-user earliest step times, NULL past the break.
    Stage-wise min-aggregations joined on user_id — O(1) state per
    user, no per-user event sorting."""
    return timeseries.funnel(_events(spark, sf_dir), ["view", "click", "purchase"])


@register(
    "ts_time_weighted_avg",
    "WITH seq AS (SELECT user_id, CAST(value AS DECIMAL(12,2)) AS v, epoch_us(ts) AS us, "
    "LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt FROM events) "
    "SELECT user_id, "
    "CAST(SUM(v * CAST(nxt - us AS DECIMAL(20,0))) AS DOUBLE) / CAST(SUM(nxt - us) AS DOUBLE) AS twa, "
    "CAST(SUM(nxt - us) AS BIGINT) AS span_us "
    "FROM seq WHERE nxt IS NOT NULL GROUP BY user_id",
)
def ts_time_weighted_avg(spark, sf_dir):
    """Per-user time-weighted mean under LOCF semantics: exact
    integer-microsecond durations weighting DECIMAL values, one float
    division at the end — the irregular-sampling average plain AVG
    gets wrong."""
    return timeseries.time_weighted_avg(_events(spark, sf_dir))


@register(
    "ts_gapfill_hourly",
    "WITH bounds AS (SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi FROM events), "
    "hours AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM bounds), "
    "types AS (SELECT DISTINCT event_type FROM events), "
    "grid AS (SELECT hour, event_type FROM hours CROSS JOIN types), "
    "hourly AS (SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2), "
    "ranked AS (SELECT date_trunc('hour', ts) AS hour, event_type, value, "
    "ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts), event_type ORDER BY ts DESC, event_id DESC) AS rn FROM events), "
    "filled AS (SELECT g.hour, g.event_type, CAST(COALESCE(h.n, 0) AS BIGINT) AS n, l.value AS last_in_hour "
    "FROM grid g LEFT JOIN hourly h ON g.hour = h.hour AND g.event_type = h.event_type "
    "LEFT JOIN (SELECT hour, event_type, value FROM ranked WHERE rn = 1) l "
    "ON g.hour = l.hour AND g.event_type = l.event_type) "
    "SELECT hour, event_type, n, "
    "last_value(last_in_hour IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY hour "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value FROM filled",
)
def ts_gapfill_hourly(spark, sf_dir):
    """Dense hourly grid per event type with zero-filled counts and
    last-observation-carried-forward values (time_bucket_gapfill +
    locf shape).  Grid size is bounded by span × type cardinality,
    independent of event volume."""
    return timeseries.gapfill_hourly(_events(spark, sf_dir))


@register(
    "ev_json_props",
    "SELECT event_type, COUNT(*) AS n, "
    "CAST(SUM(CAST(props->>'k' AS INTEGER)) AS BIGINT) AS sum_k, "
    "CAST(MIN(CAST(props->>'k' AS INTEGER)) AS BIGINT) AS min_k, "
    "CAST(MAX(CAST(props->>'k' AS INTEGER)) AS BIGINT) AS max_k "
    "FROM events WHERE CAST(props->>'k' AS INTEGER) > 10 "
    "GROUP BY event_type",
)
def ev_json_props(spark, sf_dir):
    """Semi-structured extraction: parse the JSON `props` payload with
    a typed `from_json` schema (JVM-side Jackson parse, no Python),
    filter on the extracted field, aggregate per event type.

    Scale: the parse is a narrow per-row expression; the filter sits
    directly on it pre-shuffle so only qualifying rows reach the
    map-side-combined aggregate.  With a columnar sink (or Spark's
    JSON scan schema inference) the `$.k` access would prune to one
    parsed field — here the payload is a single-key object anyway.
    Integer-exact aggregates.
    """
    ev = _events(spark, sf_dir).withColumn(
        "k", F.from_json("props", "struct<k:int>").getField("k")
    )
    return (
        ev.filter(F.col("k") > 10)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.min("k").cast("bigint").alias("min_k"),
            F.max("k").cast("bigint").alias("max_k"),
        )
    )


@register("ts_downsample_lttb", timeseries.LTTB_HOURLY_SQL)
def ts_downsample_lttb(spark, sf_dir):
    """Parallel LTTB: one perceptually-dominant point per event_type x
    hour, triangle-area argmax against neighbor-bucket average anchors
    (operators/timeseries.py lttb_downsample)."""
    return timeseries.lttb_downsample(_events(spark, sf_dir))


@register("ts_ohlc_hourly", timeseries.OHLC_HOURLY_SQL)
def ts_ohlc_hourly(spark, sf_dir):
    """Tick→bar OHLC compaction per user-hour: open/close via
    min_by/max_by over a lexicographic (ts, event_id) key (O(1)
    combinable state per bar — no per-bar sort), exact decimal
    volume."""
    return timeseries.ohlc_hourly(_events(spark, sf_dir))


_Z_SRC = (
    "SELECT event_id, user_id, value, "
    "CAST(COUNT(CAST(value AS DECIMAL(18,6))) OVER w AS BIGINT) AS n_hist, "
    "SUM(CAST(value AS DECIMAL(18,6))) OVER w AS s1, "
    "SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) OVER w AS s2 "
    "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id "
    f"ROWS BETWEEN {timeseries.ZSCORE_LOOKBACK} PRECEDING AND 1 PRECEDING)"
)


@register(
    "ts_zscore_anomaly",
    f"WITH scored AS ({_Z_SRC}), "
    "derived AS ("
    "  SELECT event_id, user_id, value, n_hist, "
    "  CAST(s1 AS DOUBLE) / CAST(n_hist AS DOUBLE) AS mean_hist, "
    "  CAST(s2 AS DOUBLE) / CAST(n_hist AS DOUBLE) "
    "    - (CAST(s1 AS DOUBLE) / CAST(n_hist AS DOUBLE)) "
    "      * (CAST(s1 AS DOUBLE) / CAST(n_hist AS DOUBLE)) AS var_hist "
    f"  FROM scored WHERE n_hist >= {timeseries.ZSCORE_MIN_N}) "
    "SELECT event_id, user_id, value, n_hist, mean_hist, "
    "(value - mean_hist) / sqrt(var_hist) AS z "
    "FROM derived WHERE var_hist > 0 "
    f"AND abs((value - mean_hist) / sqrt(var_hist)) > {timeseries.ZSCORE_THRESHOLD}",
)
def ts_zscore_anomaly(spark, sf_dir):
    """Per-user trailing-window z-score outliers: DECIMAL window sums,
    identical IEEE derivation on both engines, ROWS-bounded frame
    (O(1) window state per row at any scale)."""
    return timeseries.zscore_anomaly(_events(spark, sf_dir))


@register(
    "ts_retention_cohorts",
    "WITH f AS (SELECT user_id, MIN(date_trunc('day', ts)) AS cohort_day "
    "FROM events GROUP BY 1), "
    "a AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events), "
    "m AS (SELECT f.cohort_day, "
    "CAST(date_diff('day', f.cohort_day, a.day) AS BIGINT) AS day_n, "
    "CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active "
    "FROM a JOIN f USING (user_id) "
    "WHERE date_diff('day', f.cohort_day, a.day) <= 14 GROUP BY 1, 2), "
    "s AS (SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS n_users FROM f GROUP BY 1) "
    "SELECT CAST(m.cohort_day AS TIMESTAMP) AS cohort_day, day_n, n_active, "
    "n_users, CAST(n_active AS DOUBLE) / CAST(n_users AS DOUBLE) AS retention "
    "FROM m JOIN s USING (cohort_day)",
)
def ts_retention_cohorts(spark, sf_dir):
    """Cohort retention matrix: users grouped by first-activity day,
    distinct returning users per (cohort, day-offset ≤ 14), rate = one
    IEEE division of exact distinct counts
    (timeseries.retention_cohorts)."""
    return timeseries.retention_cohorts(_events(spark, sf_dir))


@register("ts_ewma", timeseries.ewma_oracle_sql())
def ts_ewma(spark, sf_dir):
    """Per-key truncated EWMA (8 terms, λ=1/2): the sequential
    recurrence made a bounded-frame window computation; exact binary
    weights + identical IEEE expression trees ⇒ bit-identical values
    on both engines."""
    return timeseries.ewma(_events(spark, sf_dir))
