"""Single-pass data profiling: per-column null counts, exact distinct
counts, and min/max — the data-quality step run before any table is
admitted to a pipeline.

The reference has no profiling surface (its DatabaseMetaData returns
empty sets for everything, reference src/cdc/jdbc.clj:397-570); this is
first-class here because at 100 TB "is this feed broken?" must be
answerable from ONE scan of the data, not one scan per column.

Plan shape: every metric for every column is computed in a single
aggregate over one scan — Catalyst plans the multiple COUNT(DISTINCT)s
via Expand (one pass, ~n_cols row amplification map-side, partial
aggregation before the one exchange).  The per-column rows are then
produced driver-free with an `stack` unpivot of the 1-row aggregate.
At extreme scale the exact distinct counts swap for the HLL registers
in operators/sketches.py (approx_count_distinct) without changing the
output shape; exact is kept here so the DuckDB oracle can verify
values bit-for-bit.

Value normalization keeps min/max engine-neutral: timestamps profile
as epoch microseconds, DOUBLE goes through DECIMAL(18,6) so its string
form is padded identically on both engines, strings compare in binary
collation (both engines' default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (column, normalized-value SQL expression) — identical text runs on
# Spark and DuckDB; BIGINT/VARCHAR-valued so min/max stringify stably.
PROFILE_COLS: list[tuple[str, str]] = [
    ("event_id", "event_id"),
    ("ts", "unix_micros_ts"),  # pre-derived (engines name epoch-us differently)
    ("user_id", "user_id"),
    ("event_type", "event_type"),
    ("value", "cast(value as decimal(18,6))"),
    ("props", "props"),
]


def profile_events(events: DataFrame) -> DataFrame:
    """Profile the events table: one row per column with
    (n_rows, n_null, n_distinct, min_val, max_val)."""
    src = events.withColumn("unix_micros_ts", F.unix_micros(F.col("ts")))
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    for name, expr in PROFILE_COLS:
        c = F.expr(expr)
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).cast("bigint").alias(f"{name}__n_null"),
            F.count_distinct(c).cast("bigint").alias(f"{name}__n_distinct"),
            F.min(c).cast("string").alias(f"{name}__min"),
            F.max(c).cast("string").alias(f"{name}__max"),
        ]
    one = src.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', {name}__n_null, {name}__n_distinct, {name}__min, {name}__max"
        for name, _ in PROFILE_COLS
    )
    return one.select(
        "n_rows",
        F.expr(
            f"stack({len(PROFILE_COLS)}, {stack_args}) "
            "as (col_name, n_null, n_distinct, min_val, max_val)"
        ),
    ).select("col_name", "n_rows", "n_null", "n_distinct", "min_val", "max_val")


def profile_oracle_sql() -> str:
    """DuckDB oracle: same metrics as a UNION ALL of per-column
    aggregates over a shared normalized projection."""
    parts = []
    for name, expr in PROFILE_COLS:
        parts.append(
            f"SELECT '{name}' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows, "
            f"CAST(COUNT(*) - COUNT({expr}) AS BIGINT) AS n_null, "
            f"CAST(COUNT(DISTINCT {expr}) AS BIGINT) AS n_distinct, "
            f"CAST(MIN({expr}) AS VARCHAR) AS min_val, "
            f"CAST(MAX({expr}) AS VARCHAR) AS max_val FROM src"
        )
    union = " UNION ALL ".join(parts)
    return (
        "WITH src AS (SELECT *, epoch_us(ts) AS unix_micros_ts FROM events) " + union
    )


# ---------------------------------------------------------------------------
# k-anonymity audit
# ---------------------------------------------------------------------------

K_ANON = 50


def k_anonymity(events: DataFrame, k: int = K_ANON) -> DataFrame:
    """k-anonymity audit over the (event_type, day) quasi-identifier:
    groups whose distinct-user count falls below `k` must be
    suppressed or generalized before the data can be released — the
    privacy gate a training-data pipeline runs before export.

    One Expand-free aggregate (count + exact count_distinct per
    group); at extreme scale the distinct count swaps for HLL
    registers exactly like the profiler's."""
    # day is a truncated TIMESTAMP, not DATE: DATE round-trips through
    # pandas differently per engine (DuckDB yields datetime64), which
    # breaks the value-hash comparison — same convention as
    # cdc_stream_windowed.
    return (
        events.groupBy(
            F.col("event_type"),
            F.date_trunc("day", F.col("ts")).alias("day"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.count_distinct("user_id").cast("bigint").alias("n_users"),
        )
        .select(
            "event_type",
            "day",
            "n_events",
            "n_users",
            (F.col("n_users") < k).alias("suppress"),
        )
    )


PSI_BUCKETS = 10
PSI_BUCKET_WIDTH = 50.0


def distribution_drift(events: DataFrame) -> DataFrame:
    """Population-stability-index drift monitor: per event_type,
    compare the `value` distribution of the first half of the time
    range against the second (fixed-width buckets, Laplace-smoothed
    shares) — the standard production check that yesterday's data
    still looks like today's before it enters training.

        PSI = Σ_b (p2_b - p1_b) * ln(p2_b / p1_b)

    Determinism contract: bucket ids and counts are exact integers,
    smoothed shares are single double divisions of exact integers,
    each bucket's PSI term is rounded to DECIMAL(18,8) BEFORE the
    order-independent sum, and the split point is the integer midpoint
    of the observed epoch-second range (computed in one tiny aggregate,
    broadcast back).

    Scale: one min/max aggregate over the narrow (ts) column, one
    map-side-combined count per (event_type, half, bucket) — ~types x
    2 x 10 rows — then driver-free arithmetic on that tiny table.
    """
    bounds = events.agg(
        F.min(F.unix_micros("ts")).alias("t0"),
        F.max(F.unix_micros("ts")).alias("t1"),
    )
    bucket = F.least(
        F.lit(PSI_BUCKETS - 1),
        F.greatest(
            F.lit(0), F.floor(F.col("value") / F.lit(PSI_BUCKET_WIDTH)).cast("int")
        ),
    )
    half = F.when(
        F.unix_micros("ts") * 2 <= F.col("t0") + F.col("t1"), F.lit(1)
    ).otherwise(F.lit(2))
    counts = (
        events.crossJoin(F.broadcast(bounds))
        .groupBy("event_type", half.alias("half"), bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    per_half = counts.groupBy("event_type", "half").agg(
        F.sum("n").cast("bigint").alias("tot")
    )
    # dense (type, half, bucket) grid so empty buckets get the Laplace
    # floor on both sides
    grid = (
        counts.select("event_type").distinct()
        .crossJoin(F.broadcast(
            counts.sparkSession.range(1, 3).select(F.col("id").cast("int").alias("half"))
        ))
        .crossJoin(F.broadcast(
            counts.sparkSession.range(PSI_BUCKETS).select(F.col("id").cast("int").alias("bucket"))
        ))
    )
    dense = (
        grid.join(counts, ["event_type", "half", "bucket"], "left")
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0)))
        .join(per_half, ["event_type", "half"])
        .withColumn(
            "p",
            (F.col("n") + F.lit(1)).cast("double")
            / (F.col("tot") + F.lit(PSI_BUCKETS)).cast("double"),
        )
    )
    h1 = dense.filter(F.col("half") == 1).select(
        "event_type", "bucket", F.col("n").alias("n1"), F.col("p").alias("p1")
    )
    h2 = dense.filter(F.col("half") == 2).select(
        "event_type", "bucket", F.col("n").alias("n2"), F.col("p").alias("p2")
    )
    terms = h1.join(h2, ["event_type", "bucket"]).withColumn(
        "term",
        F.round(
            (F.col("p2") - F.col("p1")) * F.log(F.col("p2") / F.col("p1")), 8
        ).cast("decimal(18,8)"),
    )
    return terms.groupBy("event_type").agg(
        F.sum("n1").cast("bigint").alias("n1"),
        F.sum("n2").cast("bigint").alias("n2"),
        F.sum("term").cast("decimal(28,8)").cast("double").alias("psi"),
    )


VALUE_BUCKET = 100.0


def pseudonymize(events: DataFrame, salt: str = "export-v1") -> DataFrame:
    """Privacy-safe export projection: the identifier column is
    replaced by a salted deterministic token (md5(salt || ':' || id))
    and the numeric value is generalized to a fixed-width bucket
    floor.  Deterministic tokens keep JOINS and GROUP BYs working
    across exported tables (the same user maps to the same token
    everywhere this salt is used) while the raw identifier never
    leaves the cluster; rotating the salt unlinks releases from each
    other.  Companion to the k-anonymity audit: that one decides WHAT
    may be released, this one produces the release.

    Narrow plan — one md5 + integer floor per row, no shuffle; at
    100 TB this is a pure map stage appended to whatever scan feeds
    the export.
    """
    return events.select(
        F.md5(F.concat(F.lit(salt), F.lit(":"), F.col("user_id").cast("string"))).alias(
            "user_token"
        ),
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("day"),
        (F.floor(F.col("value") / F.lit(VALUE_BUCKET)) * F.lit(VALUE_BUCKET))
        .cast("double")
        .alias("value_bucket"),
    )
