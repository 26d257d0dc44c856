"""dq query registrations (split from queries.py; registration order is governed by _registry.REGISTRATION_ORDER)."""
from __future__ import annotations

from pyspark.sql import functions as F
from mysql_cdc_spark.operators import profiling
from mysql_cdc_spark.queries._registry import register  # noqa: E402
from mysql_cdc_spark.queries._shared import (  # noqa: E402
    _events,
)



@register("dq_profile_events", profiling.profile_oracle_sql())
def dq_profile_events(spark, sf_dir):
    """Single-pass table profile (null/distinct/min/max per column) —
    the data-quality admission check, one scan regardless of column
    count (Expand-planned multi-distinct)."""
    return profiling.profile_events(_events(spark, sf_dir))


@register(
    "dq_distribution_drift",
    "WITH b AS (SELECT MIN(epoch_us(ts)) AS t0, MAX(epoch_us(ts)) AS t1 FROM events), "
    "c AS (SELECT event_type, "
    "  CASE WHEN epoch_us(ts) * 2 <= t0 + t1 THEN 1 ELSE 2 END AS half, "
    "  LEAST(9, GREATEST(0, CAST(floor(value / 50.0) AS INTEGER))) AS bucket, "
    "  CAST(COUNT(*) AS BIGINT) AS n FROM events, b GROUP BY 1, 2, 3), "
    "tot AS (SELECT event_type, half, SUM(n) AS tot FROM c GROUP BY 1, 2), "
    "grid AS (SELECT t.event_type, h.half, bk.bucket FROM "
    "  (SELECT DISTINCT event_type FROM c) t, "
    "  (SELECT unnest([1, 2]) AS half) h, "
    "  (SELECT unnest(range(10)) AS bucket) bk), "
    "dense AS (SELECT g.event_type, g.half, g.bucket, COALESCE(c.n, 0) AS n, "
    "  CAST(COALESCE(c.n, 0) + 1 AS DOUBLE) / CAST(tot.tot + 10 AS DOUBLE) AS p "
    "  FROM grid g LEFT JOIN c ON g.event_type = c.event_type "
    "  AND g.half = c.half AND g.bucket = c.bucket "
    "  JOIN tot ON g.event_type = tot.event_type AND g.half = tot.half), "
    "terms AS (SELECT h1.event_type, h1.n AS n1, h2.n AS n2, "
    "  CAST(round((h2.p - h1.p) * ln(h2.p / h1.p), 8) AS DECIMAL(18,8)) AS term "
    "  FROM dense h1 JOIN dense h2 ON h1.event_type = h2.event_type "
    "  AND h1.bucket = h2.bucket AND h1.half = 1 AND h2.half = 2) "
    "SELECT event_type, CAST(SUM(n1) AS BIGINT) AS n1, CAST(SUM(n2) AS BIGINT) AS n2, "
    "CAST(CAST(SUM(term) AS DECIMAL(28,8)) AS DOUBLE) AS psi "
    "FROM terms GROUP BY event_type",
)
def dq_distribution_drift(spark, sf_dir):
    """PSI drift monitor: per event_type, the value distribution of
    the first half of the time range vs the second (fixed buckets,
    Laplace-smoothed shares, DECIMAL-rounded terms) — the standard
    is-today-still-like-yesterday gate before data enters training
    (operators/profiling.py distribution_drift)."""
    return profiling.distribution_drift(_events(spark, sf_dir))


@register(
    "dq_k_anonymity",
    "SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, "
    "CAST(COUNT(*) AS BIGINT) AS n_events, "
    "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users, "
    f"COUNT(DISTINCT user_id) < {profiling.K_ANON} AS suppress "
    "FROM events GROUP BY 1, 2",
)
def dq_k_anonymity(spark, sf_dir):
    """k-anonymity audit over the (event_type, day) quasi-identifier:
    flags groups with fewer than K distinct users — the privacy gate
    before a corpus export."""
    return profiling.k_anonymity(_events(spark, sf_dir))


@register(
    "dq_pseudonymize",
    "SELECT md5('export-v1:' || CAST(user_id AS VARCHAR)) AS user_token, "
    "event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, "
    "CAST(floor(value / 100.0) * 100.0 AS DOUBLE) AS value_bucket "
    "FROM events",
)
def dq_pseudonymize(spark, sf_dir):
    """Privacy-safe export projection: salted deterministic user
    tokens (joins/groupings still work across exports under one salt;
    rotating the salt unlinks releases) + fixed-width value
    generalization — the release step after the k-anonymity audit
    decides what may leave (profiling.pseudonymize)."""
    return profiling.pseudonymize(_events(spark, sf_dir))


@register(
    "dq_referential",
    "SELECT 'lineitem->orders' AS fk, CAST(COUNT(*) AS BIGINT) AS n_rows, "
    "CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans "
    "FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey "
    "UNION ALL "
    "SELECT 'orders->customer', CAST(COUNT(*) AS BIGINT), "
    "CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
    "FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey "
    "UNION ALL "
    "SELECT 'customer->nation', CAST(COUNT(*) AS BIGINT), "
    "CAST(SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
    "FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey",
)
def dq_referential(spark, sf_dir):
    """Referential-integrity audit: orphan counts along the
    lineitem→orders→customer→nation FK chain — the other half of the
    data-quality gate (dq_profile_events covers columns; this covers
    relationships).  Each edge is one left join reduced to two
    counters: parent sides broadcast when small, fact-side rows never
    materialize beyond the join."""
    from mysql_cdc_spark.sources.io import read_table

    def edge(name, child, ckey, parent, pkey):
        c = read_table(spark, sf_dir, child).select(F.col(ckey).alias("ck"))
        p = read_table(spark, sf_dir, parent).select(F.col(pkey).alias("pk")).distinct()
        joined = c.join(p, c.ck == p.pk, "left")
        return joined.agg(
            F.lit(name).alias("fk"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col("pk").isNull().cast("bigint")).cast("bigint").alias("n_orphans"),
        )

    return (
        edge("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey")
        .unionByName(edge("orders->customer", "orders", "o_custkey", "customer", "c_custkey"))
        .unionByName(edge("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"))
    )
