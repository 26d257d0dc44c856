"""sk query registrations (split from queries.py; registration order is governed by _registry.REGISTRATION_ORDER)."""
from __future__ import annotations

from mysql_cdc_spark.operators import sketches, timeseries
from mysql_cdc_spark.queries._registry import register  # noqa: E402
from mysql_cdc_spark.queries._shared import (  # noqa: E402
    _docs,
    _events,
)



@register("sk_hll_user_minutes", sketches.hll_user_minutes_oracle())
def sk_hll_user_minutes(spark, sf_dir):
    """Deterministic HyperLogLog (m=1024, md5-hashed, integer register
    sum, one final float division) estimating distinct active
    user-minutes.  The oracle rebuilds the identical sketch in SQL —
    estimate matches to the BIT."""
    return sketches.hll_user_minutes(_events(spark, sf_dir))


@register("sk_hll_merge_daily", sketches.hll_user_minutes_oracle())
def sk_hll_merge_daily(spark, sf_dir):
    """Mergeability proof: independent per-day HLL register tables
    merged by register-wise MAX give bit-identical output to the
    direct sketch (same oracle text as sk_hll_user_minutes on
    purpose) — the property that lets daily sketches answer any
    date-range distinct question without rescanning raw data."""
    return sketches.hll_user_minutes_merged_daily(_events(spark, sf_dir))


@register("sk_kmv_user_minutes", sketches.kmv_user_minutes_oracle())
def sk_kmv_user_minutes(spark, sf_dir):
    """KMV (k-minimum-values, k=512) distinct estimate over the same
    label space: distinct 52-bit hashes, TakeOrdered k-smallest, one
    final float division.  Degenerates to the exact count when fewer
    than k distinct values exist."""
    return sketches.kmv_user_minutes(_events(spark, sf_dir))


@register("sk_value_quantiles", sketches.value_quantiles_oracle())
def sk_value_quantiles(spark, sf_dir):
    """Exact p50/p90/p99 of event value by fixed-point histogram:
    the cumulative window runs over the domain-bounded bin table
    (~50k rows max), never the data — exact distributed quantiles
    without a t-digest."""
    return sketches.value_quantiles(_events(spark, sf_dir))


@register(
    "sk_hll_by_type",
    "WITH labels AS (SELECT event_type, md5(" + sketches.ORACLE_LABEL + ") AS h FROM events), "
    "hv AS (SELECT event_type, " + sketches.bucket_expr("h") + " AS bucket, "
    + sketches.v52_expr("h") + " AS v FROM labels), "
    "regs AS (SELECT event_type, bucket, MAX(CASE WHEN v = 0 THEN 50 "
    "ELSE LEAST(53 - LENGTH(printf('%b', v)), 50) END) AS m FROM hv GROUP BY 1, 2), "
    "agg AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS used, "
    "CAST(SUM(CAST(1 AS BIGINT) << CAST(50 - m AS INTEGER)) AS BIGINT) AS s_present "
    "FROM regs GROUP BY 1) "
    "SELECT event_type, used AS registers_used, "
    f"CAST(s_present + ({sketches.HLL_M} - used) * (CAST(1 AS BIGINT) << {sketches.RHO_CAP}) AS BIGINT) AS s_total, "
    f"CAST({sketches._ALPHA_M2_SHIFT} AS DOUBLE) / "
    f"CAST(s_present + ({sketches.HLL_M} - used) * (CAST(1 AS BIGINT) << {sketches.RHO_CAP}) AS DOUBLE) AS estimate "
    "FROM agg",
)
def sk_hll_by_type(spark, sf_dir):
    """GROUPED HLL: one register table per event_type in a single
    aggregation pass (group key + bucket), estimates per group — the
    per-segment distinct-count pattern (registers per group are still
    <= m rows: the shuffle stays tiny however large the data)."""
    return sketches.hll_by_group(_events(spark, sf_dir), "event_type")


@register("sk_cms_tokens", sketches.cms_heavy_hitters_oracle())
def sk_cms_tokens(spark, sf_dir):
    """Count-min sketch frequency estimates for the exact top-20
    tokens: d=4 salted hash rows x w=512 integer counters (2048 cells
    regardless of corpus size), estimate = min over rows — one-sided
    error, all-integer, bit-identical to the oracle's sketch."""
    return sketches.cms_heavy_hitters(_docs(spark, sf_dir))


@register("sk_bloom_prefilter", sketches.bloom_prefilter_oracle())
def sk_bloom_prefilter(spark, sf_dir):
    """Broadcast Bloom-filter membership prefilter vs a blocklist
    source, with the exact verify column certifying zero false
    negatives (m=4096, k=4 disjoint md5 slices — fully
    deterministic)."""
    return sketches.bloom_prefilter(_docs(spark, sf_dir))


@register(
    "sk_kmv_overlap",
    sketches.kmv_overlap_oracle("click", "view"),
)
def sk_kmv_overlap(spark, sf_dir):
    """KMV sketch set operation: click∩view distinct-user overlap
    estimated from the k smallest user hashes with membership flags —
    deterministic given the hash, so the estimate itself is
    hash-verified."""
    return sketches.kmv_overlap(_events(spark, sf_dir), "click", "view")


@register(
    "sk_join_cardinality",
    sketches.cms_join_cardinality_oracle("click", "view"),
)
def sk_join_cardinality(spark, sf_dir):
    """Join-size estimation before the join (AMS/CMS inner product):
    each side collapses to a 4×512 counter sketch, the estimate is the
    min row-wise inner product — what a cost-based planner consults;
    exact size computed alongside only to evaluate the bound."""
    return sketches.cms_join_cardinality(_events(spark, sf_dir), "click", "view")


@register("sk_quantile_merge_daily", sketches.value_quantiles_oracle())
def sk_quantile_merge_daily(spark, sf_dir):
    """Mergeability of the exact fixed-point quantile histogram:
    per-day histograms merged by summing bin counts yield quantiles
    identical to the single-pass whole-table computation — the
    property that lets the sketch maintain incrementally per
    partition/day at 100 TB (the quantile twin of
    sk_hll_merge_daily)."""
    return sketches.quantile_merge_daily(_events(spark, sf_dir))
