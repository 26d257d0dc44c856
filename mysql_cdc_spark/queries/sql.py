"""sql query registrations (split from queries.py; registration order is governed by _registry.REGISTRATION_ORDER)."""
from __future__ import annotations

from pyspark.sql import functions as F
from mysql_cdc_spark.operators import aggregates, query, relational, transactions
from mysql_cdc_spark.queries._registry import register  # noqa: E402
from mysql_cdc_spark.queries._shared import (  # noqa: E402
    _events,
)



# ---------------------------------------------------------------------------
# Full relational surface (SURVEY §2.5: joins / aggs / windows / set ops /
# subqueries / sort+limit — everything the reference declares absent,
# provided by Spark SQL over the same engine)
# ---------------------------------------------------------------------------

register("sql_pricing_summary", relational.PRICING_SUMMARY_SQL)(relational.pricing_summary)
register("sql_segment_revenue", relational.SEGMENT_REVENUE_SQL)(relational.segment_revenue)
register("sql_nation_revenue", relational.NATION_REVENUE_SQL)(relational.nation_revenue)
register("sql_top_orders_window", relational.TOP_ORDERS_SQL)(relational.top_orders_per_customer)
register("sql_orders_above_avg", relational.ORDERS_ABOVE_AVG_SQL)(relational.orders_above_avg)
register("sql_repeat_customers", relational.REPEAT_CUSTOMERS_SQL)(relational.repeat_customers)
register("sql_top_lineitems", relational.TOP_LINEITEMS_SQL)(relational.top_lineitems)
register("sql_daily_event_stats", relational.DAILY_EVENT_STATS_SQL)(relational.daily_event_stats)
register("sql_user_sessions", relational.USER_SESSIONS_SQL)(relational.user_sessions)
register("sql_customers_no_orders", relational.CUSTOMERS_WITHOUT_ORDERS_SQL)(
    relational.customers_without_orders
)
register("sql_order_size_classes", relational.ORDER_SIZE_CLASSES_SQL)(
    relational.order_size_classes
)
register("sql_priority_semijoin", relational.ORDER_PRIORITY_SQL)(
    relational.order_priority_check
)
register("sql_cust_order_dist", relational.CUSTOMER_ORDER_DISTRIBUTION_SQL)(
    relational.customer_order_distribution
)
register("sql_top_supplier", relational.TOP_REVENUE_SUPPLIER_SQL)(
    relational.top_revenue_supplier
)
register("sql_small_qty_revenue", relational.SMALL_QUANTITY_REVENUE_SQL)(
    relational.small_quantity_revenue
)
register("sql_large_orders", relational.LARGE_QUANTITY_ORDERS_SQL)(
    relational.large_quantity_orders
)
register("sql_market_share", relational.NATION_MARKET_SHARE_SQL)(
    relational.nation_market_share
)
register("sql_idle_rich_customers", relational.IDLE_RICH_CUSTOMERS_SQL)(
    relational.idle_rich_customers
)


@register(
    "sql_sales_cube",
    "SELECT o_orderstatus AS status, o_orderpriority AS priority, COUNT(*) AS n, "
    "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue "
    "FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)",
)
def sql_sales_cube(spark, sf_dir):
    """CUBE grouping sets (all four status x priority marginals in one
    pass — Spark expands to a single expand+agg, not four scans)."""
    from mysql_cdc_spark.sources.io import read_table

    o = read_table(spark, sf_dir, "orders")
    return (
        o.cube(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
        )
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "sql_event_pivot",
    "SELECT date_trunc('day', ts) AS day, "
    + ", ".join(
        f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS {t}"
        for t in _EVENT_TYPES
    )
    + " FROM events GROUP BY 1",
)
def sql_event_pivot(spark, sf_dir):
    """Pivot: per-day event counts spread across one column per type
    (explicit value list keeps the schema static — required for any
    production pivot; zero-filled like the oracle's CASE sums)."""
    ev = _events(spark, sf_dir)
    out = (
        ev.groupBy(F.date_trunc("DAY", F.col("ts")).alias("day"))
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)).cast("bigint"))
    )
    return out.na.fill(0, _EVENT_TYPES)


@register(
    "sql_skew_normalize",
    "WITH dim AS (SELECT event_type, MAX(value) AS max_v FROM events GROUP BY 1) "
    "SELECT e.event_type, COUNT(*) AS n, "
    "CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value, "
    "MAX(d.max_v) AS max_v, "
    "CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) / MAX(d.max_v) AS ratio "
    "FROM events e JOIN dim d ON e.event_type = d.event_type GROUP BY 1",
)
def sql_skew_normalize(spark, sf_dir):
    """The canonical hot-key join (every fact row joins one of FIVE
    dimension keys) through the explicit salted-join path: the fact
    side gets a whole-row-hash salt, the 5-row dim replicates 16x, and
    the hot keys spread over 16 partitions instead of 1.  Semantics
    are row-identical to the plain join (oracle).  At THIS dim size
    Catalyst would broadcast anyway — salting is the tool for when the
    build side is too big to broadcast and AQE's skew splitting can't
    reach the join (see functions/skew.py)."""
    from mysql_cdc_spark.functions.skew import salted_join

    ev = _events(spark, sf_dir)
    dim = ev.groupBy("event_type").agg(F.max("value").alias("max_v"))
    joined = salted_join(ev.select("event_type", "value"), dim, on=["event_type"], n_salts=16)
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
        F.max("max_v").alias("max_v"),
        (
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double") / F.max("max_v")
        ).alias("ratio"),
    )
