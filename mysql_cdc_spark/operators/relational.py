"""Full relational surface over the fixture star schema.

The reference declares all of these absent (its DatabaseMetaData
returns false for GROUP BY :524, outer joins :543/:522/:529, set ops
:566-567, subqueries :559-562, ORDER BY expressions :520/:542 —
reference src/cdc/jdbc.clj:397-570).  The rebuilt engine exposes full
Spark SQL over the same data model, so these queries pin down the
join/agg/window/set-op/subquery behavior the reference could not
express (SURVEY §2.5).

Determinism: all DOUBLE aggregations go through exact DECIMAL
accumulation and are cast back to DOUBLE (see queries.py header).

Scale notes per query are inline; the common themes:
- dimension joins are broadcast (customer/nation/region are tiny
  relative to facts at any SF — classic star-schema pattern);
- fact-side aggregations are partial (map-side) before the shuffle,
  which Spark does automatically for sum/count/min/max;
- sorts are only for top-k (LIMIT pushes a TakeOrdered physical op —
  no global sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mysql_cdc_spark.sources.io import read_table


def _dec(col: str, p: int = 12, s: int = 2):
    return F.col(col).cast(f"decimal({p},{s})")


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy groupBy with exact decimal sums.

    One wide scan → map-side partial agg → 4-group shuffle. The filter
    and the 7-column projection push into the parquet scan.
    """
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast("decimal(4,2)") - _dec("l_discount", 4, 2))
    charge = disc_price * (F.lit(1).cast("decimal(4,2)") + _dec("l_tax", 4, 2))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            F.count(F.lit(1)).cast("bigint").alias("count_order"),
        )
    )


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""".strip()


def segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⨝dim join: orders joined to customer, revenue by segment.

    customer is broadcast (tiny dim): no shuffle of the orders fact —
    the single shuffle is the 5-group final agg.
    """
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        )
    )


SEGMENT_REVENUE_SQL = """
SELECT c_mktsegment,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""".strip()


def nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way star join lineitem⨝orders⨝customer⨝nation, revenue per nation.

    lineitem⨝orders shuffles on orderkey (both large); customer and
    nation broadcast. At 100 TB you would bucket lineitem and orders by
    orderkey at write time to eliminate that shuffle entirely.
    """
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(4,2)") - _dec("l_discount", 4, 2))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_lineitems"),
        )
    )


NATION_REVENUE_SQL = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
""".strip()


def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window function: top-3 orders per customer by totalprice.

    One shuffle on o_custkey; deterministic tiebreak on o_orderkey so
    ranks are engine-independent.
    """
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        read_table(spark, sf_dir, "orders")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", F.col("rank").cast("bigint").alias("rank"))
    )


TOP_ORDERS_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rank AS BIGINT) AS rank FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rank
  FROM orders
) WHERE rank <= 3
""".strip()


def orders_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: orders above the global average price.

    The threshold is computed once (exact decimal sum / count → double)
    and broadcast into the filter — the fact table is scanned once.
    """
    orders = read_table(spark, sf_dir, "orders")
    avg_df = orders.agg(
        (F.sum(_dec("o_totalprice")).cast("double") / F.count(F.lit(1))).alias("avg_price")
    )
    return (
        orders.join(F.broadcast(avg_df))
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


ORDERS_ABOVE_AVG_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_totalprice > (
  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) FROM orders
)
""".strip()


def repeat_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operation: customers with both open ('O') and finished ('F')
    orders — INTERSECT of two key sets."""
    orders = read_table(spark, sf_dir, "orders")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return o.intersect(f)


REPEAT_CUSTOMERS_SQL = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
""".strip()


def top_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY expression + LIMIT: Spark plans TakeOrdered (no global
    sort materialization). Deterministic tiebreak on the primary key."""
    return (
        read_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber"))
        .limit(10)
    )


TOP_LINEITEMS_SQL = """
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 10
""".strip()


def daily_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling time window over the events stream (batch form):
    per-day, per-type counts and exact sums — the shape of a streaming
    windowed aggregation (streaming/ runs the same agg incrementally).
    """
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("DAY", F.col("ts")).alias("day"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
            F.count_distinct(F.col("user_id")).cast("bigint").alias("n_users"),
        )
    )


DAILY_EVENT_STATS_SQL = """
SELECT date_trunc('day', ts) AS day, event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
""".strip()


SESSION_GAP_MINUTES = 30


def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: consecutive events of a user belong to
    one session until a gap over SESSION_GAP_MINUTES; per session emit
    bounds, event count, and exact value total.

    Plan: lag window + cumulative session counter, both PARTITIONED BY
    user — bounded per-user partitions (no global window), one shuffle
    on user_id, then a map-side-combined groupBy on (user, session).
    The streaming twin is `F.session_window(ts, gap)`; this is the
    batch derivation both can be checked against.
    """
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = SESSION_GAP_MINUTES * 60
    # Exact integer microseconds on BOTH engines (unix_micros /
    # epoch_us) — a seconds-granularity cast would truncate fractional
    # seconds differently than DuckDB's fractional epoch().
    marked = ev.withColumn(
        "new_session",
        F.when(
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(by_user)
            > gap_s * 1_000_000,
            1,
        )
        .otherwise(0)
        .cast("bigint"),
    ).withColumn(
        "session_no",
        F.sum("new_session").over(
            by_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return marked.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(_dec("value")).cast("double").alias("sum_value"),
    )


USER_SESSIONS_SQL = f"""
WITH marked AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > {SESSION_GAP_MINUTES * 60 * 1000000}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
  FROM marked
)
SELECT user_id, session_no, MIN(ts) AS session_start, MAX(ts) AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
FROM numbered GROUP BY 1, 2
""".strip()


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join (NOT EXISTS — §2.5 declared-absent shape): customers
    with no big-ticket order (none above 150k), per market segment.
    Left-anti hash join; the filtered orders side reduces to its
    distinct keys before the join."""
    cust = read_table(spark, sf_dir, "customer")
    big = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 150000)
        .select("o_custkey")
        .distinct()
    )
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.min("c_custkey").alias("min_custkey"),
        )
    )


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       MIN(c_custkey) AS min_custkey
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000
)
GROUP BY c_mktsegment
""".strip()


def order_size_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (UNION ALL + INTERSECT — §2.5 declared-absent
    shapes): orders that are both high-value AND multi-line, unioned
    with single-line low-value ones, each class labeled."""
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = read_table(spark, sf_dir, "lineitem").groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines")
    )
    high = orders.filter(F.col("o_totalprice") > 200000).select("o_orderkey")
    multi = li.filter(F.col("n_lines") >= 5).select(F.col("l_orderkey").alias("o_orderkey"))
    big_busy = high.intersect(multi).withColumn("class", F.lit("big_busy"))
    small_quiet = (
        orders.filter(F.col("o_totalprice") < 20000)
        .select("o_orderkey")
        .intersect(li.filter(F.col("n_lines") == 1).select(F.col("l_orderkey").alias("o_orderkey")))
        .withColumn("class", F.lit("small_quiet"))
    )
    return (
        big_busy.unionByName(small_quiet)
        .groupBy("class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.min("o_orderkey").alias("min_orderkey"),
            F.max("o_orderkey").alias("max_orderkey"),
        )
    )


ORDER_SIZE_CLASSES_SQL = """
WITH li AS (SELECT l_orderkey, COUNT(*) AS n_lines FROM lineitem GROUP BY l_orderkey),
big_busy AS (
  SELECT o_orderkey FROM orders WHERE o_totalprice > 200000
  INTERSECT
  SELECT l_orderkey FROM li WHERE n_lines >= 5
),
small_quiet AS (
  SELECT o_orderkey FROM orders WHERE o_totalprice < 20000
  INTERSECT
  SELECT l_orderkey FROM li WHERE n_lines = 1
),
unioned AS (
  SELECT o_orderkey, 'big_busy' AS class FROM big_busy
  UNION ALL
  SELECT o_orderkey, 'small_quiet' FROM small_quiet
)
SELECT class, CAST(COUNT(*) AS BIGINT) AS n_orders,
       MIN(o_orderkey) AS min_orderkey, MAX(o_orderkey) AS max_orderkey
FROM unioned GROUP BY class
""".strip()


def cdc_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream⨝dimension join: insert change rows enriched with the
    customer dimension — the canonical CDC consumer pattern. The dim is
    broadcast; the change stream never shuffles."""
    from mysql_cdc_spark.sources.events_cdc import changes, rows_delta_type

    rows = rows_delta_type(changes(spark, sf_dir)).filter(F.col("_delta_type") == "insert")
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
    return (
        rows.join(F.broadcast(cust), rows.id == cust.c_custkey)
        .select("offset", "db", "tbl", "id", "value", "c_name", "c_mktsegment")
    )
