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


def order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape — EXISTS decorrelated to a LEFT SEMI join:
    orders with at least one lineitem shipped >30 days after the order
    date, counted per priority.

    Catalyst rewrites the semi join to a shuffled hash semi-join on
    l_orderkey; only (l_orderkey, l_shipdate) is read from lineitem
    (column pruning) and the date arithmetic stays codegen'd. At
    100 TB both sides are bucketed by orderkey at write time, which
    turns this into a shuffle-free co-located semi join.
    """
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders")
    )


ORDER_PRIORITY_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 30 DAY
)
GROUP BY o_orderpriority
""".strip()


def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape — LEFT OUTER join preserved through a two-level
    aggregation: how many customers placed exactly N orders (including
    N=0, which an inner join would silently drop).

    First agg shuffles on c_custkey (map-side combined), second on the
    tiny c_count domain. The outer join itself broadcasts nothing —
    both sides are keyed fact tables — but at scale the first groupBy
    reuses the join's hash partitioning on the key (no extra shuffle:
    Catalyst sees the co-partitioning).
    """
    cust = read_table(spark, sf_dir, "customer").select("c_custkey")
    orders = read_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("bigint").alias("custdist")
    )


CUSTOMER_ORDER_DISTRIBUTION_SQL = """
WITH per_cust AS (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM per_cust GROUP BY c_count
""".strip()


def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape — scalar MAX subquery over a grouped view:
    supplier(s) whose lineitem revenue equals the global maximum.

    Revenue stays DECIMAL through the max-equality comparison (exact on
    both engines; a double max would make ties engine-dependent) and is
    cast to double only for output. The rev aggregate is computed once
    and reused for the max via a broadcast single-row join; supplier is
    broadcast onto the winners.
    """
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    rev_expr = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(4,2)") - _dec("l_discount", 4, 2)
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(rev_expr).alias("total_rev"))
    max_rev = rev.agg(F.max("total_rev").alias("max_rev"))
    supp = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(max_rev))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_rev"))
    )


TOP_REVENUE_SUPPLIER_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS total_rev
  FROM lineitem GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
""".strip()


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — correlated aggregate subquery decorrelated to
    a per-key aggregate join: revenue from lineitems whose quantity is
    below half their part's average quantity.

    The threshold comparison is kept EXACT by clearing the division:
    qty < sum/(2*cnt)  ⇔  2*qty*cnt < sum, all in decimal — no
    engine-dependent double rounding at the boundary. lineitem is
    scanned twice (agg + probe); at 100 TB the per-part aggregate is
    small and broadcast, so the probe side never shuffles.
    """
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    per_part = li.groupBy("l_partkey").agg(
        F.sum(_dec("l_quantity")).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    probe = li.join(
        F.broadcast(per_part.withColumnRenamed("l_partkey", "pk")),
        F.col("l_partkey") == F.col("pk"),
    )
    small = probe.filter(
        _dec("l_quantity") * 2 * F.col("cnt") < F.col("sum_qty")
    )
    return small.agg(
        F.sum(_dec("l_extendedprice")).cast("double").alias("small_qty_revenue"),
        F.count(F.lit(1)).cast("bigint").alias("n_lineitems"),
    )


SMALL_QUANTITY_REVENUE_SQL = """
WITH pq AS (
  SELECT l_partkey AS pk,
         SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty,
         COUNT(*) AS cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS small_qty_revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems
FROM lineitem JOIN pq ON l_partkey = pk
WHERE CAST(l_quantity AS DECIMAL(12,2)) * 2 * cnt < sum_qty
""".strip()


LARGE_ORDER_MIN_QTY = 250


def large_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape — HAVING-filtered group feeding an IN-subquery
    join: orders whose total lineitem quantity exceeds a threshold,
    with customer attribution.

    The HAVING aggregate shrinks lineitem to a tiny key set (p99 of
    order quantity is below the threshold), which then broadcasts onto
    orders and customer — the classic "reduce then join" plan that
    avoids shuffling either fact table at scale.
    """
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > LARGE_ORDER_MIN_QTY)
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("total_qty").cast("double").alias("total_qty"),
        )
    )


LARGE_QUANTITY_ORDERS_SQL = f"""
WITH big AS (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > {LARGE_ORDER_MIN_QTY}
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
       CAST(total_qty AS DOUBLE) AS total_qty
FROM big JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
""".strip()


MARKET_SHARE_REGION = "EUROPE"
MARKET_SHARE_NATION = "NATION_7"


def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape — the same dimension (nation) joined through TWO
    different foreign-key paths: customer-side nation (restricting the
    market to one region) and supplier-side nation (the share
    numerator), per order year.

    All four dimension hops broadcast; the only big-table shuffle is
    lineitem⨝orders on orderkey. Numerator and denominator accumulate
    in exact decimal; the share is one double division at the end
    (deterministic given exact inputs on both engines).
    """
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    cust_region = (
        cust.join(
            F.broadcast(nation.select("n_nationkey", "n_regionkey")),
            cust.c_nationkey == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == MARKET_SHARE_REGION)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    supp_nation = (
        read_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(
            F.broadcast(nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select("s_suppkey", "supp_nation")
    )
    volume = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(4,2)") - _dec("l_discount", 4, 2)
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust_region), orders.o_custkey == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            volume.alias("volume"),
            F.col("supp_nation"),
        )
    )
    agg = joined.groupBy("o_year").agg(
        F.sum(F.when(F.col("supp_nation") == MARKET_SHARE_NATION, F.col("volume")).otherwise(F.lit(0).cast("decimal(12,2)"))).alias("nation_vol"),
        F.sum("volume").alias("total_vol"),
    )
    return agg.select(
        "o_year",
        F.col("nation_vol").cast("double").alias("nation_volume"),
        F.col("total_vol").cast("double").alias("total_volume"),
        (F.col("nation_vol").cast("double") / F.col("total_vol").cast("double")).alias("market_share"),
    )


NATION_MARKET_SHARE_SQL = f"""
WITH vol AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS volume,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE o_custkey IN (
    SELECT c_custkey FROM customer
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN region ON cn.n_regionkey = r_regionkey
    WHERE r_name = '{MARKET_SHARE_REGION}'
  )
)
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = '{MARKET_SHARE_NATION}' THEN volume ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS nation_volume,
       CAST(SUM(volume) AS DOUBLE) AS total_volume,
       CAST(SUM(CASE WHEN supp_nation = '{MARKET_SHARE_NATION}' THEN volume ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
         / CAST(SUM(volume) AS DOUBLE) AS market_share
FROM vol GROUP BY o_year
""".strip()


IDLE_SINCE = "2001-01-01"


def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape — scalar subquery threshold + NOT EXISTS:
    customers whose balance exceeds the average positive balance but
    who placed no order since IDLE_SINCE (every fixture custkey has
    SOME order, so the recency predicate is what makes the anti join
    selective), aggregated per nation.

    The threshold is one broadcast scalar; the anti join probes orders'
    (o_custkey, o_orderdate) only (pruned scan, date filter pushed
    down). The exact-decimal sum → one double division keeps the
    threshold bit-identical across engines.
    """
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    thr = cust.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal")
    )
    recent = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(IDLE_SINCE).cast("timestamp"))
        .select("o_custkey")
    )
    rich = cust.join(F.broadcast(thr)).filter(F.col("c_acctbal") > F.col("avg_bal"))
    idle = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    return idle.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum(_dec("c_acctbal")).cast("double").alias("total_balance"),
    )


IDLE_RICH_CUSTOMERS_SQL = f"""
SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_balance
FROM customer
WHERE c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
    FROM customer WHERE c_acctbal > 0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '{IDLE_SINCE}'
  )
GROUP BY c_nationkey
""".strip()
