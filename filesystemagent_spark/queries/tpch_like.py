"""Relational operator coverage over the TPC-H-ish tables.

Each query exercises a SURVEY.md §2 operator family on the driver's
testdata: scan+filter+agg (A1-A6), joins incl. anti/semi (J1-J10),
window ranking (W1-W5), set ops (SO1-SO4), cube rollups (§2.4 note).

Scale notes inline per query; dims (region/nation/supplier/part) are
always the broadcast side, facts (lineitem/orders) are never collected
or broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from filesystemagent_spark.catalog import Catalog
from filesystemagent_spark.queries import register

# Exact money arithmetic: DECIMAL(18,6) partial sums agree bit-for-bit
# with the DuckDB oracle regardless of partition/summation order.
def _dec(c):
    return c.cast("decimal(18,6)")


def _dsum(c, alias):
    return F.sum(_dec(c)).cast("double").alias(alias)


@register(
    "pricing_summary",
    headline=True,
    tags=("agg", "filter", "scan"),
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the canonical scan→filter→agg. The shipdate
    predicate and the 9 needed columns push down to the parquet scan;
    partial aggregation makes the shuffle carry only group states."""
    li = Catalog(spark, sf_dir).lineitem
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity"), "sum_qty"),
            _dsum(F.col("l_extendedprice"), "sum_base_price"),
            _dsum(disc_price, "sum_disc_price"),
            _dsum(charge, "sum_charge"),
            # exact decimal sum → double → IEEE divide: identical in both
            # engines; ROUND(AVG(..)) diverges on exact rounding boundaries.
            (F.sum(_dec(F.col("l_quantity"))).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(_dec(F.col("l_extendedprice"))).cast("double") / F.count("*")).alias("avg_price"),
            (F.sum(_dec(F.col("l_discount"))).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "top_customers_by_revenue",
    headline=True,
    tags=("join", "agg", "topk"),
    oracle="""
SELECT c.c_custkey, c.c_name, c.c_mktsegment,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name, c.c_mktsegment
ORDER BY revenue DESC, c_custkey ASC
LIMIT 10
""",
)
def top_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join + rollup + global top-K. lineitem collapses to
    order grain BEFORE the join (partial-agg pushdown: decimal sums are
    associative, so the rewrite is bit-identical) — the orderkey shuffle
    carries one aggregated row per order, not every line item; map-side
    combine does the collapse because lineitem files cluster by order.
    Customer is broadcast; top-K is TakeOrdered — no global sort."""
    cat = Catalog(spark, sf_dir)
    revenue = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    li_agg = cat.lineitem.groupBy("l_orderkey").agg(
        F.sum(revenue).alias("rev"), F.count("*").alias("n")
    )
    return (
        li_agg.join(
            cat.orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cat.customer), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg(
            F.sum("rev").cast("double").alias("revenue"),
            F.sum("n").alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(10)
    )


@register(
    "regional_revenue",
    headline=True,
    tags=("join", "broadcast", "agg"),
    oracle="""
SELECT r.r_name AS region_name, n.n_name AS nation_name,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY region_name, nation_name
ORDER BY region_name, nation_name
""",
)
def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: lineitem pre-aggregated to order grain (associative
    decimal partials — bit-identical, smaller shuffle), one fact-fact
    shuffle join, then a broadcast chain through customer→nation→region
    (dims never shuffle the fact; customer pruned to its 2 join cols)."""
    cat = Catalog(spark, sf_dir)
    revenue = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    li_agg = cat.lineitem.groupBy("l_orderkey").agg(
        F.sum(revenue).alias("rev"), F.count("*").alias("n")
    )
    return (
        li_agg.join(
            cat.orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(cat.customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(cat.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(cat.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(
            F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name")
        )
        .agg(
            F.sum("rev").cast("double").alias("revenue"),
            F.sum("n").alias("n_items"),
        )
        .orderBy("region_name", "nation_name")
    )


@register(
    "market_segment_stats",
    tags=("agg",),
    oracle="""
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_acctbal,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_acctbal,
       CAST(COUNT(CASE WHEN c_acctbal < 0 THEN 1 END) AS BIGINT) AS n_negative
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def market_segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-table rollup with a conditional count (A6's count_if)."""
    return (
        Catalog(spark, sf_dir)
        .customer.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            (F.sum(_dec(F.col("c_acctbal"))).cast("double") / F.count("*")).alias("avg_acctbal"),
            F.sum(_dec(F.col("c_acctbal"))).cast("double").alias("total_acctbal"),
            F.count_if(F.col("c_acctbal") < 0).alias("n_negative"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "customers_without_orders",
    tags=("join", "anti"),
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE c_custkey NOT IN (
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2001-05-01 00:00:00'
)
ORDER BY c_custkey
""",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join — the reference's baseline-diff primitive (J1-J4/SO1):
    customers with no orders in the final quarter of the data. The
    recency filter is pushed to the orders scan BEFORE the anti-join
    shuffle (every customer has some order across the full 6-year
    range, so the unwindowed form would be a vacuous 0-row query that
    proves nothing about the anti-join)."""
    cat = Catalog(spark, sf_dir)
    recent = cat.orders.filter(
        F.col("o_orderdate") >= F.lit("2001-05-01 00:00:00").cast("timestamp")
    ).select("o_custkey")
    return (
        cat.customer.join(
            recent,
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


@register(
    "returned_orders_by_priority",
    tags=("join", "semi", "agg"),
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def returned_orders_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → left-semi join. The lineitem side is
    filtered and key-projected before the shuffle, so the semi join
    moves keys only."""
    cat = Catalog(spark, sf_dir)
    returned = cat.lineitem.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        cat.orders.join(
            returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@register(
    "first_order_per_customer",
    tags=("window", "dedup"),
    oracle="""
SELECT o_custkey, o_orderkey AS first_orderkey,
       STRFTIME(o_orderdate, '%Y-%m-%d') AS first_orderdate,
       ROUND(o_totalprice, 4) AS first_totalprice
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
    ) AS rn
    FROM orders
)
WHERE rn = 1
ORDER BY o_custkey
""",
)
def first_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-oldest window dedup (W5) — the reference's keep-oldest
    duplicate policy with the deterministic tie-break SURVEY §7.5
    demands. One shuffle on the partition key."""
    from filesystemagent_spark.operators.relational import keep_first

    orders = Catalog(spark, sf_dir).orders
    kept = keep_first(
        orders,
        ["o_custkey"],
        [F.col("o_orderdate").asc(), F.col("o_orderkey").asc()],
    )
    return kept.select(
        "o_custkey",
        F.col("o_orderkey").alias("first_orderkey"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("first_orderdate"),
        F.round("o_totalprice", 4).alias("first_totalprice"),
    ).orderBy("o_custkey")


@register(
    "customer_set_except",
    tags=("setop",),
    oracle="""
SELECT o_custkey AS custkey
FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
ORDER BY custkey
""",
)
def customer_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (SO1): customers active recently who were not
    active early. `exceptAll`-free: EXCEPT is distinct semantics."""
    orders = Catalog(spark, sf_dir).orders
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    ).select(F.col("o_custkey").alias("custkey"))
    early = orders.filter(
        F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp")
    ).select(F.col("o_custkey").alias("custkey"))
    # subtract == EXCEPT DISTINCT (exceptAll would keep multiplicity).
    return recent.subtract(early).orderBy("custkey")


@register(
    "order_status_priority_cube",
    tags=("agg", "cube"),
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
""",
)
def order_status_priority_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE rollup — the free capability upgrade over the reference's
    flat severity×domain counts (SURVEY §2.4). Spark expands grouping
    sets map-side; still a single shuffle."""
    return (
        Catalog(spark, sf_dir)
        .orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(_dec(F.col("o_totalprice"))).cast("double").alias("total_price"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@register(
    "orders_daily_lag",
    tags=("window", "analytic", "lag"),
    oracle="""
WITH daily AS (
    SELECT o_orderdate AS d, COUNT(*) AS n_orders,
           SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev
    FROM orders GROUP BY 1
)
SELECT STRFTIME(d, '%Y-%m-%d') AS order_date,
       n_orders,
       CAST(rev AS DOUBLE) AS revenue,
       CAST(rev - LAG(rev) OVER (ORDER BY d) AS DOUBLE) AS revenue_delta
FROM daily
ORDER BY order_date
""",
)
def orders_daily_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day revenue delta — LAG analytic over the aggregated
    daily series. The unpartitioned window runs on post-agg data (one
    row per day), so the single-partition sort is bounded by the date
    domain, never by fact cardinality."""
    orders = Catalog(spark, sf_dir).orders
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.count("*").alias("n_orders"),
        F.sum(_dec(F.col("o_totalprice"))).alias("rev"),
    )
    w = Window.orderBy("d")
    return (
        daily.withColumn("prev_rev", F.lag("rev").over(w))
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("order_date"),
            "n_orders",
            F.col("rev").cast("double").alias("revenue"),
            (F.col("rev") - F.col("prev_rev")).cast("double").alias("revenue_delta"),
        )
        .orderBy("order_date")
    )


@register(
    "orders_rolling_avg",
    tags=("window", "frame", "streaming-analog"),
    oracle="""
WITH daily AS (
    SELECT o_orderdate AS d,
           SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev
    FROM orders GROUP BY 1
)
SELECT STRFTIME(d, '%Y-%m-%d') AS order_date,
       CAST(rev AS DOUBLE) AS revenue,
       CAST(SUM(rev) OVER w AS DOUBLE) / COUNT(*) OVER w AS rolling_avg_7d
FROM daily
WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
ORDER BY order_date
""",
)
def orders_rolling_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row sliding mean over the daily series — the reference's
    'recent failures over last 10 jobs' sliding check
    (/root/reference/src/monitoring.py:236-247) as a rowsBetween frame.
    Exact decimal frame-sum → IEEE divide keeps engines bit-identical."""
    orders = Catalog(spark, sf_dir).orders
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(_dec(F.col("o_totalprice"))).alias("rev")
    )
    w = Window.orderBy("d").rowsBetween(-6, 0)
    return (
        daily.select(
            F.date_format("d", "yyyy-MM-dd").alias("order_date"),
            F.col("rev").cast("double").alias("revenue"),
            (F.sum("rev").over(w).cast("double") / F.count("*").over(w)).alias(
                "rolling_avg_7d"
            ),
        )
        .orderBy("order_date")
    )


@register(
    "orders_status_pivot",
    tags=("agg", "pivot"),
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS n_f,
       CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS n_o,
       CAST(COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS n_p,
       CAST(SUM(CASE WHEN o_orderstatus = 'F'
                THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS DOUBLE) AS rev_f,
       CAST(SUM(CASE WHEN o_orderstatus = 'O'
                THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS DOUBLE) AS rev_o,
       CAST(SUM(CASE WHEN o_orderstatus = 'P'
                THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS DOUBLE) AS rev_p
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def orders_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide conditional aggregation): status × priority counts
    and revenue. Explicit pivot values keep the plan a single pass —
    no second job to discover the value domain."""
    orders = Catalog(spark, sf_dir).orders
    piv = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec(F.col("o_totalprice"))).cast("double").alias("rev"),
        )
    )
    # COUNT over an empty cell is 0 in SQL but NULL from a pivot.
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("F_n"), F.lit(0)).alias("n_f"),
        F.coalesce(F.col("O_n"), F.lit(0)).alias("n_o"),
        F.coalesce(F.col("P_n"), F.lit(0)).alias("n_p"),
        F.col("F_rev").alias("rev_f"),
        F.col("O_rev").alias("rev_o"),
        F.col("P_rev").alias("rev_p"),
    ).orderBy("o_orderpriority")


@register(
    "nation_order_enrichment",
    tags=("join", "broadcast", "agg", "window"),
    oracle="""
WITH cust_orders AS (
    SELECT n.n_name AS nation_name, o.o_orderkey, o.o_totalprice
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
)
SELECT nation_name, o_orderkey AS top_orderkey,
       ROUND(o_totalprice, 4) AS top_totalprice
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY nation_name ORDER BY o_totalprice DESC, o_orderkey ASC
    ) AS rn
    FROM cust_orders
)
WHERE rn <= 3
ORDER BY nation_name, top_totalprice DESC, top_orderkey
""",
)
def nation_order_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast enrichment (J5-J7 shape) + grouped top-K (W1):
    top-3 orders by value per nation."""
    from filesystemagent_spark.operators.relational import grouped_top_k

    cat = Catalog(spark, sf_dir)
    enriched = (
        cat.orders.join(F.broadcast(cat.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cat.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(F.col("n_name").alias("nation_name"), "o_orderkey", "o_totalprice")
    )
    top = grouped_top_k(
        enriched,
        ["nation_name"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        3,
    )
    return top.select(
        "nation_name",
        F.col("o_orderkey").alias("top_orderkey"),
        F.round("o_totalprice", 4).alias("top_totalprice"),
    ).orderBy("nation_name", F.col("top_totalprice").desc(), "top_orderkey")


@register(
    "order_grouping_sets",
    tags=("agg", "grouping-sets"),
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
""",
)
def order_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — finer than cube (only the three
    requested sets materialize, not the full 2ᵏ lattice) with
    grouping_id disambiguating real NULL keys from rollup rows: the
    correct way to serve the reference's severity-rollup and
    domain-rollup views (SURVEY §2.4 A5) from ONE pass instead of two
    queries. Map-side expand, single shuffle."""
    orders = Catalog(spark, sf_dir).orders
    return (
        orders.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").alias("n_orders"),
            F.sum(_dec(F.col("o_totalprice"))).cast("double").alias("total_price"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n_orders", "total_price")
        .orderBy(
            "gid",
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@register(
    "orders_rolling_range_7d",
    tags=("window", "range-frame", "sql-surface"),
    oracle="""
WITH daily AS (
    SELECT o_orderdate AS d,
           SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev
    FROM orders GROUP BY 1
)
SELECT STRFTIME(d, '%Y-%m-%d') AS order_date,
       CAST(rev AS DOUBLE) AS revenue,
       CAST(SUM(rev) OVER w AS DOUBLE) / COUNT(*) OVER w AS range_avg_7d,
       COUNT(*) OVER w AS days_present
FROM daily
WINDOW w AS (ORDER BY d RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
ORDER BY order_date
""",
)
def orders_rolling_range_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame (vs the ROWS frame of
    `orders_rolling_avg`): the window is the last 7 CALENDAR days, so
    gaps in the series shrink the frame instead of silently reaching
    further back — the correct semantics for irregular time series.
    Runs through the engine's SQL surface (registered catalog views +
    interval range frame), exercising the same Catalyst plan path the
    DataFrame API uses."""
    Catalog(spark, sf_dir).register_views(("orders",))
    return spark.sql("""
        WITH daily AS (
            SELECT o_orderdate AS d,
                   SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev
            FROM orders GROUP BY 1
        )
        SELECT date_format(d, 'yyyy-MM-dd') AS order_date,
               CAST(rev AS DOUBLE) AS revenue,
               CAST(SUM(rev) OVER w AS DOUBLE) / COUNT(*) OVER w AS range_avg_7d,
               COUNT(*) OVER w AS days_present
        FROM daily
        WINDOW w AS (ORDER BY d RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW)
        ORDER BY order_date
    """)


@register(
    "orders_rollup_hierarchy",
    tags=("agg", "rollup", "grouping"),
    oracle="""
SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
       coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY gid, o_orderstatus, o_orderpriority
""",
)
def orders_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL ROLLUP: the status→priority hierarchy with subtotals and a
    grand total in ONE pass (grouping-sets expansion at the partial-agg
    level — no re-scan per level), completing the cube/grouping-sets
    family (`order_status_priority_cube`, `order_grouping_sets`)."""
    orders = Catalog(spark, sf_dir).orders
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").alias("n_orders"),
            F.sum(_dec(F.col("o_totalprice"))).cast("double").alias("total_price"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("o_orderstatus"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("o_orderpriority"),
            "gid",
            "n_orders",
            "total_price",
        )
        .orderBy("gid", "o_orderstatus", "o_orderpriority")
    )


@register(
    "orders_unpivot_metrics",
    tags=("reshape", "unpivot"),
    oracle="""
WITH wide AS (
    SELECT o_orderstatus,
           CAST(COUNT(*) AS DOUBLE) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
    FROM orders GROUP BY o_orderstatus
)
SELECT o_orderstatus, metric, value
FROM wide
UNPIVOT (value FOR metric IN (n_orders, total_price, max_price))
ORDER BY o_orderstatus, metric
""",
)
def orders_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt — the inverse of `orders_status_pivot`: a wide
    per-status metrics row reshaped to (status, metric, value) long
    form, the layout metric stores and plotting layers want. Spark's
    native `unpivot` keeps this JVM-side (an Expand node, same family
    as rollup/cube — no UDF, no python)."""
    orders = Catalog(spark, sf_dir).orders
    wide = orders.groupBy("o_orderstatus").agg(
        F.count("*").cast("double").alias("n_orders"),
        F.sum(_dec(F.col("o_totalprice"))).cast("double").alias("total_price"),
        F.max("o_totalprice").cast("double").alias("max_price"),
    )
    return (
        wide.unpivot(
            ["o_orderstatus"],
            ["n_orders", "total_price", "max_price"],
            "metric",
            "value",
        )
        .orderBy("o_orderstatus", "metric")
    )


@register(
    "customer_balance_pctrank",
    tags=("window", "rank"),
    oracle="""
SELECT c_custkey, c_mktsegment,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 6) AS cume_dist
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY CAST(c_acctbal AS DOUBLE))
ORDER BY c_mktsegment, pct_rank, c_custkey
LIMIT 500
""",
)
def customer_balance_pctrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENT_RANK + CUME_DIST per market segment: relative standing
    of each customer's balance. Both are pure functions of the sort
    RANK, so ties land identically in any engine — no unique tie-break
    needed for the window itself, only for the output order."""
    from pyspark.sql import Window

    cust = Catalog(spark, sf_dir).customer
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").cast("double"))
    return (
        cust.select(
            "c_custkey",
            "c_mktsegment",
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume_dist"),
        )
        .orderBy("c_mktsegment", "pct_rank", "c_custkey")
        .limit(500)
    )


@register(
    "customer_scd2_apply",
    tags=("scd2", "dimension", "full-outer-join"),
    oracle="""
WITH cur AS (SELECT c_custkey, c_mktsegment FROM customer),
chg AS (
    SELECT c_custkey, 'SEG-' || CAST(c_custkey % 3 AS VARCHAR) AS seg
    FROM customer WHERE c_custkey % 7 = 3
    UNION ALL
    SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 7 = 5
    UNION ALL
    SELECT c_custkey + 1000000, 'SEG-NEW' FROM customer WHERE c_custkey % 101 = 0
),
matched AS (
    SELECT c.c_custkey, c.c_mktsegment AS old_seg, g.seg AS new_seg
    FROM cur c JOIN chg g USING (c_custkey)
),
changed AS (SELECT * FROM matched WHERE new_seg <> old_seg),
inserts AS (
    SELECT g.c_custkey, g.seg FROM chg g
    LEFT JOIN cur c USING (c_custkey) WHERE c.c_custkey IS NULL
)
SELECT c_custkey, c_mktsegment, valid_from, valid_to, is_current FROM (
    SELECT c.c_custkey, c.c_mktsegment, '2025-01-01' AS valid_from,
           CAST(NULL AS VARCHAR) AS valid_to, true AS is_current
    FROM cur c LEFT JOIN changed x USING (c_custkey) WHERE x.c_custkey IS NULL
    UNION ALL
    SELECT c_custkey, old_seg, '2025-01-01', '2025-06-01', false FROM changed
    UNION ALL
    SELECT c_custkey, new_seg, '2025-06-01', CAST(NULL AS VARCHAR), true FROM changed
    UNION ALL
    SELECT c_custkey, seg, '2025-06-01', CAST(NULL AS VARCHAR), true FROM inserts
)
ORDER BY c_custkey, valid_from
""",
)
def customer_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension maintenance (operators/scd.py): apply a
    change batch — real segment changes, value-restating no-ops, and
    brand-new keys — to a versioned customer dimension in one
    full-outer join + unions. The no-op branch proves change DETECTION
    (restated values must not spawn versions); the oracle rebuilds the
    whole post-batch dimension independently. The change batch is
    derived deterministically from the customer table itself so both
    engines see identical input at any SF."""
    from filesystemagent_spark.operators.scd import scd2_apply

    c = Catalog(spark, sf_dir).customer
    dim = c.select(
        "c_custkey",
        "c_mktsegment",
        F.lit("2025-01-01").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    changes = (
        c.filter(F.col("c_custkey") % 7 == 3)
        .select(
            "c_custkey",
            F.concat(F.lit("SEG-"), (F.col("c_custkey") % 3).cast("string")).alias(
                "c_mktsegment"
            ),
        )
        .unionByName(
            c.filter(F.col("c_custkey") % 7 == 5).select("c_custkey", "c_mktsegment")
        )
        .unionByName(
            c.filter(F.col("c_custkey") % 101 == 0).select(
                (F.col("c_custkey") + 1000000).alias("c_custkey"),
                F.lit("SEG-NEW").alias("c_mktsegment"),
            )
        )
    )
    return scd2_apply(
        dim, changes, "c_custkey", ["c_mktsegment"], "2025-06-01"
    ).orderBy("c_custkey", "valid_from")


_PIPE_SQL = """
FROM orders
|> WHERE o_orderstatus = 'F'
|> AGGREGATE COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price
   GROUP BY o_orderpriority
|> ORDER BY o_orderpriority
"""


@register(
    "orders_pipe_syntax",
    tags=("sql-surface", "pipe-syntax", "agg"),
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price
FROM orders
WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def orders_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe-operator surface (Spark 4 `|>` syntax): the same
    filter→aggregate→order pipeline expressed as sequential pipe
    stages. Catalyst compiles it to the identical plan as the classic
    form — this gate pins that the alternative surface parses and
    produces exact results (the oracle runs the classic SQL)."""
    Catalog(spark, sf_dir).register_views(("orders",))
    return spark.sql(_PIPE_SQL)


@register(
    "customer_set_intersect",
    tags=("setop",),
    oracle="""
SELECT o_custkey AS custkey
FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
ORDER BY custkey
""",
)
def customer_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics) — completes the set-op family
    (SURVEY §2.6 notes the reference never needs it; the engine
    provides it anyway). Catalyst plans this as a left-semi join over
    distinct projections: one shuffle per side at the key's grain."""
    orders = Catalog(spark, sf_dir).orders
    closed = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    open_ = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    return closed.intersect(open_).orderBy("custkey")
