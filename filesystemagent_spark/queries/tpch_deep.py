"""Deeper relational shapes over the TPC-H-ish tables.

These extend `queries/tpch_like.py` with the classic decision-support
query *shapes* the reference's analytics never needed but a complete
engine must handle well at 100 TB: correlated EXISTS, scalar
subqueries against aggregates, group-by-HAVING joined back to facts,
disjunctive pushdown predicates, distinct aggregation with NOT-IN
exclusion, and multi-way joins that reuse one dimension under two
roles. Adapted to the reduced driver schema (TESTDATA.md — no
partsupp/phone/shipmode columns).

Scale stance (same as tpch_like.py): dims broadcast, facts shuffle at
most once per true key change, scalar aggregates cross-joined as
1-row broadcasts — never collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filesystemagent_spark.catalog import Catalog
from filesystemagent_spark.queries import register

# Exact money arithmetic (see tpch_like.py): DECIMAL(18,6) partial
# sums are order-independent, so both engines agree bit-for-bit.
def _dec(c):
    return c.cast("decimal(18,6)")


_REV = None  # revenue expression built per-query (needs live columns)


def _revenue():
    return _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))


@register(
    "shipping_priority",
    headline=True,
    tags=("join", "agg", "topk", "filter"),
    oracle="""
SELECT l.l_orderkey,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       STRFTIME(o.o_orderdate, '%Y-%m-%d') AS orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-07-01 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
""",
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: unshipped orders of one segment ranked by value.

    Both date predicates and the segment filter push into the parquet
    scans, shrinking BOTH fact sides before the orderkey shuffle; the
    filtered customer dim broadcasts. Top-K is TakeOrdered (no global
    sort). Reference analog: ranked findings views (SURVEY §2.5 W3).
    """
    cat = Catalog(spark, sf_dir)
    cutoff = F.lit("1998-07-01 00:00:00").cast("timestamp")
    building = cat.customer.filter(F.col("c_mktsegment") == "BUILDING")
    open_orders = cat.orders.filter(F.col("o_orderdate") < cutoff)
    late_items = cat.lineitem.filter(F.col("l_shipdate") > cutoff)
    return (
        late_items.join(open_orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(building), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@register(
    "volume_shipping_pairs",
    tags=("join", "broadcast", "agg", "multi-role-dim"),
    oracle="""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS ship_year,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
JOIN region sr  ON sn.n_regionkey = sr.r_regionkey
JOIN region cr  ON cn.n_regionkey = cr.r_regionkey
WHERE sr.r_name = 'EUROPE' AND cr.r_name = 'EUROPE'
  AND sn.n_nationkey <> cn.n_nationkey
GROUP BY supp_nation, cust_nation, ship_year
ORDER BY supp_nation, cust_nation, ship_year
""",
)
def volume_shipping_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-border trade volume between EU nations.

    The nation dim participates under TWO roles (supplier side and
    customer side) — aliased broadcasts, not a self-shuffle. The only
    fact shuffle is lineitem⋈orders on orderkey; every dim hop after
    it is map-side. Region filters prune the nation broadcasts before
    they ship.
    """
    cat = Catalog(spark, sf_dir)
    eu = cat.region.filter(F.col("r_name") == "EUROPE")
    # nation ⋈ region collapses to one tiny broadcast per role.
    eu_nation = (
        cat.nation.join(F.broadcast(eu), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    supp_n = eu_nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cust_n = eu_nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        cat.lineitem.join(cat.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cat.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cat.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(supp_n), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cust_n), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("sn_key") != F.col("cn_key"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


@register(
    "national_market_share",
    tags=("join", "agg", "conditional-agg", "share"),
    oracle="""
WITH eu_sales AS (
    SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS order_year,
           sn.n_name AS supp_nation,
           CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)) AS volume
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    JOIN region cr  ON cn.n_regionkey = cr.r_regionkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    WHERE cr.r_name = 'EUROPE'
)
SELECT order_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN volume END) AS DOUBLE)
         / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM eu_sales
GROUP BY order_year
ORDER BY order_year
""",
)
def national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of a region's
    market per year — conditional aggregation (share-of-total without
    a second pass or a window). Exact decimal numerator/denominator →
    one IEEE divide keeps both engines identical."""
    cat = Catalog(spark, sf_dir)
    eu = cat.region.filter(F.col("r_name") == "EUROPE")
    cust_nation = (
        cat.nation.join(F.broadcast(eu), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    supp_nation = cat.nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    sales = (
        cat.lineitem.join(cat.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cat.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cust_nation), F.col("c_nationkey") == F.col("cn_key"), "inner")
        .join(F.broadcast(cat.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("sn_key"))
    )
    volume = _revenue()
    return (
        sales.groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_7", volume)).cast("double")
                / F.sum(volume).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("order_year")
    )


@register(
    "promo_revenue_share",
    tags=("join", "broadcast", "conditional-agg", "share"),
    oracle="""
SELECT STRFTIME(DATE_TRUNC('month', l.l_shipdate), '%Y-%m') AS ship_month,
       CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)) END) AS DOUBLE) * 100
         / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE)
         AS promo_share_pct
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY ship_month
ORDER BY ship_month
""",
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: monthly % of revenue from promo parts.
    lineitem⋈part is the canonical fact-dim broadcast (part never
    drags the fact through a shuffle); the month series comes out of
    one aggregation."""
    cat = Catalog(spark, sf_dir)
    rev = _revenue()
    return (
        cat.lineitem.join(
            F.broadcast(cat.part), F.col("l_partkey") == F.col("p_partkey")
        )
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            (
                F.sum(F.when(F.col("p_type") == "PROMO", rev)).cast("double") * 100
                / F.sum(rev).cast("double")
            ).alias("promo_share_pct")
        )
        .orderBy("ship_month")
    )


@register(
    "brand_supplier_counts",
    tags=("join", "distinct-agg", "anti", "not-in"),
    oracle="""
SELECT p.p_brand,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_type <> 'PROMO'
  AND p.p_size BETWEEN 1 AND 25
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand
ORDER BY supplier_cnt DESC, p_brand
""",
)
def brand_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per brand with a
    NOT-IN exclusion list. The exclusion is a broadcast anti-join (the
    excluded-key set is tiny by construction); COUNT(DISTINCT) is
    Spark's two-phase expand — no driver-side set."""
    cat = Catalog(spark, sf_dir)
    excluded = cat.supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    parts = cat.part.filter(
        (F.col("p_type") != "PROMO") & F.col("p_size").between(1, 25)
    )
    return (
        cat.lineitem.join(
            F.broadcast(excluded), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
        )
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.countDistinct("l_suppkey").alias("supplier_cnt"),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.col("supplier_cnt").desc(), F.col("p_brand").asc())
    )


@register(
    "large_orders",
    headline=True,
    tags=("agg", "having", "join-back", "topk"),
    oracle="""
WITH big AS (
    SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,6))) AS sum_qty
    FROM lineitem
    GROUP BY l_orderkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 200
)
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       STRFTIME(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       ROUND(o.o_totalprice, 4) AS totalprice,
       CAST(big.sum_qty AS DOUBLE) AS sum_qty
FROM big
JOIN orders o   ON big.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY totalprice DESC, o_orderkey ASC
LIMIT 100
""",
)
def large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: group-by-HAVING joined back to the facts.

    The heavy groupBy runs FIRST and shrinks lineitem to qualifying
    orderkeys (~0.1% of orders), so the join back to orders moves a
    tiny aggregated side; AQE turns it into a broadcast at runtime.
    Reference analog: duplicate groups (HAVING n>1) rejoined to
    members — SURVEY §2.3 J10 — at order granularity.
    """
    cat = Catalog(spark, sf_dir)
    big = (
        cat.lineitem.groupBy("l_orderkey")
        .agg(F.sum(_dec(F.col("l_quantity"))).alias("sum_qty"))
        .filter(F.col("sum_qty") > 200)
    )
    return (
        big.join(cat.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cat.customer), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 4).alias("totalprice"),
            F.col("sum_qty").cast("double").alias("sum_qty"),
        )
        .orderBy(F.col("totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


@register(
    "disjunctive_part_revenue",
    tags=("join", "filter", "disjunctive-pushdown"),
    oracle="""
SELECT CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1'  AND p.p_size BETWEEN 1 AND 5   AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 10  AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 15  AND l.l_quantity BETWEEN 20 AND 30)
""",
)
def disjunctive_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs spanning both join sides.

    Catalyst splits the disjunction: the part-only branches
    (brand/size) union-prune the broadcast dim, and the quantity
    bounds derived from the OR (min of lows, max of highs) push into
    the lineitem scan — the join then re-checks the full predicate.
    """
    cat = Catalog(spark, sf_dir)
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    branches = (
        ((b == "Brand#1") & s.between(1, 5) & q.between(1, 11))
        | ((b == "Brand#12") & s.between(1, 10) & q.between(10, 20))
        | ((b == "Brand#23") & s.between(1, 15) & q.between(20, 30))
    )
    return (
        cat.lineitem.join(
            F.broadcast(cat.part), F.col("l_partkey") == F.col("p_partkey")
        )
        .filter(branches)
        .agg(
            F.sum(_revenue()).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "top_revenue_suppliers",
    tags=("agg", "scalar-subquery", "join"),
    oracle="""
WITH supp_rev AS (
    SELECT l_suppkey,
           SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS total_rev
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, CAST(sr.total_rev AS DOUBLE) AS total_rev
FROM supp_rev sr
JOIN supplier s ON sr.l_suppkey = s.s_suppkey
WHERE sr.total_rev = (SELECT MAX(total_rev) FROM supp_rev)
ORDER BY s_suppkey
""",
)
def top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: rows matching a scalar aggregate of their own
    aggregation (max-revenue supplier, ties kept).

    The scalar MAX is a 1-row DataFrame cross-joined as a broadcast —
    the idiomatic Spark scalar subquery; nothing is collected.
    Equality on revenue is safe because both sides carry the exact
    decimal sum (not a rounded double).
    """
    cat = Catalog(spark, sf_dir)
    window = (
        F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
    ) & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    supp_rev = (
        cat.lineitem.filter(window)
        .groupBy("l_suppkey")
        .agg(F.sum(_revenue()).alias("total_rev"))
    )
    max_rev = supp_rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        supp_rev.join(F.broadcast(max_rev), F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(cat.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_rev"))
        .orderBy("s_suppkey")
    )


@register(
    "idle_rich_customers",
    tags=("anti", "scalar-subquery", "agg"),
    oracle="""
WITH thr AS (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_bal
    FROM customer WHERE c_acctbal > 0
)
SELECT c.c_mktsegment,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_bal
FROM customer c, thr
WHERE c.c_acctbal > thr.avg_bal
  AND c.c_custkey NOT IN (
      SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2001-05-01 00:00:00'
  )
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
""",
)
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average balances with no orders —
    scalar-aggregate threshold (broadcast 1-row cross join) composed
    with the anti-join primitive (SURVEY §2.3 J1-J4). 'No orders' is
    windowed to the final quarter (all customers order at least once
    over the full range — unwindowed, the query is vacuously empty);
    the orders side is date-filtered and key-projected before the
    anti-join shuffle."""
    cat = Catalog(spark, sf_dir)
    thr = (
        cat.customer.filter(F.col("c_acctbal") > 0)
        .agg(
            (F.sum(_dec(F.col("c_acctbal"))).cast("double") / F.count("*")).alias(
                "avg_bal"
            )
        )
    )
    return (
        cat.customer.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            cat.orders.filter(
                F.col("o_orderdate") >= F.lit("2001-05-01 00:00:00").cast("timestamp")
            ).select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(_dec(F.col("c_acctbal"))).cast("double").alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "suppliers_sole_late",
    tags=("agg", "exists", "not-exists", "rewrite"),
    oracle="""
WITH flagged AS (
    SELECT l.l_orderkey, l.l_suppkey,
           MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
               THEN 1 ELSE 0 END) AS is_late
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY l.l_orderkey, l.l_suppkey
), per_order AS (
    SELECT l_orderkey,
           COUNT(*) AS n_suppliers,
           SUM(is_late) AS n_late,
           MAX(CASE WHEN is_late = 1 THEN l_suppkey END) AS late_supp
    FROM flagged
    GROUP BY l_orderkey
)
SELECT s.s_suppkey, s.s_name, COUNT(*) AS numwait
FROM per_order p
JOIN supplier s ON p.late_supp = s.s_suppkey
WHERE p.n_suppliers > 1 AND p.n_late = 1
GROUP BY s.s_suppkey, s.s_name
ORDER BY numwait DESC, s_suppkey ASC
LIMIT 20
""",
)
def suppliers_sole_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers solely responsible for a late
    multi-supplier order ("late" = shipped >90 days after order,
    adapted to the reduced schema).

    The textbook formulation is EXISTS + NOT-EXISTS correlated
    self-joins — three passes over lineitem. Rewritten as two
    aggregation levels over ONE lineitem⋈orders pass: per
    (order, supplier) late-flags, then per-order supplier/late
    counts. Same semantics, one fact shuffle instead of three —
    the rewrite that matters at 100 TB.
    """
    cat = Catalog(spark, sf_dir)
    flagged = (
        cat.lineitem.join(cat.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
                    1,
                ).otherwise(0)
            ).alias("is_late")
        )
    )
    per_order = flagged.groupBy("l_orderkey").agg(
        F.count("*").alias("n_suppliers"),
        F.sum("is_late").alias("n_late"),
        F.max(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).alias("late_supp"),
    )
    return (
        per_order.filter((F.col("n_suppliers") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(cat.supplier), F.col("late_supp") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_suppkey").asc())
        .limit(20)
    )


@register(
    "customer_running_totals",
    tags=("window", "cumulative", "frame"),
    oracle="""
SELECT o_custkey, o_orderkey,
       STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
           PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS lifetime_value,
       CAST(ROW_NUMBER() OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
       ) AS BIGINT) AS order_seq
FROM orders
ORDER BY o_custkey, order_seq
""",
)
def customer_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer cumulative lifetime value — a fact-cardinality
    running window (unlike the daily-series windows, this one runs on
    every order row). One shuffle on the partition key; the frame is
    rows-based with a deterministic (date, orderkey) order so the
    exact decimal running sum is reproducible. At 100 TB this is the
    shape incremental feature pipelines use for 'customer state as of
    each order'."""
    from pyspark.sql import Window

    orders = Catalog(spark, sf_dir).orders
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ws = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.sum(_dec(F.col("o_totalprice"))).over(w).cast("double").alias(
                "lifetime_value"
            ),
            F.row_number().over(ws).cast("long").alias("order_seq"),
        )
        .orderBy("o_custkey", "order_seq")
    )


from filesystemagent_spark.functions.spatial import morton2, morton2_sql  # noqa: E402


@register(
    "part_zorder_keys",
    tags=("layout", "zorder", "morton"),
    oracle=f"""
SELECT p_partkey,
       CAST({morton2_sql('p_size', 'p_partkey % 1024', 10)} AS BIGINT) AS zkey
FROM part
ORDER BY zkey, p_partkey
""",
)
def part_zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton/Z-order key over (p_size, partkey slot) — the sort key
    that makes parquet min/max stats selective for BOTH dimensions
    (pair with layout.write_partitioned(sort_within=['zkey'])). Pure
    JVM bit interleave, mirrored bit-for-bit in the DuckDB oracle."""
    part = Catalog(spark, sf_dir).part
    return (
        part.select(
            "p_partkey",
            morton2(F.col("p_size"), F.col("p_partkey") % 1024, bits=10).alias("zkey"),
        )
        .orderBy("zkey", "p_partkey")
    )


@register(
    "orders_priority_semi",
    tags=("join", "semi", "exists"),
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def orders_priority_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: per-priority count of orders with at least one
    slow-shipping lineitem — a correlated EXISTS executed as a LEFT
    SEMI join on the fact key. Semi-join (not inner+distinct) is the
    scale-correct form: the probe emits each order at most once, so no
    post-join dedup shuffle, and the ship-lag predicate rides inside
    the join condition. (Distinct join type from the anti-joins of
    J1-J4/`customers_without_orders` — SURVEY §2.3 noted semi was
    otherwise absent.)"""
    cat = Catalog(spark, sf_dir)
    o, l = cat.orders, cat.lineitem
    slow = o.join(
        l,
        (o["o_orderkey"] == l["l_orderkey"])
        & (l["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 60 DAY")),
        "left_semi",
    )
    return (
        slow.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@register(
    "small_quantity_revenue",
    tags=("join", "correlated-agg", "tpch-q17"),
    oracle="""
WITH part_avg AS (
    SELECT l_partkey, SUM(CAST(l_quantity AS DECIMAL(18,6))) / COUNT(*) AS avg_qty
    FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0
           AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN part_avg a ON a.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1'
  AND CAST(l.l_quantity AS DECIMAL(18,6)) < 0.2 * a.avg_qty
""",
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from orders below 20% of each part's
    average quantity. The correlated scalar subquery (per-part AVG)
    becomes a pre-aggregated join-back: one fact shuffle computes the
    per-key averages, the filtered fact joins against that reduced
    side (AQE broadcasts it once the brand filter shrinks it), and no
    per-row re-aggregation ever runs. Decimal average: exact SUM /
    COUNT in both engines, compared in decimal space before any
    double conversion."""
    cat = Catalog(spark, sf_dir)
    l, p = cat.lineitem, cat.part
    part_avg = l.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (F.sum(_dec(F.col("l_quantity"))) / F.count("*")).alias("avg_qty")
    )
    brand = p.filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    joined = (
        l.join(F.broadcast(brand), l["l_partkey"] == brand["p_partkey"])
        .join(part_avg, l["l_partkey"] == F.col("_pk"))
        .filter(_dec(F.col("l_quantity")) < 0.2 * F.col("avg_qty"))
    )
    return joined.agg(
        (F.sum(_dec(F.col("l_extendedprice"))).cast("double") / 7.0).alias("avg_yearly"),
        F.count("*").alias("n_lines"),
    )


@register(
    "nation_profit_by_year",
    tags=("join", "broadcast", "agg", "tpch-q9"),
    oracle="""
SELECT n.n_name AS nation,
       CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS ship_year,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE)
           AS profit
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%red%'
GROUP BY nation, ship_year
ORDER BY nation ASC, ship_year DESC
""",
)
def nation_profit_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-line profit by supplier nation and
    ship year. Star join over two independent dims: the name-filtered
    part dim prunes the fact FIRST (broadcast semi-reduction — the
    biggest row-count drop available), then supplier→nation resolve
    map-side as chained broadcasts. One fact shuffle total, at the
    final (nation, year) aggregation."""
    cat = Catalog(spark, sf_dir)
    red_parts = cat.part.filter(F.col("p_name").contains("red")).select("p_partkey")
    sup_nation = cat.supplier.join(
        F.broadcast(cat.nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "n_name")
    return (
        cat.lineitem.join(
            F.broadcast(red_parts), F.col("l_partkey") == F.col("p_partkey")
        )
        .join(F.broadcast(sup_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(F.sum(_revenue()).cast("double").alias("profit"))
        .orderBy(F.col("nation").asc(), F.col("ship_year").desc())
    )


@register(
    "nation_supplier_value",
    tags=("agg", "scalar-subquery", "having", "tpch-q11"),
    oracle="""
WITH tot AS (
    SELECT SUM(CAST(s_acctbal AS DECIMAL(18,6))) AS t FROM supplier
)
SELECT n.n_name AS nation,
       CAST(SUM(CAST(s.s_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_bal
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
GROUP BY nation
HAVING SUM(CAST(s.s_acctbal AS DECIMAL(18,6))) > (SELECT t FROM tot) * CAST(0.04 AS DECIMAL(4,2))
ORDER BY total_bal DESC, nation ASC
""",
)
def nation_supplier_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: nations holding an outsized share of global
    supplier account value. The global total is a scalar aggregate of
    the SAME table the groups come from — computed once and
    cross-joined as a 1-row broadcast (never collected to the
    driver), with the HAVING comparison done in exact decimal so the
    4% threshold cuts identically in both engines."""
    cat = Catalog(spark, sf_dir)
    sup = cat.supplier.join(
        F.broadcast(cat.nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    total = sup.agg(F.sum(_dec(F.col("s_acctbal"))).alias("_t"))
    return (
        sup.groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(_dec(F.col("s_acctbal"))).alias("_bal"))
        .join(F.broadcast(total))
        .filter(F.col("_bal") > F.col("_t") * F.lit(0.04).cast("decimal(4,2)"))
        .select("nation", F.col("_bal").cast("double").alias("total_bal"))
        .orderBy(F.col("total_bal").desc(), F.col("nation").asc())
    )


@register(
    "orders_custdist",
    tags=("outer-join", "agg-of-agg", "tpch-q13"),
    oracle="""
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
    FROM customer c
    LEFT JOIN orders o
      ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
    GROUP BY c.c_custkey
) per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def orders_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count,
    INCLUDING zero-order customers — the left-outer join that an
    inner-join rewrite silently gets wrong. Two cascaded aggregations:
    the first shuffles facts by custkey (COUNT ignores the nulls the
    outer join injects), the second re-groups the per-customer counts
    — node-cardinality data, coalesced by AQE."""
    cat = Catalog(spark, sf_dir)
    filtered = cat.orders.filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        cat.customer.join(
            filtered, F.col("o_custkey") == F.col("c_custkey"), "left"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "forecast_revenue",
    tags=("filter", "agg", "tpch-q6"),
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE)
           AS promo_revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the pure scan-filter-aggregate query. Every
    predicate pushes into the parquet scan (range skipping on shipdate
    plus row-group min/max on discount/quantity), so at 100 TB the
    plan reads only the matching row groups of 4 columns and ships a
    single partial-agg row per task — no shuffle of row data at all.
    Reference analog: wasted-space metric (SURVEY §2.4 A2) — a global
    conditional aggregate."""
    li = Catalog(spark, sf_dir).lineitem
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(_dec(F.col("l_extendedprice") * F.col("l_discount")))
        .cast("double")
        .alias("promo_revenue"),
        F.count("*").alias("n_items"),
    )


@register(
    "returned_item_losses",
    tags=("join", "agg", "topk", "tpch-q10"),
    oracle="""
SELECT c.c_custkey,
       c.c_name,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE)
           AS revenue,
       CAST(c.c_acctbal AS DOUBLE) AS c_acctbal,
       n.n_name AS nation
FROM customer c
JOIN orders o    ON o.o_custkey = c.c_custkey
JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
JOIN nation n    ON n.n_nationkey = c.c_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
)
def returned_item_losses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in
    one quarter.

    Scale plan: the returnflag filter pushes into the lineitem scan
    and the quarter predicate into the orders scan; lineitem partially
    aggregates to ORDER grain before any join, so the orderkey
    exchange carries one row per order, not one per line. The reduced
    orders slice joins by orderkey (AQE broadcasts it at small SF; at
    cluster scale it is a shuffle join of two already-reduced sides),
    then re-aggregates at customer grain, joins the customer
    dimension, and broadcasts nation. Top-K is TakeOrdered with a
    custkey tie-break."""
    cat = Catalog(spark, sf_dir)
    q_orders = cat.orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    returned = (
        cat.lineitem.filter(F.col("l_returnflag") == "R")
        .groupBy("l_orderkey")
        .agg(F.sum(_revenue()).alias("rev"))
    )
    per_cust = (
        returned.join(q_orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum("rev").alias("rev"))
    )
    return (
        per_cust.join(cat.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(cat.nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "c_custkey",
            "c_name",
            F.col("rev").cast("double").alias("revenue"),
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
            F.col("n_name").alias("nation"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )
