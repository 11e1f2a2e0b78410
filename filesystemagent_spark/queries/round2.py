"""Round-2 API-surface extensions.

Capability classes a complete Spark-native engine exposes that round 1
had not yet put behind the driver gate:

- correlated LATERAL subqueries (per-row dependent top-k, the SQL:2016
  surface Catalyst rewrites into a ranked window / join);
- cogrouped ``applyInPandas`` (two keyed streams meeting in one Arrow
  batch per key — the pandas-native as-of merge);
- ``mapInArrow`` (zero-copy RecordBatch transforms, the lowest-overhead
  Python boundary Spark offers);
- Apache DataSketches HLL columns (``hll_sketch_agg`` /
  ``hll_union_agg``) — *mergeable* sketch state, the re-aggregatable
  form a 100 TB rollup pipeline stores instead of raw ids;
- ``approx_top_k`` frequent-items sketch;
- three more classic planner shapes over the reduced schema (TPC-H
  Q2/Q12/Q20 analogues: correlated-min join-back, conditional
  aggregation over a fact join, dominance vs a scalar share threshold).

The reference never needed any of these (its analytics are dict loops —
SURVEY.md §2.3 "notably absent"); they are part of the "beyond the
reference" training-pipeline/engine-completeness bar.

Scale stance: LATERAL compiles to the same ranked-window plan as
`grouped_top_k` (no per-row re-scan); cogroup shuffles each side once
on the key; mapInArrow streams batches without pandas conversion; HLL
partials are fixed-size and merge associatively (the whole point);
Q2/Q20 shapes aggregate facts to the join grain before any join-back.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filesystemagent_spark.catalog import Catalog
from filesystemagent_spark.queries import register


def _dec(c):
    return c.cast("decimal(18,6)")


# --------------------------------------------------------------------
# Correlated LATERAL subquery — per-customer dependent top-k
# --------------------------------------------------------------------

_LATERAL_SQL = """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c, LATERAL (
    SELECT o_orderkey, o_totalprice
    FROM orders o
    WHERE o.o_custkey = c.c_custkey
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 3
) t
WHERE c.c_acctbal > 9000
ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey
"""


@register(
    "orders_lateral_topk",
    tags=("sql", "lateral", "topk"),
    oracle=_LATERAL_SQL,
)
def orders_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL: top-3 orders per rich customer, written as a
    dependent subquery. The SAME SQL text runs on DuckDB. Catalyst
    decorrelates this into a ranked-window + join plan — per-key work,
    not a per-row re-scan of orders — so the surface is sugar over the
    `grouped_top_k` shape and inherits its scale properties. Prices
    pass through unarithmetic'd, so values hash exactly; ties break on
    o_orderkey in both engines."""
    Catalog(spark, sf_dir).register_views(("customer", "orders"))
    return spark.sql(_LATERAL_SQL)


# --------------------------------------------------------------------
# Cogrouped applyInPandas — pandas-native as-of merge
# --------------------------------------------------------------------


@register(
    "events_cogroup_asof",
    tags=("pandas", "cogroup", "asof"),
    oracle="""
WITH p AS (SELECT event_id AS p_id, user_id, ts FROM events WHERE event_type = 'purchase'),
     v AS (SELECT event_id AS v_id, user_id, ts FROM events WHERE event_type = 'view'),
     best AS (
         SELECT p.p_id, v.v_id, v.ts AS v_ts,
                ROW_NUMBER() OVER (PARTITION BY p.p_id
                                   ORDER BY v.ts DESC, v.v_id DESC) AS rn
         FROM p JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts
     )
SELECT p.user_id, p.p_id, b.v_id,
       CAST(epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(b.v_ts AS TIMESTAMP)) AS BIGINT) AS gap_us
FROM p LEFT JOIN (SELECT p_id, v_id, v_ts FROM best WHERE rn = 1) b
  ON b.p_id = p.p_id
ORDER BY p.p_id
""",
)
def events_cogroup_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via ``cogroup().applyInPandas`` — the third as-of
    construction in the engine (union+window `operators/temporal.py`,
    DuckDB-native oracle, and now the cogrouped-pandas form), here to
    put the cogroup API itself behind the oracle gate. Each user's
    purchases and views arrive as one pair of Arrow-backed pandas
    frames; ``pd.merge_asof`` (backward, exact matches allowed) picks
    the latest view at-or-before each purchase, ties on v_ts resolved
    to the highest v_id by the right-frame sort order — the exact rule
    the oracle's window spells out. One shuffle per side on user_id;
    per-group state is bounded by that user's rows."""
    from filesystemagent_spark.functions.tscompat import epoch_micros

    ev = Catalog(spark, sf_dir).events
    # Pre-hash both sides on the cogroup key at cluster parallelism —
    # satisfies the cogroup's ClusteredDistribution so no further
    # shuffle, and avoids 200-micro-partition Arrow round-trips under
    # a default-config session (same finding as events_user_seq).
    par = spark.sparkContext.defaultParallelism
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("event_id").alias("p_id"), F.col("ts").alias("p_ts"))
        .repartition(par, "user_id")
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .select("user_id", F.col("event_id").alias("v_id"), F.col("ts").alias("v_ts"))
        .repartition(par, "user_id")
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(
                columns=["user_id", "p_id", "v_id", "p_ts", "v_ts"]
            )
        left = left.sort_values("p_ts", kind="mergesort")
        if right.empty:
            out = left.copy()
            out["v_id"] = pd.array([None] * len(out), dtype="Int64")
            out["v_ts"] = pd.NaT
            return out[["user_id", "p_id", "v_id", "p_ts", "v_ts"]]
        # merge_asof keeps the LAST right row at equal v_ts — sorting
        # by (v_ts, v_id) makes that the max v_id, deterministically.
        right = right.sort_values(["v_ts", "v_id"], kind="mergesort")
        merged = pd.merge_asof(
            left,
            right[["v_ts", "v_id"]],
            left_on="p_ts",
            right_on="v_ts",
            direction="backward",
            allow_exact_matches=True,
        )
        merged["v_id"] = merged["v_id"].astype("Int64")
        return merged[["user_id", "p_id", "v_id", "p_ts", "v_ts"]]

    merged = (
        purchases.groupBy("user_id")
        .cogroup(views.groupBy("user_id"))
        .applyInPandas(
            merge,
            schema="user_id long, p_id long, v_id long, "
            "p_ts timestamp_ntz, v_ts timestamp_ntz",
        )
    )
    return merged.select(
        "user_id",
        "p_id",
        "v_id",
        (epoch_micros("p_ts") - epoch_micros("v_ts")).alias("gap_us"),
    ).orderBy("p_id")


# --------------------------------------------------------------------
# mapInArrow — zero-copy RecordBatch vector math
# --------------------------------------------------------------------

_NORM_SQL = (
    "sqrt(list_sum(list_transform(generate_series(1, 64), "
    "i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))"
)


@register(
    "embedding_norms_arrow",
    tags=("vector", "arrow", "mapInArrow"),
    oracle=f"""
SELECT vec_id, ROUND({_NORM_SQL}, 6) AS l2_norm
FROM embeddings
ORDER BY vec_id
""",
)
def embedding_norms_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 norms through ``mapInArrow``: the RecordBatch arrives as raw
    Arrow buffers (list offsets + flat float32 values), numpy squares
    and segment-sums them with no pandas materialization — the
    cheapest Python boundary for bulk vector work when a JVM
    higher-order function isn't enough. Accumulation is sequential
    left-to-right in float64 (np.add.reduceat), the same order
    `F.aggregate` and the DuckDB oracle fold in, so values hash
    exactly against `embedding_norms`' oracle form."""
    import numpy as np
    import pyarrow as pa

    emb = Catalog(spark, sf_dir).embeddings.select("vec_id", "embedding")

    def norms(batches):
        for batch in batches:
            ids = batch.column("vec_id")
            lists = batch.column("embedding")
            if isinstance(lists, pa.ChunkedArray):
                lists = lists.combine_chunks()
            flat = lists.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            offsets = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            sq = flat * flat
            if len(offsets) > 1:
                sums = np.add.reduceat(sq, offsets[:-1])
                # empty lists: reduceat returns the element AT the
                # offset; none occur here (DIM=64 throughout), guarded
                # by the schema contract.
                norms_ = np.round(np.sqrt(sums), 6)
            else:
                norms_ = np.empty(0)
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(norms_, type=pa.float64())],
                names=["vec_id", "l2_norm"],
            )

    return emb.mapInArrow(norms, schema="vec_id long, l2_norm double").orderBy(
        "vec_id"
    )


# --------------------------------------------------------------------
# TPC-H Q12 shape — conditional aggregation over a fact-fact join
# --------------------------------------------------------------------


@register(
    "late_ship_priority_counts",
    tags=("join", "agg", "conditional"),
    oracle="""
SELECT l.l_returnflag,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_priority_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
GROUP BY l.l_returnflag
ORDER BY l.l_returnflag
""",
)
def late_ship_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: line items shipped >60 days after order date,
    split into high/low priority counts per return flag. The
    cross-table predicate (shipdate vs orderdate) cannot push below
    the join — the planner-relevant part of Q12 — but both scans still
    prune to the 3 columns each side contributes, and the counts are
    exact ints (hash-stable by construction)."""
    cat = Catalog(spark, sf_dir)
    o = cat.orders.select("o_orderkey", "o_custkey", "o_orderpriority", "o_orderdate")
    l = cat.lineitem.select("l_orderkey", "l_returnflag", "l_shipdate")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_priority_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_priority_count"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------
# TPC-H Q2 shape — correlated minimum, join-back on the min row
# --------------------------------------------------------------------


@register(
    "part_min_cost_supplier",
    tags=("join", "agg", "correlated-min"),
    oracle="""
WITH cost AS (
    SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS min_price
    FROM lineitem GROUP BY l_partkey, l_suppkey
), best AS (
    SELECT l_partkey, MIN(min_price) AS best_price FROM cost GROUP BY l_partkey
)
SELECT p.p_partkey, s.s_name, n.n_name, c.min_price AS best_price
FROM part p
JOIN best b ON b.l_partkey = p.p_partkey
JOIN cost c ON c.l_partkey = p.p_partkey AND c.min_price = b.best_price
JOIN supplier s ON s.s_suppkey = c.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_type = 'PROMO' AND p.p_size <= 10
ORDER BY p.p_partkey, s.s_suppkey
""",
)
def part_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape on the reduced schema (lineitem stands in for
    partsupp): for each small PROMO part, the supplier(s) offering its
    global minimum price — the correlated-scalar-MIN pattern executed
    as aggregate → join-back-on-equality, never a per-part subquery
    re-scan. The per-(part,supplier) grain collapses BEFORE any join
    (one fact shuffle); the part filter semi-reduces everything
    downstream; ties (several suppliers at the min) are kept, exactly
    as Q2 does. min_price passes through unarithmetic'd — exact."""
    cat = Catalog(spark, sf_dir)
    parts = cat.part.filter(
        (F.col("p_type") == "PROMO") & (F.col("p_size") <= 10)
    ).select("p_partkey")
    cost = (
        cat.lineitem.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("min_price"))
    )
    from pyspark.sql import Window

    # join-back on the min via a window over the same partitioning the
    # aggregation just produced — no second shuffle, no self-join.
    w = Window.partitionBy("l_partkey")
    best = cost.withColumn("best_price", F.min("min_price").over(w)).filter(
        F.col("min_price") == F.col("best_price")
    )
    sup = cat.supplier.select("s_suppkey", "s_name", "s_nationkey")
    nat = cat.nation.select("n_nationkey", "n_name")
    return (
        best.join(F.broadcast(sup), best.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_name",
            "n_name",
            F.col("min_price").alias("best_price"),
            "s_suppkey",
        )
        .orderBy("p_partkey", "s_suppkey")
        .drop("s_suppkey")
    )


# --------------------------------------------------------------------
# TPC-H Q20 shape — dominance against a scalar share threshold
# --------------------------------------------------------------------


@register(
    "supplier_dominant_parts",
    tags=("join", "agg", "threshold"),
    oracle="""
WITH perps AS (
    SELECT l_partkey, l_suppkey,
           SUM(CAST(l_quantity AS DECIMAL(18,6))) AS q
    FROM lineitem GROUP BY l_partkey, l_suppkey
), tot AS (
    SELECT l_partkey, SUM(q) AS tq, COUNT(*) AS ns FROM perps GROUP BY l_partkey
)
SELECT s.s_suppkey, s.s_name, COUNT(*) AS n_dominant_parts
FROM perps p
JOIN tot t ON t.l_partkey = p.l_partkey
JOIN supplier s ON s.s_suppkey = p.l_suppkey
WHERE p.q * t.ns > 2 * t.tq
GROUP BY s.s_suppkey, s.s_name
ORDER BY n_dominant_parts DESC, s.s_suppkey
LIMIT 20
""",
)
def supplier_dominant_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers shipping more than DOUBLE the mean
    per-supplier quantity of some part (an absolute >50% share goes
    vacuous as supplier count per part grows with SF — a relative
    threshold scales). Two aggregation grains off one fact shuffle —
    (part,supplier) partials, re-aggregated to part totals via a
    window over the partitioning already in place — then the
    dominance test `q·ns > 2·tq` in exact decimal/int (no float
    share). The threshold comparison happens before the supplier dim
    broadcast, so only dominant rows join."""
    from pyspark.sql import Window

    cat = Catalog(spark, sf_dir)
    perps = (
        cat.lineitem.groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_dec(F.col("l_quantity"))).alias("q"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        perps.withColumn("tq", F.sum("q").over(w))
        .withColumn("ns", F.count("*").over(w))
        .filter(F.col("q") * F.col("ns") > F.col("tq") * 2)
    )
    sup = cat.supplier.select("s_suppkey", "s_name")
    return (
        dominant.join(F.broadcast(sup), dominant.l_suppkey == sup.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").alias("n_dominant_parts"))
        .orderBy(F.desc("n_dominant_parts"), "s_suppkey")
        .limit(20)
    )


# --------------------------------------------------------------------
# approx_top_k — frequent-items sketch
# --------------------------------------------------------------------


@register(
    "events_type_topk_sketch",
    tags=("sketch", "topk"),
    oracle="""
SELECT event_type AS item, COUNT(*) AS n
FROM events
GROUP BY event_type
ORDER BY n DESC, item
""",
)
def events_type_topk_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-items via the ``approx_top_k`` sketch. k=5 covers the
    full event-type alphabet, and the tracker (maxItemsTracked=10000)
    exceeds the cardinality, so the sketch degenerates to EXACT counts
    — which is precisely what makes it oracle-checkable; the
    rows-only regime is reserved for genuinely lossy settings. At
    100 TB the same expression with k«cardinality is the point: fixed
    sketch state instead of a full groupBy, mergeable across
    partitions."""
    Catalog(spark, sf_dir).register_views(("events",))
    return spark.sql(
        """
        SELECT t.item, t.n
        FROM (SELECT inline(approx_top_k(event_type, 5))
                       AS (item, n)
              FROM events) t
        ORDER BY t.n DESC, t.item
        """
    )


# --------------------------------------------------------------------
# DataSketches HLL — mergeable distinct-count rollup
# --------------------------------------------------------------------


@register(
    "events_daily_users_hll_rollup",
    tags=("sketch", "hll", "rollup"),
    oracle=None,  # sketch binaries have no DuckDB twin; accuracy is
    # pinned by tests/test_sketches.py against exact counts.
)
def events_daily_users_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeable-sketch rollup a 100 TB pipeline stores: hourly
    ``hll_sketch_agg(user_id)`` partials (fixed-size DataSketches HLL,
    lgConfigK=14) merged upward with ``hll_union_agg`` to daily
    distinct-user estimates — raw ids are never re-scanned, exactly
    like the decimal-partial continuous aggregate in
    `events_rollup_reagg` but for a non-additive measure. Rows-only by
    nature (sketch estimate); tests bound the error vs exact
    COUNT(DISTINCT)."""
    ev = Catalog(spark, sf_dir).events
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("sketch"))
    daily = (
        hourly.groupBy(F.to_date("hour").alias("day"))
        .agg(F.hll_union_agg("sketch").alias("sketch"))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.hll_sketch_estimate("sketch").alias("approx_users"),
        )
    )
    return daily.orderBy("day")


@register(
    "events_type_rank_arrow",
    tags=("arrow", "grouped-map", "window"),
    oracle="""
SELECT event_id, event_type, rnk
FROM (
  SELECT event_id, event_type,
         ROW_NUMBER() OVER (
             PARTITION BY event_type ORDER BY value DESC, event_id ASC
         ) AS rnk
  FROM events
)
WHERE rnk <= 20
ORDER BY event_type, rnk
""",
)
def events_type_rank_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map over Arrow (`applyInArrow`, Spark 4): each group
    arrives as ONE pyarrow Table — no pandas materialization — and the
    Python side ranks it with vectorized compute kernels. The output
    (top-20 per type with a total-order tie-break) is exactly a ranked
    window, so plain SQL replays it; the point under test is the
    arrow-native grouped API, the third Python boundary next to
    applyInPandas (events_user_seq) and mapInArrow
    (embedding_norms_arrow).

    Scale note: one shuffle on the group key, same as the window form;
    per-group state is the group itself, so this pattern needs bounded
    groups (event types: 5) — for unbounded groups use the JVM window,
    which spills."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def topk(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("value", "descending"), ("event_id", "ascending")]
        )
        t = t.take(idx[:20])
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "event_type": t.column("event_type"),
                "rnk": pa.array(range(1, t.num_rows + 1), pa.int64()),
            }
        )

    ev = Catalog(spark, sf_dir).events.select("event_id", "event_type", "value")
    return (
        ev.groupBy("event_type")
        .applyInArrow(topk, schema="event_id bigint, event_type string, rnk bigint")
        .orderBy("event_type", "rnk")
    )
