"""Data-quality and monitoring analytics over the `events` stream table.

Extends the reference's monitoring surface (threshold alerts and
metric rollups — /root/reference/src/monitoring.py:108-253) with the
checks a production pipeline runs before trusting a day's data:
declarative expectation suites (Deequ-style), distribution histograms,
EWMA smoothing, and z-score anomaly flags. All are single-pass
aggregations whose state is O(groups), so the same plans run at 100 TB
(histogram bins and per-type stats are fixed-size; nothing collects
row data to the driver).

Cross-engine determinism: counts are exact integers; derived doubles
are produced by the IDENTICAL sequence of IEEE operations in the Spark
expression and the oracle SQL (same literals, same operator order), so
value hashes match bit-for-bit without rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filesystemagent_spark.catalog import Catalog
from filesystemagent_spark.queries import register


def _dec(c):
    return c.cast("decimal(18,6)")


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "events_value_histogram",
    tags=("agg", "histogram", "data-quality"),
    oracle="""
WITH s AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events)
SELECT LEAST(CAST(FLOOR((value - lo) / ((hi - lo) / 20.0)) AS INT), 19) AS bin_id,
       lo + LEAST(CAST(FLOOR((value - lo) / ((hi - lo) / 20.0)) AS INT), 19)
            * ((hi - lo) / 20.0) AS bin_lo,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events, s
GROUP BY 1, 2
ORDER BY 1
""",
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width 20-bin histogram of `value`, bounds discovered by
    the query itself. The min/max aggregate is a 1-row broadcast (the
    only nested-loop join this engine permits), so the full pass over
    the fact stays a single scan + one fixed-size hash aggregate —
    the distribution-profile primitive behind drift monitoring.
    The max row is clamped into the last bin (LEAST), the standard
    half-open-bins-plus-closed-top convention."""
    ev = Catalog(spark, sf_dir).events
    stats = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    w = (F.col("hi") - F.col("lo")) / F.lit(20.0)
    bin_id = F.least(
        F.floor((F.col("value") - F.col("lo")) / w).cast("int"), F.lit(19)
    )
    return (
        ev.join(F.broadcast(stats))
        .select(
            bin_id.alias("bin_id"),
            (F.col("lo") + bin_id * w).alias("bin_lo"),
        )
        .groupBy("bin_id", "bin_lo")
        .agg(F.count("*").alias("n_events"))
        .orderBy("bin_id")
    )


@register(
    "events_dq_checks",
    tags=("agg", "data-quality", "unpivot"),
    oracle="""
WITH a AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS row_count,
         CAST(COUNT(DISTINCT event_id) AS DOUBLE) AS distinct_ids,
         CAST(COUNT(*) FILTER (WHERE value IS NULL) AS DOUBLE) AS null_value,
         CAST(COUNT(*) FILTER (WHERE props IS NULL) AS DOUBLE) AS null_props,
         CAST(COUNT(*) FILTER (WHERE value < 0) AS DOUBLE) AS neg_value,
         CAST(COUNT(*) FILTER (
             WHERE event_type NOT IN ('click','error','purchase','signup','view')
         ) AS DOUBLE) AS bad_type,
         CAST(MIN(value) AS DOUBLE) AS min_value,
         CAST(MAX(value) AS DOUBLE) AS max_value
  FROM events
)
SELECT metric, value FROM (
  SELECT 'row_count' AS metric, row_count AS value FROM a
  UNION ALL SELECT 'event_id_uniqueness', distinct_ids / row_count FROM a
  UNION ALL SELECT 'value_null_fraction', null_value / row_count FROM a
  UNION ALL SELECT 'props_null_fraction', null_props / row_count FROM a
  UNION ALL SELECT 'value_negative_count', neg_value FROM a
  UNION ALL SELECT 'event_type_domain_violations', bad_type FROM a
  UNION ALL SELECT 'value_min', min_value FROM a
  UNION ALL SELECT 'value_max', max_value FROM a
) ORDER BY metric
""",
)
def events_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style expectation suite: completeness, uniqueness, domain
    and range checks computed in ONE pass over the fact (a single
    multi-aggregate — the profiler never rescans per check), then
    unpivoted to a (metric, value) report via `stack`. At 100 TB the
    only caveat is the exact COUNT(DISTINCT) — swap for
    approx_count_distinct when the id space outgrows the shuffle
    (same contract as `doc_column_profile`)."""
    ev = Catalog(spark, sf_dir).events
    a = ev.agg(
        F.count("*").cast("double").alias("row_count"),
        F.countDistinct("event_id").cast("double").alias("distinct_ids"),
        F.count_if(F.col("value").isNull()).cast("double").alias("null_value"),
        F.count_if(F.col("props").isNull()).cast("double").alias("null_props"),
        F.count_if(F.col("value") < 0).cast("double").alias("neg_value"),
        F.count_if(~F.col("event_type").isin(*_EVENT_TYPES))
        .cast("double")
        .alias("bad_type"),
        F.min("value").cast("double").alias("min_value"),
        F.max("value").cast("double").alias("max_value"),
    )
    return a.selectExpr(
        """stack(8,
            'row_count', row_count,
            'event_id_uniqueness', distinct_ids / row_count,
            'value_null_fraction', null_value / row_count,
            'props_null_fraction', null_props / row_count,
            'value_negative_count', neg_value,
            'event_type_domain_violations', bad_type,
            'value_min', min_value,
            'value_max', max_value
        ) AS (metric, value)"""
    ).orderBy("metric")


@register(
    "events_type_ewma",
    tags=("agg", "time-series", "higher-order-fn"),
    oracle="""
WITH hourly AS (
  SELECT event_type,
         DATE_TRUNC('hour', ts) AS h,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS m
  FROM events
  GROUP BY 1, 2
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_hours,
       LIST_REDUCE(LIST(m ORDER BY h), (acc, x) -> acc * 0.7 + x * 0.3) AS ewma
FROM hourly
GROUP BY event_type
ORDER BY event_type
""",
)
def events_type_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA (alpha=0.3) of the hourly mean value per event type — the
    smoothing behind the reference's threshold alerts (monitoring.py
    ST3), expressed as a left-to-right fold with `aggregate` over the
    time-sorted series. The fold is inherently sequential, but the
    state is one double per type and the series arrives pre-aggregated
    to hour grain, so the array per group is bounded (8,760 rows/year)
    regardless of fact cardinality. Both engines execute the identical
    IEEE fold, so the result matches without rounding."""
    ev = Catalog(spark, sf_dir).events
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        (F.sum(_dec(F.col("value"))).cast("double") / F.count("*")).alias("m")
    )
    return (
        hourly.groupBy("event_type")
        .agg(
            F.count("*").alias("n_hours"),
            F.sort_array(
                F.collect_list(F.struct(F.col("h"), F.col("m")))
            ).alias("series"),
        )
        .select(
            "event_type",
            "n_hours",
            F.expr(
                "aggregate(slice(series, 2, size(series) - 1),"
                " series[0].m,"
                " (acc, x) -> acc * 0.7D + x.m * 0.3D)"
            ).alias("ewma"),
        )
        .orderBy("event_type")
    )


@register(
    "events_hourly_anomalies",
    tags=("agg", "anomaly", "streaming-analog"),
    oracle="""
WITH hourly AS (
  SELECT event_type, DATE_TRUNC('hour', ts) AS h, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_hours,
         CAST(SUM(n) AS BIGINT) AS sum_n,
         CAST(SUM(n * n) AS BIGINT) AS sumsq_n
  FROM hourly GROUP BY event_type
)
SELECT hourly.event_type,
       STRFTIME(h, '%Y-%m-%d %H:%M:%S') AS hour,
       n,
       (n - CAST(sum_n AS DOUBLE) / n_hours)
         / SQRT(CAST(sumsq_n AS DOUBLE) / n_hours
                - (CAST(sum_n AS DOUBLE) / n_hours) * (CAST(sum_n AS DOUBLE) / n_hours))
         AS zscore
FROM hourly JOIN stats ON hourly.event_type = stats.event_type
WHERE ABS((n - CAST(sum_n AS DOUBLE) / n_hours)
         / SQRT(CAST(sumsq_n AS DOUBLE) / n_hours
                - (CAST(sum_n AS DOUBLE) / n_hours) * (CAST(sum_n AS DOUBLE) / n_hours)))
      >= 2.5
ORDER BY 1, 2
""",
)
def events_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: hours whose event count sits >= 2.5
    population standard deviations from that type's mean rate — the
    alerting query the reference approximates with static thresholds
    (monitoring.py:209-253). Mean/variance come from exact integer
    partials (sum, sum-of-squares), which are order-independent under
    any partial-merge schedule — the float work happens once per type
    AFTER aggregation, so the z-scores are bit-identical across
    engines and cluster layouts. Per-type stats are 5 rows: a
    broadcast join back onto the hourly grid."""
    ev = Catalog(spark, sf_dir).events
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count("*").alias("n"))
    stats = hourly.groupBy("event_type").agg(
        F.count("*").alias("n_hours"),
        F.sum("n").alias("sum_n"),
        F.sum(F.col("n") * F.col("n")).alias("sumsq_n"),
    )
    mean = F.col("sum_n").cast("double") / F.col("n_hours")
    z = (F.col("n") - mean) / F.sqrt(
        F.col("sumsq_n").cast("double") / F.col("n_hours") - mean * mean
    )
    return (
        hourly.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "n",
            z.alias("zscore"),
        )
        .filter(F.abs(F.col("zscore")) >= 2.5)
        .orderBy("event_type", "hour")
    )


@register(
    "lineitem_qty_price_corr",
    tags=("agg", "statistics"),
    oracle="""
WITH q AS (
  SELECT l_returnflag,
         CAST(ROUND(l_quantity) AS BIGINT) AS xi,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS yi
  FROM lineitem
),
p AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(xi) AS DOUBLE) AS sx,
         CAST(SUM(yi) AS DOUBLE) AS sy,
         CAST(SUM(xi * yi) AS DOUBLE) AS sxy,
         CAST(SUM(xi * xi) AS DOUBLE) AS sxx,
         CAST(SUM(yi * yi) AS DOUBLE) AS syy
  FROM q GROUP BY l_returnflag
)
SELECT l_returnflag,
       n,
       (n * sxy - sx * sy)
         / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)) AS corr_qty_price
FROM p
ORDER BY l_returnflag
""",
)
def lineitem_qty_price_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation per return-flag from exact INTEGER partials
    — the statistical-aggregate family done scale-safely. Correlation
    is invariant under positive scaling, so quantity (integral) and
    price (cent-quantized) become exact longs first; then n, Σx, Σy,
    Σxy, Σx², Σy² are exact, associative integer sums (the y² sum in
    DECIMAL(38,0) — it overflows int64 at cluster row counts), and
    any partial-merge order yields the identical bits. The one float
    expression runs once per group after aggregation, identically in
    both engines. (A double→DECIMAL(28,6) cast of the raw products is
    NOT portable: converting squares ~1e10 loses exactness in engines
    that scale in double before rounding.)"""
    li = Catalog(spark, sf_dir).lineitem
    xi = F.round(F.col("l_quantity")).cast("long")
    yi = F.round(F.col("l_extendedprice") * 100).cast("long")
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    p = li.select("l_returnflag", xi.alias("xi"), yi.alias("yi")).groupBy(
        "l_returnflag"
    ).agg(
        F.count("*").alias("n"),
        F.sum("xi").cast("double").alias("sx"),
        F.sum("yi").cast("double").alias("sy"),
        F.sum(d38(F.col("xi") * F.col("yi"))).cast("double").alias("sxy"),
        F.sum(d38(F.col("xi") * F.col("xi"))).cast("double").alias("sxx"),
        F.sum(d38(F.col("yi") * F.col("yi"))).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    corr = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return p.select(
        "l_returnflag", "n", corr.alias("corr_qty_price")
    ).orderBy("l_returnflag")


@register(
    "events_rolling_distinct_users",
    tags=("agg", "distinct", "time-series"),
    oracle="""
WITH du AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
s AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM du),
e AS (
  SELECT user_id, d + CAST(i.i AS INT) AS d_obs
  FROM du, LATERAL (SELECT UNNEST(GENERATE_SERIES(0, 6)) AS i) i
)
SELECT STRFTIME(d_obs, '%Y-%m-%d') AS day,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users_7d
FROM e, s
WHERE d_obs BETWEEN lo AND hi
GROUP BY d_obs
ORDER BY 1
""",
)
def events_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per calendar day — the
    sliding COUNT(DISTINCT) that a naive per-day self-join turns into
    7 scans. Scale shape: dedup once to (user, day) grain, then each
    row votes into the 7 windows it belongs to (a row-local
    explode(sequence) — ×7 amplification of the ALREADY-deduped
    grain, not of the raw fact), and one distinct-aggregate per day
    finishes it. The date-range clamp is a 1-row broadcast. At
    unbounded user cardinality the documented swap is HLL partials
    per (user-bucket, day) union-merged across the window."""
    ev = Catalog(spark, sf_dir).events
    du = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    s = du.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    e = du.select(
        "user_id",
        F.explode(F.sequence(F.col("d"), F.date_add("d", 6))).alias("d_obs"),
    )
    return (
        e.join(F.broadcast(s))
        .filter((F.col("d_obs") >= F.col("lo")) & (F.col("d_obs") <= F.col("hi")))
        .groupBy("d_obs")
        .agg(F.countDistinct("user_id").alias("users_7d"))
        .select(
            F.date_format("d_obs", "yyyy-MM-dd").alias("day"), "users_7d"
        )
        .orderBy("day")
    )


@register(
    "events_props_udtf_analyze",
    tags=("udtf", "analyze", "semi-structured"),
    oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS INT) AS k,
       json_extract(props, '$.k') IS NOT NULL AS k_present,
       CAST(json_extract(props, '$.missing') AS INT) AS missing,
       json_extract(props, '$.missing') IS NOT NULL AS missing_present
FROM events
ORDER BY event_id
LIMIT 200
""",
)
def events_props_udtf_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic Python UDTF: `analyze()` derives the output schema
    (a value + presence column PER requested key) from the constant
    key-list argument at analysis time, so Catalyst plans real typed
    columns for a parser whose shape is chosen by the caller — the
    Spark 4 dynamic-UDTF surface. The oracle replays the extraction
    with plain JSON path functions."""
    from filesystemagent_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    Catalog(spark, sf_dir).events.createOrReplaceTempView("_events_udtf")
    return spark.sql(
        """
        SELECT e.event_id, p.k, p.k_present, p.missing, p.missing_present
        FROM _events_udtf e, LATERAL parse_props(e.props, 'k,missing') p
        ORDER BY e.event_id
        LIMIT 200
        """
    )
