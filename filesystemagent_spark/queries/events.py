"""Streaming-analog queries over the `events` table (SURVEY.md §2.8).

The reference's monitoring loop (ring buffers, threshold alerts,
last-K retention — /root/reference/src/monitoring.py:57-253) maps to
event-time windowed aggregation, alert predicates with a severity
CASE, and latest-per-key windows. Here they run as batch queries over
the events table; streaming/ wires the same logic to readStream with
watermarks (same expressions, different source).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filesystemagent_spark.catalog import Catalog
from filesystemagent_spark.functions.tscompat import epoch_micros
from filesystemagent_spark.queries import register


def _dec(c):
    return c.cast("decimal(18,6)")


@register(
    "events_hourly",
    headline=True,
    tags=("agg", "window-time", "streaming-analog"),
    oracle="""
SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_value,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window aggregation (ST2 analog). In
    streaming this exact shape gains `withWatermark + window()`;
    date_trunc keeps the batch/oracle forms aligned."""
    ev = Catalog(spark, sf_dir).events
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_dec(F.col("value"))).cast("double").alias("total_value"),
            # exact decimal sum → double, then IEEE divide by count: both
            # engines produce the identical double (ROUND(AVG(..)) diverges
            # when the true mean sits exactly on a rounding boundary).
            (F.sum(_dec(F.col("value"))).cast("double") / F.count("*")).alias(
                "avg_value"
            ),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "events_user_topk",
    tags=("agg", "topk"),
    oracle="""
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY user_id
ORDER BY total_value DESC, user_id ASC
LIMIT 10
""",
)
def events_user_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 users by total value (W1 analog): rollup then
    TakeOrdered; exact decimal totals make the ranking stable."""
    ev = Catalog(spark, sf_dir).events
    return (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_dec(F.col("value"))).cast("double").alias("total_value"),
        )
        .orderBy(F.col("total_value").desc(), F.col("user_id").asc())
        .limit(10)
    )


@register(
    "events_threshold_alerts",
    tags=("filter", "streaming-analog"),
    oracle="""
SELECT event_type,
       CASE WHEN value >= 90 THEN 'critical' ELSE 'warning' END AS severity,
       COUNT(*) AS n_alerts,
       ROUND(MAX(value), 4) AS max_value
FROM events
WHERE value >= 80
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def events_threshold_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's 80/90 threshold alert rule
    (/root/reference/src/monitoring.py:209-253) as a filter + severity
    CASE + rollup."""
    ev = Catalog(spark, sf_dir).events
    return (
        ev.filter(F.col("value") >= 80)
        .withColumn(
            "severity",
            F.when(F.col("value") >= 90, F.lit("critical")).otherwise(F.lit("warning")),
        )
        .groupBy("event_type", "severity")
        .agg(
            F.count("*").alias("n_alerts"),
            F.round(F.max("value"), 4).alias("max_value"),
        )
        .orderBy("event_type", "severity")
    )


@register(
    "events_props_json",
    tags=("json", "agg"),
    oracle="""
SELECT event_type,
       CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS DOUBLE)
           / COUNT(json_extract(props, '$.k')) AS avg_k,
       CAST(MAX(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS max_k,
       CAST(COUNT(json_extract(props, '$.k')) AS BIGINT) AS n_with_k
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def events_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction (F14 analog): pull a typed field out
    of the JSON props column, then aggregate. At scale, prefer parsing
    once via from_json into a struct column over repeated path walks."""
    ev = Catalog(spark, sf_dir).events
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            (F.sum("k").cast("double") / F.count("k")).alias("avg_k"),
            F.max("k").alias("max_k"),
            F.count("k").alias("n_with_k"),
        )
        .orderBy("event_type")
    )


@register(
    "events_latest_per_user",
    tags=("window", "streaming-analog"),
    oracle="""
SELECT user_id, event_id AS last_event_id,
       STRFTIME(ts, '%Y-%m-%d %H:%M:%S.%f') AS last_ts,
       event_type AS last_event_type,
       ROUND(value, 4) AS last_value
FROM (
    -- CAST truncates DuckDB's ns-precision ts to µs so ordering and
    -- output agree with Spark's microsecond timestamps.
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC
    ) AS rn
    FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
)
WHERE rn = 1
ORDER BY user_id
""",
)
def events_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-event-per-key (ST1 tail / W6 retention analog): the
    streaming 'current state per key' as a keep-last window."""
    from filesystemagent_spark.operators.relational import keep_first

    ev = Catalog(spark, sf_dir).events
    kept = keep_first(ev, ["user_id"], [F.col("ts").desc(), F.col("event_id").desc()])
    return kept.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("last_ts"),
        F.col("event_type").alias("last_event_type"),
        F.round("value", 4).alias("last_value"),
    ).orderBy("user_id")


@register(
    "baseline_diff_users",
    tags=("join", "anti", "diff"),
    oracle="""
WITH base AS (
    SELECT user_id, event_type, COUNT(*) AS n_events FROM events
    WHERE ts < TIMESTAMP '2024-01-01 06:00:00' GROUP BY 1, 2
), cur AS (
    SELECT user_id, event_type, COUNT(*) AS n_events FROM events
    WHERE ts >= TIMESTAMP '2024-01-30 18:00:00' GROUP BY 1, 2
)
SELECT c.user_id, c.event_type, c.n_events, 'added' AS change_type
FROM cur c WHERE NOT EXISTS (
    SELECT 1 FROM base b
    WHERE b.user_id = c.user_id AND b.event_type = c.event_type)
UNION ALL
SELECT b.user_id, b.event_type, b.n_events, 'removed' AS change_type
FROM base b WHERE NOT EXISTS (
    SELECT 1 FROM cur c
    WHERE c.user_id = b.user_id AND c.event_type = b.event_type)
ORDER BY change_type, user_id, event_type
""",
)
def baseline_diff_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baseline diff (J1-J4/SO1): (user, event_type) activity keys in
    the month's last 6 hours vs its first 6, as the snapshot_diff
    anti-join pair — the reference's baseline_differ re-expressed
    (/root/reference/src/audit/analyzers/baseline_differ.py:118-168)
    with a composite key like its (name, path) diffs. The 6-hour
    windows are deliberately narrow so both diff directions are
    NON-EMPTY at every test SF — a diff query that always returns zero
    rows proves nothing about the anti-joins."""
    from filesystemagent_spark.operators.relational import snapshot_diff

    ev = Catalog(spark, sf_dir).events
    base = (
        ev.filter(F.col("ts") < F.lit("2024-01-01 06:00:00").cast("timestamp"))
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n_events"))
    )
    cur = (
        ev.filter(F.col("ts") >= F.lit("2024-01-30 18:00:00").cast("timestamp"))
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n_events"))
    )
    diff = snapshot_diff(cur, base, ["user_id", "event_type"])
    return diff.select(
        F.col("user_id").cast("long").alias("user_id"),
        "event_type",
        "n_events",
        "change_type",
    ).orderBy("change_type", "user_id", "event_type")


# The reference's severity order is CRITICAL < HIGH < ... — custom, not
# lexicographic (/root/reference/src/audit/pipeline.py:373-379).
SEVERITY_RANK = {"critical": 0, "high": 1, "medium": 2, "low": 3, "info": 4}


@register(
    "event_findings_ranked",
    tags=("projection", "filter", "rank", "findings"),
    oracle="""
WITH findings AS (
    SELECT event_id AS finding_id,
           event_type AS domain,
           CASE WHEN value >= 300 THEN 'critical'
                WHEN value >= 200 THEN 'high'
                WHEN value >= 100 THEN 'medium'
                ELSE 'info' END AS severity,
           printf('%s event value=%.2f exceeds threshold', event_type, value) AS title,
           ROUND(value, 4) AS value
    FROM events
)
SELECT finding_id, domain, severity, title, value
FROM (
    SELECT *, CASE severity WHEN 'critical' THEN 0 WHEN 'high' THEN 1
                            WHEN 'medium' THEN 2 ELSE 4 END AS rnk
    FROM findings WHERE severity <> 'info'
)
ORDER BY rnk, value DESC, finding_id
LIMIT 100
""",
)
def event_findings_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The findings pipeline in miniature (P18→P4→F12→W3): normalize
    raw rows into Finding columns with a printf title, drop info rows
    at parse (the reference's pre-filter, hayabusa.py:99-101), rank by
    the explicit severity map, serve the top slice."""
    from filesystemagent_spark.operators.relational import rank_by_map

    ev = Catalog(spark, sf_dir).events
    findings = ev.select(
        F.col("event_id").alias("finding_id"),
        F.col("event_type").alias("domain"),
        F.when(F.col("value") >= 300, "critical")
        .when(F.col("value") >= 200, "high")
        .when(F.col("value") >= 100, "medium")
        .otherwise("info")
        .alias("severity"),
        F.format_string(
            "%s event value=%.2f exceeds threshold", F.col("event_type"), F.col("value")
        ).alias("title"),
        F.round("value", 4).alias("value"),
    ).filter(F.col("severity") != "info")
    ranked = rank_by_map(findings, "severity", SEVERITY_RANK, rank_col="rnk")
    return (
        ranked.orderBy("rnk", F.col("value").desc(), "finding_id")
        .limit(100)
        .drop("rnk")
    )


@register(
    "events_sessions",
    tags=("window", "analytic", "sessionization"),
    oracle="""
WITH marked AS (
    SELECT user_id, ts, event_id,
           CASE WHEN LAG(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                THEN 1 ELSE 0 END AS new_s
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
    SELECT user_id,
           SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS session_id
    FROM marked
), per_sess AS (
    SELECT user_id, session_id, COUNT(*) AS n FROM sess GROUP BY 1, 2
)
SELECT user_id,
       COUNT(*) AS n_sessions,
       CAST(MAX(n) AS BIGINT) AS max_session_events,
       CAST(SUM(n) AS BIGINT) AS total_events
FROM per_sess GROUP BY user_id ORDER BY user_id
""",
)
def events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-min inactivity gap: lag → new-session
    marker → running-sum session ids → per-session rollup. The batch
    equivalent of a streaming session window; one shuffle on user_id
    serves all three window steps (same partitioning)."""
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(epoch_micros("ts")).over(w)
    marked = ev.withColumn(
        "new_s",
        F.when(
            prev.isNull() | ((epoch_micros("ts") - prev) > 1_800_000_000), 1
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_sess = sess.groupBy("user_id", "session_id").agg(F.count("*").alias("n"))
    return (
        per_sess.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.max("n").alias("max_session_events"),
            F.sum("n").alias("total_events"),
        )
        .orderBy("user_id")
    )


@register(
    "events_type_share",
    tags=("agg", "window"),
    oracle="""
SELECT event_type, COUNT(*) AS n_events,
       ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER (), 6) AS share
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def events_type_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-total: aggregate + unpartitioned analytic window over
    the (tiny) aggregated result — the full scan never re-shuffles."""
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).events
    counts = ev.groupBy("event_type").agg(F.count("*").alias("n_events"))
    total = F.sum("n_events").over(Window.partitionBy())
    return (
        counts.withColumn(
            "share", F.round(F.col("n_events").cast("double") / total, 6)
        )
        .orderBy("event_type")
    )


@register(
    "events_value_percentiles",
    tags=("agg", "percentile"),
    oracle="""
SELECT event_type,
       ROUND(QUANTILE_CONT(CAST(value AS DOUBLE), 0.5), 6) AS p50,
       ROUND(QUANTILE_CONT(CAST(value AS DOUBLE), 0.9), 6) AS p90,
       ROUND(QUANTILE_CONT(CAST(value AS DOUBLE), 0.99), 6) AS p99
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles per event type — the
    latency-distribution shape behind the reference's threshold alerts
    (monitoring.py:209-253), upgraded from fixed cutoffs to quantiles.
    Spark's `percentile` and DuckDB's `quantile_cont` share the
    interpolation rule, so values hash-match after rounding. At 100 TB
    swap in `approx_percentile` (t-digest, one pass, no full sort) and
    drop the oracle to rows-only.
    """
    ev = Catalog(spark, sf_dir).events
    v = F.col("value").cast("double")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.percentile(v, 0.5), 6).alias("p50"),
            F.round(F.percentile(v, 0.9), 6).alias("p90"),
            F.round(F.percentile(v, 0.99), 6).alias("p99"),
        )
        .orderBy("event_type")
    )


@register(
    "events_asof_prior_view",
    tags=("join", "asof", "temporal"),
    oracle="""
SELECT p.event_id, p.user_id,
       STRFTIME(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
       v.event_id AS view_event_id,
       ROUND(EPOCH(p.ts) - EPOCH(v.ts), 6) AS secs_since_view
FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events
      WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events
      WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND p.ts >= v.ts
ORDER BY p.event_id
""",
)
def events_asof_prior_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each purchase matched to the user's most
    recent prior (or simultaneous) view — union+window construction,
    hash-checked against DuckDB's native ASOF JOIN. One shuffle on
    user_id; no per-key range scan."""
    from filesystemagent_spark.operators.temporal import as_of_join

    ev = Catalog(spark, sf_dir).events
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    joined = as_of_join(
        purchases, views, on="user_id", right_cols=["event_id"], prefix="view_"
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_ts"),
        F.col("view_event_id"),
        F.round(
            (epoch_micros("ts") - epoch_micros("view_ts"))
            / F.lit(1_000_000.0),
            6,
        ).alias("secs_since_view"),
    ).orderBy("event_id")


@register(
    "events_nearby_views",
    tags=("join", "range", "temporal"),
    oracle="""
SELECT e.event_id, COUNT(v.event_id) AS n_nearby_views
FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events
      WHERE event_type = 'error') e
LEFT JOIN (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events
      WHERE event_type = 'view') v
  ON e.user_id = v.user_id
 AND ABS(EPOCH(e.ts) - EPOCH(v.ts)) <= 300
GROUP BY e.event_id
ORDER BY e.event_id
""",
)
def events_nearby_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal range join: per error event, how many views the same
    user made within +-5 minutes. The binned equi-join form — DuckDB
    oracles the same result with a plain inequality join, which is
    exactly the per-key quadratic shape the binning avoids at scale."""
    from filesystemagent_spark.operators.temporal import range_join

    ev = Catalog(spark, sf_dir).events
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    views = ev.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    paired = range_join(
        errors,
        views,
        on="user_id",
        max_gap_seconds=300.0,
        right_cols=["event_id"],
        prefix="view_",
        how="left",
    )
    return (
        paired.groupBy("event_id")
        .agg(F.count("view_event_id").alias("n_nearby_views"))
        .orderBy("event_id")
    )


@register(
    "events_rollup_reagg",
    tags=("agg", "rollup", "hypertable"),
    oracle="""
-- date_trunc, NOT epoch float math: DuckDB's // on DOUBLE does not
-- floor, and CAST(double AS BIGINT) rounds — both silently split or
-- shift buckets
SELECT STRFTIME(date_trunc('hour', CAST(ts AS TIMESTAMP)),
                '%Y-%m-%d %H:%M:%S') AS bucket,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_v,
       MIN(CAST(value AS DOUBLE)) AS min_v,
       MAX(CAST(value AS DOUBLE)) AS max_v
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def events_rollup_reagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate soundness: the 1 h result served from a
    5-min rollup of mergeable partials hash-equals DuckDB's 1 h
    computed directly from raw rows. At 100 TB the 5-min rollup is
    maintained by the streaming window aggregate and raw rows are
    never re-scanned. Sums run through decimal partials so merge
    order cannot perturb the double (same trick as events_hourly)."""
    from filesystemagent_spark.operators import rollup as R

    ev = Catalog(spark, sf_dir).events.withColumn(
        "value", F.col("value").cast("decimal(18,6)")
    )
    fine = ev.groupBy(
        R.time_bucket(F.col("ts"), 300).alias("bucket"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.sum("value").alias("sum_v"),
        F.min(F.col("value").cast("double")).alias("min_v"),
        F.max(F.col("value").cast("double")).alias("max_v"),
    )
    coarse = (
        fine.groupBy(
            R.time_bucket(F.col("bucket"), 3600).alias("bucket"), "event_type"
        )
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_v").cast("double").alias("sum_v"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
    )
    return coarse.select(
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        "event_type",
        "n",
        "sum_v",
        "min_v",
        "max_v",
    ).orderBy("bucket", "event_type")


@register(
    "events_value_mad",
    tags=("agg", "pandas-udaf"),
    oracle="""
SELECT event_type, ROUND(MAD(CAST(value AS DOUBLE)), 6) AS mad_value
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def events_value_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per event type via a grouped-agg
    pandas UDF — the UDAF surface the reference lacks entirely
    (SURVEY.md §2.9). Arrow ships each group's value column as one
    numpy vector; the robust-dispersion math (no Spark builtin) runs
    vectorized and returns one scalar per group. Hash-checked against
    DuckDB's native MAD (both interpolate medians identically)."""
    from filesystemagent_spark.functions.udafs import mad

    ev = Catalog(spark, sf_dir).events
    return (
        ev.groupBy("event_type")
        .agg(F.round(mad(F.col("value").cast("double")), 6).alias("mad_value"))
        .orderBy("event_type")
    )


@register(
    "events_user_seq",
    tags=("udf", "applyInPandas", "grouped-map"),
    oracle="""
SELECT user_id, event_id,
       CAST(ROW_NUMBER() OVER (
           PARTITION BY user_id
           ORDER BY CAST(ts AS TIMESTAMP), event_id
       ) AS BIGINT) AS seq
FROM events
ORDER BY user_id, seq
""",
)
def events_user_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (the per-group transform surface,
    SURVEY.md §2.9): each user's events arrive as one pandas frame,
    get event-time ordered, and leave with a 1..n sequence — pinned to
    a SQL ROW_NUMBER oracle, integer-exact. The same mechanism carries
    any per-group python logic (per-entity resampling, model scoring)
    with one shuffle on the group key."""
    import pandas as pd

    def seq_group(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        out["seq"] = range(1, len(out) + 1)
        return out[["user_id", "event_id", "seq"]]

    ev = Catalog(spark, sf_dir).events.select("user_id", "event_id", "ts")
    # Pre-hash on the group key at cluster parallelism: grouped-map
    # requires ClusteredDistribution(user_id), which this exchange
    # already satisfies, so the groupBy adds NO further shuffle — and
    # under a default-config session it replaces a 200-micro-partition
    # exchange whose per-partition Arrow/Python round-trip overhead
    # dominates (measured 4.4s -> 1.0s at sf0.1).
    ev = ev.repartition(spark.sparkContext.defaultParallelism, "user_id")
    return (
        ev.groupBy("user_id")
        .applyInPandas(seq_group, "user_id long, event_id long, seq long")
        .orderBy("user_id", "seq")
    )


@register(
    "events_hourly_gapfill",
    tags=("temporal", "gapfill", "window", "spine"),
    oracle="""
WITH hourly AS (
    SELECT event_type, DATE_TRUNC('hour', ts) AS h,
           COUNT(*) AS n_events,
           SUM(CAST(value AS DECIMAL(18,6))) AS total_value
    FROM events GROUP BY 1, 2
), bounds AS (
    SELECT DATE_TRUNC('hour', MIN(ts)) AS lo, DATE_TRUNC('hour', MAX(ts)) AS hi
    FROM events
), spine AS (
    SELECT t.h, e.event_type
    FROM bounds, UNNEST(generate_series(bounds.lo, bounds.hi, INTERVAL 1 HOUR)) AS t(h),
         (SELECT DISTINCT event_type FROM events) e
)
SELECT STRFTIME(s.h, '%Y-%m-%d %H:%M:%S') AS hour_ts,
       s.event_type,
       COALESCE(hourly.n_events, 0) AS n_events,
       CAST(hourly.total_value AS DOUBLE) AS total_value,
       CAST(LAST_VALUE(hourly.total_value IGNORE NULLS) OVER (
           PARTITION BY s.event_type ORDER BY s.h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS ffill_total
FROM spine s
LEFT JOIN hourly ON hourly.event_type = s.event_type AND hourly.h = s.h
ORDER BY hour_ts, s.event_type
""",
)
def events_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly series with forward fill — the hypertable
    'time_bucket_gapfill + locf' capability over the events stream.

    The spine (hour × event_type) is generated from a 1-row min/max
    aggregate — size is the TIME DOMAIN, never the fact cardinality,
    so at 100 TB the left join is a broadcast of the hourly rollup
    keys against a tiny generated frame. Forward fill is
    `last(ignoreNulls)` over an event-type-partitioned window whose
    input is already rolled up (bounded rows per partition)."""
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).events
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(_dec(F.col("value"))).alias("total_value"),
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("interval 1 hour"))
        ).alias("h")
    )
    spine = hours.crossJoin(ev.select("event_type").distinct())
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(hourly, ["event_type", "h"], "left")
        .select(
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour_ts"),
            "event_type",
            F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
            F.col("total_value").cast("double").alias("total_value"),
            F.last(F.col("total_value"), ignorenulls=True)
            .over(w)
            .cast("double")
            .alias("ffill_total"),
        )
        .orderBy("hour_ts", "event_type")
    )


@register(
    "events_key_skew",
    tags=("diagnostics", "skew", "agg"),
    oracle="""
WITH per_key AS (
    SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
), stats AS (
    SELECT CAST(SUM(n) AS DOUBLE) / COUNT(*) AS mean_n, SUM(n) AS total_n
    FROM per_key
)
SELECT p.user_id, p.n,
       CAST(p.n AS DOUBLE) / s.total_n AS share,
       CAST(p.n AS DOUBLE) / s.mean_n AS skew_ratio
FROM per_key p, stats s
ORDER BY p.n DESC, p.user_id ASC
LIMIT 10
""",
)
def events_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew profiler — the diagnostic behind every salting/AQE
    decision: per-key counts vs the mean, top offenders first.

    At 100 TB you run this BEFORE choosing a shuffle key; a
    skew_ratio in the hundreds means the salted join or AQE skew
    split (operators/relational.salted_join) is mandatory, not
    optional. The stats side is a 1-row broadcast; cost is one
    aggregation over the key column only."""
    ev = Catalog(spark, sf_dir).events
    per_key = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    stats = per_key.agg(
        (F.sum("n").cast("double") / F.count("*")).alias("mean_n"),
        F.sum("n").alias("total_n"),
    )
    return (
        per_key.crossJoin(F.broadcast(stats))
        .select(
            "user_id",
            "n",
            (F.col("n").cast("double") / F.col("total_n")).alias("share"),
            (F.col("n").cast("double") / F.col("mean_n")).alias("skew_ratio"),
        )
        .orderBy(F.col("n").desc(), F.col("user_id").asc())
        .limit(10)
    )


@register(
    "events_value_stats",
    tags=("agg", "stats", "mergeable-partials"),
    oracle="""
WITH partials AS (
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s,
           CAST(SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sq
    FROM events GROUP BY event_type
)
SELECT event_type, n,
       ROUND(s / n, 6) AS mean_v,
       ROUND(SQRT((sq - s * s / n) / (n - 1)), 6) AS stddev_v
FROM partials ORDER BY event_type
""",
)
def events_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance/stddev from EXACT mergeable partials: decimal SUM(x)
    and SUM(x²) plus COUNT, with the moments derived in float only at
    the end. Native STDDEV over doubles is partial-merge-order
    dependent (Welford merges), so a distributed run can't hash-match
    a single-node oracle; exact decimal partials make the statistic
    deterministic AND mergeable — the same invariant the rollup
    operator relies on (operators/rollup.py), now for second moments.
    """
    ev = Catalog(spark, sf_dir).events
    d = F.col("value").cast("decimal(18,6)")
    partials = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(d).cast("double").alias("s"),
        F.sum(d * d).cast("double").alias("sq"),
    )
    n, s, sq = F.col("n"), F.col("s"), F.col("sq")
    return partials.select(
        "event_type",
        "n",
        F.round(s / n, 6).alias("mean_v"),
        F.round(F.sqrt((sq - s * s / n) / (n - 1)), 6).alias("stddev_v"),
    ).orderBy("event_type")


@register(
    "events_value_ntile",
    tags=("window", "ntile"),
    oracle="""
WITH t AS (
    SELECT event_type, value, event_id,
           NTILE(4) OVER (PARTITION BY event_type
                          ORDER BY CAST(value AS DOUBLE), event_id) AS quartile
    FROM events
)
SELECT event_type, quartile, COUNT(*) AS n,
       ROUND(MIN(CAST(value AS DOUBLE)), 6) AS lo,
       ROUND(MAX(CAST(value AS DOUBLE)), 6) AS hi
FROM t GROUP BY event_type, quartile
ORDER BY event_type, quartile
""",
)
def events_value_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE quartile boundaries per event type. The (value, event_id)
    order key makes tile assignment total and deterministic, so the
    quartile edges hash-match across engines — the same unique-key
    tie-break rule every ranking query here follows."""
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).events
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").cast("double"), "event_id"
    )
    t = ev.select(
        "event_type",
        F.col("value").cast("double").alias("v"),
        F.ntile(4).over(w).alias("quartile"),
    )
    return (
        t.groupBy("event_type", "quartile")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("v"), 6).alias("lo"),
            F.round(F.max("v"), 6).alias("hi"),
        )
        .orderBy("event_type", "quartile")
    )


@register(
    "events_props_variant",
    tags=("variant", "semi-structured", "agg"),
    oracle="""
SELECT CAST(json_extract(props, '$.k') AS INTEGER) % 10 AS k_mod,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY k_mod
ORDER BY k_mod
""",
)
def events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props through Spark 4's VARIANT type:
    parse_json ONCE into the binary variant encoding, then typed path
    extraction (`variant_get`) — the engine-native answer to repeated
    get_json_object string walks (events_props_json shows the classic
    form). At scale the parse happens in the scan projection and the
    shredded value flows through codegen; the oracle reads the same
    paths with DuckDB's JSON extraction."""
    ev = Catalog(spark, sf_dir).events
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "int")
    return (
        ev.withColumn("_k", k)
        .groupBy((F.col("_k") % 10).alias("k_mod"))
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(_dec(F.col("value"))).cast("double").alias("total_value"),
        )
        .orderBy("k_mod")
    )


@register(
    "events_session_window_builtin",
    tags=("sessionization", "session-window", "agg"),
    oracle="""
WITH e AS (
    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
),
marked AS (
    SELECT user_id, ts,
           CASE WHEN LAG(ts) OVER w IS NULL
                  OR ts - LAG(ts) OVER w > INTERVAL 1800 SECOND
                THEN 1 ELSE 0 END AS new_s
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
    SELECT user_id, ts,
           SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
    FROM marked
)
SELECT user_id,
       STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       STRFTIME(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
       COUNT(*) AS n_events
FROM sess
GROUP BY user_id, sid
ORDER BY user_id, session_start
""",
)
def events_session_window_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via the BUILT-IN `session_window` (one grouped
    aggregation with runtime-merging session state) — the engine-native
    form of the gaps-and-islands SQL that `events_sessions` builds from
    lag+running-sum windows. Boundary semantics pinned by probe: a gap
    of exactly the timeout MERGES (window end is start+gap inclusive of
    the next event at that instant), hence the oracle's strict `>`.
    One shuffle on user_id; no second window pass."""
    ev = Catalog(spark, sf_dir).events
    return (
        ev.groupBy("user_id", F.session_window("ts", "1800 seconds"))
        .agg(
            F.min("ts").alias("_start"),
            F.max("ts").alias("_end"),
            F.count("*").alias("n_events"),
        )
        .select(
            "user_id",
            F.date_format("_start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            F.date_format("_end", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )
