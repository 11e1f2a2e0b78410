"""Sketch-based approximate aggregation — the 100 TB scale path.

Exact COUNT(DISTINCT) expands every row and shuffles the full key
domain; exact percentiles sort it. At 100 TB both are shuffle-bound.
HyperLogLog++ (`approx_count_distinct`) and the Greenwald-Khanna /
KLL-style quantile sketch (`percentile_approx`) replace them with
fixed-size mergeable state: map-side partials the size of a sketch,
one tiny shuffle, bounded relative error.

These are approximate by design, so they register WITHOUT an oracle
(the driver records a rows-only check) — their accuracy contract is
enforced by tests/test_sketches.py against the exact answers:
HLL within its configured rsd, quantile sketch within its rank
accuracy. The exact twins (`events_value_percentiles`,
`external_conns_per_process`'s countDistinct) stay the correctness
reference; these are what you run when the exact twin stops fitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filesystemagent_spark.catalog import Catalog
from filesystemagent_spark.queries import register

# rsd 2% → ~1.5 KB of HLL state per group regardless of cardinality.
HLL_RSD = 0.02
# percentile_approx accuracy knob: rank error ≤ 1/PCTL_ACCURACY.
PCTL_ACCURACY = 10_000


@register(
    "events_distinct_users_hll",
    tags=("agg", "sketch", "hll", "approx"),
)
def events_distinct_users_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via HyperLogLog++.

    The exact form (SURVEY §2.4 A8's countDistinct) is the oracle-
    checked reference; this sketch form is the drop-in at cardinalities
    where exact distinct no longer fits the shuffle."""
    events = Catalog(spark, sf_dir).events
    return (
        events.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=HLL_RSD).alias("approx_users"))
        .orderBy("event_type")
    )


@register(
    "events_value_quantile_sketch",
    tags=("agg", "sketch", "quantile", "approx"),
)
def events_value_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of event value per type via the mergeable quantile
    sketch — the scale twin of the exact `events_value_percentiles`
    query. State per group is O(accuracy), not O(rows)."""
    events = Catalog(spark, sf_dir).events
    return (
        events.groupBy("event_type")
        .agg(
            F.percentile_approx(
                "value", [0.5, 0.9, 0.99], PCTL_ACCURACY
            ).alias("value_pcts")
        )
        .select(
            "event_type",
            F.col("value_pcts")[0].alias("p50"),
            F.col("value_pcts")[1].alias("p90"),
            F.col("value_pcts")[2].alias("p99"),
        )
        .orderBy("event_type")
    )


@register(
    "orders_custkey_hll_by_status",
    tags=("agg", "sketch", "hll", "approx"),
)
def orders_custkey_hll_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct customers per order status — the same
    sketch over the TPC-H-ish fact, proving the operator is not
    events-specific."""
    orders = Catalog(spark, sf_dir).orders
    return (
        orders.groupBy("o_orderstatus")
        .agg(F.approx_count_distinct("o_custkey", rsd=HLL_RSD).alias("approx_customers"))
        .orderBy("o_orderstatus")
    )


@register(
    "events_rolling_users_hll",
    tags=("agg", "sketch", "hll", "time-series", "approx"),
)
def events_rolling_users_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch twin of `events_rolling_distinct_users`: trailing-7-day
    active users where the per-day state is ONE DataSketches HLL
    instead of the user set. Daily sketches are built once (exact
    distinct state never exceeds the sketch size), each day's sketch
    votes into the 7 window days it serves (explode of a 7-element
    array of BINARY — constant amplification of kilobyte payloads),
    and `hll_union_agg` merges per window day. This is the unbounded-
    cardinality form: at 10^9 users/day the exact query's (user, day)
    dedup shuffle is the bottleneck; this one shuffles ~4 KB per
    (day, window) pair regardless of cardinality."""
    ev = Catalog(spark, sf_dir).events
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    bounds = daily.agg(
        F.min("d").alias("lo"), F.max("d").alias("hi")
    )
    voted = daily.select(
        F.explode(F.sequence(F.col("d"), F.date_add("d", 6))).alias("d_obs"),
        "sk",
    )
    return (
        voted.join(F.broadcast(bounds))
        .filter((F.col("d_obs") >= F.col("lo")) & (F.col("d_obs") <= F.col("hi")))
        .groupBy("d_obs")
        .agg(F.hll_union_agg("sk").alias("u"))
        .select(
            F.date_format("d_obs", "yyyy-MM-dd").alias("day"),
            F.hll_sketch_estimate("u").alias("approx_users_7d"),
        )
        .orderBy("day")
    )


_CM_W, _CM_D = 64, 2
_CM_JS = ", ".join(str(j) for j in range(_CM_D))


@register(
    "events_type_countmin",
    tags=("sketch", "countmin", "mergeable"),
    oracle=f"""
WITH js AS (SELECT unnest([{_CM_JS}]) AS j),
hashed AS (
    SELECT j, CAST(('0x' || substr(md5(event_type || CAST(j AS VARCHAR)), 1, 8))
                   AS BIGINT) % {_CM_W} AS cell
    FROM events CROSS JOIN js
),
sketch AS (SELECT j, cell, COUNT(*) AS c FROM hashed GROUP BY 1, 2),
types AS (SELECT DISTINCT event_type FROM events),
lookup AS (
    SELECT t.event_type, s.c
    FROM types t CROSS JOIN js
    JOIN sketch s
      ON s.j = js.j
     AND s.cell = CAST(('0x' || substr(md5(t.event_type || CAST(js.j AS VARCHAR)),
                                       1, 8)) AS BIGINT) % {_CM_W}
),
est AS (SELECT event_type, MIN(c) AS cm_estimate FROM lookup GROUP BY 1),
exact AS (SELECT event_type, COUNT(*) AS exact_n FROM events GROUP BY 1)
SELECT e.event_type, est.cm_estimate, e.exact_n,
       est.cm_estimate - e.exact_n AS overcount
FROM exact e JOIN est USING (event_type)
ORDER BY event_type
""",
)
def events_type_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT-MIN SKETCH as pure DataFrame ops, hash-matched because the
    oracle replays the ALGORITHM (same md5 cells, same min), not the
    answer — collisions, if any, bias both engines identically. The
    sketch is d=2 x w=64 counters built by one
    groupBy((j, cell)) — a fixed-size, MERGEABLE partial (union = add
    counter tables cell-wise), which is the whole point at 100 TB:
    per-partition sketches merge in constant space where an exact
    per-key count shuffles the key universe. Estimates come from a
    broadcast lookup of the queried items' cells; the exact counts
    ride along so the overcount (the CM guarantee: estimate >= truth)
    is visible in the result."""
    ev = Catalog(spark, sf_dir).events

    def cell(col, j):
        return (
            F.conv(
                F.substring(F.md5(F.concat(col, F.lit(str(j)))), 1, 8), 16, 10
            ).cast("long")
            % _CM_W
        )

    cells = ev.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        cell(F.col("event_type"), j).alias("cell"),
                    )
                    for j in range(_CM_D)
                ]
            )
        ).alias("p")
    ).select("p.j", "p.cell")
    sketch = cells.groupBy("j", "cell").agg(F.count("*").alias("c"))

    types = ev.select("event_type").distinct()
    probes = types.select(
        "event_type",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        cell(F.col("event_type"), j).alias("cell"),
                    )
                    for j in range(_CM_D)
                ]
            )
        ).alias("p"),
    ).select("event_type", "p.j", "p.cell")
    est = (
        F.broadcast(probes)
        .join(sketch, ["j", "cell"])
        .groupBy("event_type")
        .agg(F.min("c").alias("cm_estimate"))
    )
    exact = ev.groupBy("event_type").agg(F.count("*").alias("exact_n"))
    return (
        exact.join(est, "event_type")
        .select(
            "event_type", "cm_estimate", "exact_n",
            (F.col("cm_estimate") - F.col("exact_n")).alias("overcount"),
        )
        .orderBy("event_type")
    )
