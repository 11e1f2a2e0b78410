"""Temporal joins — as-of (nearest prior/next match per key).

Capability extension: the reference has no temporal joins (SURVEY.md
§2.3 "notably absent"), but an events/metrics engine needs them the
moment two time series meet ("state of X when Y happened").

The implementation is the union+window construction, not a range
join: tag both inputs, union them, and carry the most recent right
payload forward with `last(..., ignoreNulls)` over a per-key window.
One shuffle on the join key, linear work per key — where a per-key
range join degrades to O(n·m) on hot keys, this stays O((n+m) log)
for the sort and survives skew with AQE. The same shape runs under
Structured Streaming as a stream-static or stream-stream join with
the window replaced by state.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from filesystemagent_spark.functions.tscompat import epoch_seconds


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] | None = None,
    prefix: str = "right_",
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Left as-of join: for every left row, the single right row with
    the greatest right_ts <= left_ts (backward; inclusive) or smallest
    right_ts >= left_ts (forward) within the same key group. Unmatched
    left rows keep nulls — left-outer semantics, like DuckDB/pandas
    ASOF.

    `right_cols` selects the right payload (default: everything except
    keys and ts); outputs are `prefix`-renamed plus `<prefix><right_ts>`
    for the matched timestamp. With several right rows at the exact
    same (key, ts) the winner follows the window order within the
    union — keep the right side unique per (key, ts) (pre-aggregate)
    for deterministic output, as any as-of engine requires.

    `tolerance_seconds` voids matches further than the given gap —
    pandas' `tolerance`, expressed on the matched row after the fact
    so it costs one comparison, not a second window.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*keys, right_ts)]

    payload = F.struct(
        F.col(right_ts).alias("_matched_ts"), *[F.col(c) for c in right_cols]
    )
    r = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        payload.alias("_p"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("_l"),
    )
    l = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(r.schema["_p"].dataType).alias("_p"),
        F.struct(*left.columns).alias("_l"),
    )

    # backward: scan time ascending; right rows sort before left rows
    # at equal ts so an exactly-simultaneous right row matches (<=).
    # forward: scan descending, same tag order gives >= semantics.
    ts_order = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l.unionByName(r)
        .withColumn("_m", F.last("_p", ignorenulls=True).over(w))
        .filter(F.col("_tag") == 1)
    )

    m: Column = F.col("_m")
    if tolerance_seconds is not None:
        gap = F.abs(epoch_seconds("_ts") - epoch_seconds(m["_matched_ts"]))
        m = F.when(gap <= tolerance_seconds, m)

    out = [F.col("_l")[c].alias(c) for c in left.columns]
    out.append(m["_matched_ts"].alias(f"{prefix}{right_ts}"))
    out.extend(m[c].alias(f"{prefix}{c}") for c in right_cols)
    return matched.select(*out)


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_gap_seconds: float = 300.0,
    right_cols: Sequence[str] | None = None,
    prefix: str = "right_",
    how: str = "inner",
) -> DataFrame:
    """Temporal range join: pairs within `max_gap_seconds` of each
    other per key (|left_ts - right_ts| <= gap, inclusive).

    A naive time-inequality join degenerates to a per-key cross join.
    Binning fixes the complexity: both sides bucket time into
    gap-sized bins; a qualifying pair is at most one bin apart, so the
    right side replicates into its bin±1 and the join becomes a plain
    equi-join on (key, bin) — each candidate pair meets exactly once
    (the 3 replicated bins are distinct), then the exact |Δt| filter
    keeps true matches. Cost: 3x the right side's rows, shuffle on
    (key, bin) — bounded and skew-splittable, vs. unbounded per-key
    quadratic blowup. `how="left"` keeps unmatched left rows with
    nulls (the gap test folds into the join condition, so it cannot
    drop them afterwards).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"range_join supports inner|left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*keys, right_ts)]
    gap = float(max_gap_seconds)

    l = left.withColumn("_bin", F.floor(epoch_seconds(left_ts) / gap))
    r = (
        right.select(
            *[F.col(k).alias(f"_rk_{k}") for k in keys],
            F.col(right_ts).alias("_rts"),
            *[F.col(c).alias(f"{prefix}{c}") for c in right_cols],
        )
        .withColumn("_rbin0", F.floor(epoch_seconds("_rts") / gap))
        .withColumn(
            "_bin", F.explode(F.array(F.col("_rbin0") - 1, F.col("_rbin0"), F.col("_rbin0") + 1))
        )
        .drop("_rbin0")
    )
    cond = l["_bin"] == r["_bin"]
    for k in keys:
        cond = cond & (l[k] == r[f"_rk_{k}"])
    cond = cond & (F.abs(epoch_seconds(left_ts) - epoch_seconds("_rts")) <= gap)
    joined = l.join(r, cond, how)
    out = [*left.columns, F.col("_rts").alias(f"{prefix}{right_ts}")]
    out += [f"{prefix}{c}" for c in right_cols]
    return joined.select(*out)
