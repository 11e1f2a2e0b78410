"""Stream-stream interval join (SURVEY.md §2.8 capability extension).

The streaming form of `operators/temporal.range_join`: two live
streams joined on a key plus an event-time range condition. Spark
buffers each side in watermark-bounded state — the time-range bound
is what lets it evict: a row older than (watermark - gap) can never
match again and is dropped. Without watermarks on BOTH sides the
state would grow forever; with them, state is O(gap x arrival rate)
per key regardless of stream length.

Unified-model guarantee (tested): on identical finite input the
stream-stream join emits exactly the rows of the batch inequality
join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    max_gap_seconds: int,
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join two streaming frames where |left_ts - right_ts| <= gap on
    the shared key. Column names of the two inputs must not collide
    apart from the join key (rename upstream, as the gate/test do)."""
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark).withColumnRenamed(on, f"_r_{on}")
    cond = (
        (F.col(on) == F.col(f"_r_{on}"))
        & (
            F.col(right_ts)
            >= F.col(left_ts) - F.expr(f"INTERVAL {max_gap_seconds} SECONDS")
        )
        & (
            F.col(right_ts)
            <= F.col(left_ts) + F.expr(f"INTERVAL {max_gap_seconds} SECONDS")
        )
    )
    # the join key must survive OUTER joins from whichever side is
    # present: a fullOuter unmatched-right row has a NULL left key, so
    # plain drop(_r_key) would null the key column (round 8, added
    # with the full-outer gate)
    return (
        l.join(r, cond, how)
        .withColumn(on, F.coalesce(F.col(on), F.col(f"_r_{on}")))
        .drop(f"_r_{on}")
    )
