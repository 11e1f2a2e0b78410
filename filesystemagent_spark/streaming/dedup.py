"""Streaming deduplication — exact dedup over unbounded input.

The batch engine dedups with groupBy/row_number (operators/dedup.py);
a training-data ingest stream needs the same guarantee continuously.
Two state disciplines, both keyed by the dedup key (e.g. the document
content hash):

- `dedup_stream`: `dropDuplicates` on the keys — state grows with the
  distinct-key count and is exact forever. Right when the key domain
  is bounded (catalog upserts) or the stream is replay-bounded.
- `dedup_stream_within_watermark`: `dropDuplicatesWithinWatermark` —
  duplicates are only suppressed while their first occurrence is
  within the watermark horizon, and state older than the watermark is
  evicted. This is the 100 TB shape: bounded state, with the horizon
  (`delay`) as the documented dedup contract — a duplicate arriving
  later than `delay` after the original is treated as new.

Both are plain transformations: valid in batch too (dropDuplicates),
which is how the tests prove them against the batch dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(df: DataFrame, keys: list[str] | str) -> DataFrame:
    """Exact keep-first dedup on `keys`; unbounded (exact) state."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    return df.dropDuplicates(keys)


def dedup_stream_within_watermark(
    df: DataFrame,
    keys: list[str] | str,
    event_time_col: str,
    delay: str = "1 hour",
) -> DataFrame:
    """Keep-first dedup with watermark-bounded state.

    `df` must be a streaming DataFrame; `event_time_col` supplies the
    watermark clock and `delay` the suppression horizon (state TTL).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    wm = df.withWatermark(event_time_col, delay)
    return wm.dropDuplicatesWithinWatermark(keys)
