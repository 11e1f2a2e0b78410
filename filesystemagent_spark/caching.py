"""Session-scoped registry for operator-internal persisted DataFrames.

Several operators materialize a derived sketch before a self-join
(minhash/simhash/Hamming bands, LSH buckets, inverted indexes, oriented
edge lists): Catalyst re-executes a self-join's upstream once per branch
otherwise, so the persist is load-bearing for performance. But the
DataFrames are internal to the operator — the caller never sees them, so
the caller can't unpersist them, and repeated operator calls in one
long-lived session would accumulate MEMORY_AND_DISK cache entries until
executor storage evicts them under pressure.

``track_persist`` is the one persist call sites use; every persisted
intermediate lands in a registry that ``release_tracked_caches`` drains.
Long-running hosts (the sweep and driver-sim loops, a notebook between
pipeline stages, a scheduler between jobs) call the release hook after
each unit of work. Eviction-on-pressure makes the leak benign for
single-query runs, so callers that never release still work — they just
hold warm caches, which is also what makes bench.py's min-of-3 a
warm-cache metric (see SCALE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_TRACKED: list[DataFrame] = []


def track_persist(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """``df.persist(level)``, registered for later bulk release."""
    persisted = df.persist(level)
    _TRACKED.append(persisted)
    return persisted


def tracked_count() -> int:
    return len(_TRACKED)


def tracked_mark() -> int:
    """A position marker for `release_tracked_since` — scoped release
    for long-running hosts that must drop THEIR intermediates without
    draining a caller's (a feed sink's per-batch release is the
    motivating case: thousands of micro-batches would otherwise
    accumulate tracked entries for the session's lifetime)."""
    return len(_TRACKED)


def release_tracked_since(mark: int, blocking: bool = False) -> int:
    """Unpersist every intermediate tracked after `mark` (from
    `tracked_mark`). Interleaved tracking from a concurrent query can
    hand this a stranger's entry — unpersist just costs that query a
    recompute, never correctness."""
    released = 0
    while len(_TRACKED) > mark:
        df = _TRACKED.pop()
        try:
            df.unpersist(blocking)
            released += 1
        except Exception:
            pass
    return released


def release_tracked_caches(blocking: bool = False) -> int:
    """Unpersist every tracked intermediate; returns how many were
    released. Safe to call at any time: unpersist on an already-freed
    or garbage DataFrame is a no-op, and a dead session's failures are
    swallowed (the JVM-side cache died with the session)."""
    released = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist(blocking)
            released += 1
        except Exception:
            pass
    return released
