"""Slowly-changing-dimension (type 2) maintenance as set operations.

The reference's catalog upsert is last-writer-wins (`INSERT OR
REPLACE`, /root/reference/src/file_indexing_system.py:168-198) and its
baseline differ computes added/changed sets procedurally
(src/audit/analyzers/baseline_differ.py:118-168). SCD2 is the engine
capability both gesture at: apply a change batch to a versioned
dimension so history is preserved — close the superseded row, open the
new version, keep untouched rows, insert unseen keys.

Everything is ONE full-outer join on the business key plus unions —
no per-row driver logic, no MERGE dependency — so the same plan runs
on plain parquet at any scale (with Delta available, the identical
dataflow feeds a MERGE; the set algebra is unchanged). Change
detection compares the tracked attributes, so a change batch that
restates current values is a no-op (idempotent re-application).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key: str,
    attrs: Sequence[str],
    effective: str,
    *,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
) -> DataFrame:
    """Return the post-batch dimension.

    `dim` carries (key, attrs..., valid_from, valid_to, is_current);
    `changes` carries (key, attrs...) — one row per key (pre-dedupe
    upstream: keep-last by a change timestamp is `relational.keep_first`
    on the descending order). `effective` is the batch's effective
    date literal applied to every transition.
    """
    cur = dim.filter(F.col(is_current))
    hist = dim.filter(~F.col(is_current))

    chg = changes.select(
        F.col(key).alias("_k"), *[F.col(a).alias(f"_n_{a}") for a in attrs]
    )
    j = cur.join(chg, cur[key] == F.col("_k"), "full_outer")

    differs = F.lit(False)
    for a in attrs:
        differs = differs | ~F.col(a).eqNullSafe(F.col(f"_n_{a}"))

    matched = j.filter(F.col(key).isNotNull())
    changed = matched.filter(F.col("_k").isNotNull() & differs)
    untouched = matched.filter(F.col("_k").isNull() | ~differs).select(dim.columns)

    closed = changed.select(
        key,
        *attrs,
        valid_from,
        F.lit(effective).alias(valid_to),
        F.lit(False).alias(is_current),
    )
    reopened = changed.select(
        F.col(key),
        *[F.col(f"_n_{a}").alias(a) for a in attrs],
        F.lit(effective).alias(valid_from),
        F.lit(None).cast(dim.schema[valid_to].dataType).alias(valid_to),
        F.lit(True).alias(is_current),
    )
    inserted = j.filter(F.col(key).isNull()).select(
        F.col("_k").alias(key),
        *[F.col(f"_n_{a}").alias(a) for a in attrs],
        F.lit(effective).alias(valid_from),
        F.lit(None).cast(dim.schema[valid_to].dataType).alias(valid_to),
        F.lit(True).alias(is_current),
    )
    return (
        hist.select(dim.columns)
        .unionByName(untouched)
        .unionByName(closed.select(dim.columns))
        .unionByName(reopened.select(dim.columns))
        .unionByName(inserted.select(dim.columns))
    )
