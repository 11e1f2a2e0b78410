"""Sequence packing — fill fixed-budget bins with variable-size chunks.

Training pipelines pack tokenized chunks into fixed-length model
sequences to avoid padding waste. The packing decision is inherently
sequential WITHIN a group (bin state changes with every placement) but
embarrassingly parallel ACROSS groups — exactly `applyInPandas`'s
contract: one shuffle on the group key, pure-pandas first-fit-
decreasing per group, no driver involvement.

Group key choice is the scale lever: pack per (source, shard) so each
group's chunk list fits one task; the greedy FFD result is
deterministic given the (size desc, doc_id, chunk_id) order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def pack_first_fit(
    chunks: DataFrame,
    group_cols: list[str] | str,
    size_col: str,
    budget: int,
    id_cols: list[str] | str = ("doc_id", "chunk_id"),
) -> DataFrame:
    """Assign each chunk to a bin (`bin_id`) within its group such
    that no bin's total `size_col` exceeds `budget` — except a chunk
    singly larger than the budget, which gets its own bin (callers
    split oversize chunks upstream if that matters).

    First-fit-decreasing: ≤ (11/9)·OPT + 1 bins, deterministic via
    the (size desc, *id_cols) sort.
    """
    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    id_cols = [id_cols] if isinstance(id_cols, str) else list(id_cols)

    out_schema = T.StructType(
        [chunks.schema[c] for c in group_cols]
        + [chunks.schema[c] for c in id_cols]
        + [
            T.StructField("size", T.LongType()),
            T.StructField("bin_id", T.LongType()),
        ]
    )

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(
            [size_col, *id_cols], ascending=[False] + [True] * len(id_cols)
        )
        bins: list[int] = []  # remaining capacity per bin
        assigned = []
        for sz in pdf[size_col].astype("int64"):
            placed = None
            for i, cap in enumerate(bins):
                if sz <= cap:
                    placed, bins[i] = i, cap - sz
                    break
            if placed is None:
                placed = len(bins)
                # Oversize chunks monopolize a zero-capacity bin.
                bins.append(max(0, budget - sz))
            assigned.append(placed)
        out = pdf[group_cols + id_cols].copy()
        out["size"] = pdf[size_col].astype("int64").values
        out["bin_id"] = pd.Series(assigned, index=pdf.index, dtype="int64")
        return out

    return chunks.groupBy(*group_cols).applyInPandas(pack, out_schema)
