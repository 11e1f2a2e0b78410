"""Generic relational operators: top-K, ranking, snapshot diff, dedup windows.

Re-expresses the reference's hand-rolled Python loops as declarative
DataFrame transforms (SURVEY.md §2.3-2.6):

- top-K:         sorted(rows, key=...)[:n]            → orderBy/limit or rank window
                 (/root/reference/src/audit/analyzers/resource_analyzer.py:123-142)
- snapshot diff: dict-key set difference               → anti-joins
                 (/root/reference/src/audit/analyzers/baseline_differ.py:118-360)
- keep-oldest:   per-group min(modified_time) keeper   → row_number window
                 (/root/reference/src/file_indexing_system.py:274-279)

Scale notes: global top-K is `orderBy(...).limit(n)` — Spark executes
it as per-partition TakeOrdered + driver merge of n·partitions rows,
no full sort, no shuffle of the data set. Grouped top-K is a rank
window — one shuffle on the partition key. Anti-joins broadcast the
smaller side automatically under AQE when it fits.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """Global top-K. Pass a deterministic order (include a unique
    tie-break column) so results are stable across engines."""
    return df.orderBy(*order).limit(k)


def grouped_top_k(
    df: DataFrame,
    partition_by: Sequence[str],
    order: Sequence[Column],
    k: int,
    rank_col: str = "rnk",
    keep_rank: bool = False,
) -> DataFrame:
    """Top-K per group via row_number — the scalable form of the
    reference's per-host sort loops. One shuffle on the group key."""
    w = Window.partitionBy(*partition_by).orderBy(*order)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)


def keep_first(
    df: DataFrame,
    partition_by: Sequence[str],
    order: Sequence[Column],
) -> DataFrame:
    """Keep exactly one row per group under a deterministic order —
    the keep-oldest dedup policy (W5). Equivalent to the reference's
    'oldest modified_time wins' with an explicit tie-break, which the
    reference lacks (SURVEY.md §7.5)."""
    return grouped_top_k(df, partition_by, order, k=1)


def snapshot_diff(
    current: DataFrame,
    baseline: DataFrame,
    keys: Sequence[str],
    null_fill: str = "",
) -> DataFrame:
    """Baseline diff: rows added vs removed between two snapshots.

    The heart of the reference's baseline_differ (J1-J4, SO1), as a
    pair of anti-joins with null-safe key normalization (the reference
    coalesces None paths to "" — baseline_differ.py:123-129).

    Returns the union with a ``change_type`` column ('added'/'removed')
    and the payload columns of the side the row came from.
    """

    def norm(df: DataFrame) -> DataFrame:
        for k in keys:
            df = df.withColumn(k, F.coalesce(F.col(k).cast("string"), F.lit(null_fill)))
        return df

    cur, base = norm(current), norm(baseline)
    added = cur.join(base.select(*keys), on=list(keys), how="left_anti").withColumn(
        "change_type", F.lit("added")
    )
    removed = base.join(cur.select(*keys), on=list(keys), how="left_anti").withColumn(
        "change_type", F.lit("removed")
    )
    return added.unionByName(removed)


def diff_summary(diff: DataFrame, category_col: str | None = None) -> DataFrame:
    """Per-category added/removed counts (baseline_differ.py:103-111)."""
    group = [category_col, "change_type"] if category_col else ["change_type"]
    return diff.groupBy(*group).agg(F.count("*").alias("n_changes"))


def rank_by_map(
    df: DataFrame,
    col: str,
    rank_map: dict[str, int],
    rank_col: str = "rank",
    default: int = 99,
) -> DataFrame:
    """Attach an explicit rank column for custom orderings — the
    reference's severity sort CRITICAL<HIGH<... (pipeline.py:373-379)
    is not lexicographic, so an explicit map is the only correct way
    to order it in any engine."""
    expr: Column = F.lit(default)
    # Build a when-chain; for large maps a broadcast-joined dim table
    # would be the scale path, but rank maps are tiny by construction.
    for value, rank in rank_map.items():
        expr = F.when(F.col(col) == value, F.lit(rank)).otherwise(expr)
    return df.withColumn(rank_col, expr)


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    keys: Sequence[str],
    *,
    how: str = "inner",
    salt_buckets: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Equi-join that survives hot keys: the skewed side scatters each
    row into one of `salt_buckets` sub-keys at random; the other side
    replicates every row across all buckets. A key holding 30% of the
    data then lands on `salt_buckets` reducers instead of one.

    Result-identical to `skewed.join(other, keys, how)` for inner and
    left joins (the salt only splits groups, never separates matching
    keys). Cost: the other side shuffles `salt_buckets`x — use when
    the other side is much smaller than the hot groups but too big to
    broadcast; if it fits in memory, `broadcast()` beats salting, and
    AQE's skew-join split (`spark.sql.adaptive.skewJoin`) handles
    moderate skew without either. The salt comes from a seeded uniform
    so replays are reproducible.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner|left, got {how!r}")
    keys = list(keys)
    s = skewed.withColumn(
        "_salt", F.floor(F.rand(seed) * salt_buckets).cast("int")
    )
    o = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return s.join(o, [*keys, "_salt"], how).drop("_salt")


def rrf_fuse(
    rankings: Sequence[tuple[str, DataFrame]],
    *,
    id_col: str,
    rank_col: str = "rnk",
    k: int = 60,
    top_k: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al.): combine N retrievers'
    rankings into one list by rrf(id) = Σ_r 1/(k + rank_r(id)) — the
    standard score-free fusion for hybrid search (lexical + semantic,
    or any mix: each retriever only contributes its RANKS, so
    incomparable score scales fuse cleanly).

    Input: (name, df) pairs where df carries (id_col, rank_col) with
    rank 1 = best. Output: (id_col, rrf_score, n_retrievers, one
    rank_<name> column per input), best first, doc-id tie-break.

    Scale shape: each retriever's list is already top-K-bounded, so
    this is a union of small frames + one aggregation on the id — no
    join chain (an N-way full outer join degenerates at N retrievers;
    the union+pivot form is one shuffle regardless of N). Determinism:
    each contribution 1/(k+rank) is an exact IEEE op; the sum is
    order-independent for ≤2 retrievers (two-operand addition is
    commutative) and rounded before ranking for larger N."""
    if not rankings:
        raise ValueError("rrf_fuse requires at least one ranking")
    tagged = None
    for name, df in rankings:
        part = df.select(
            F.col(id_col),
            F.lit(name).alias("_retriever"),
            F.col(rank_col).cast("bigint").alias("_rank"),
        )
        tagged = part if tagged is None else tagged.unionByName(part)
    names = [name for name, _ in rankings]
    fused = (
        tagged.groupBy(id_col)
        .agg(
            F.round(F.sum(F.lit(1.0) / (F.lit(float(k)) + F.col("_rank"))), 9).alias(
                "rrf_score"
            ),
            F.count("*").alias("n_retrievers"),
            *[
                F.max(
                    F.when(F.col("_retriever") == name, F.col("_rank"))
                ).alias(f"rank_{name}")
                for name in names
            ],
        )
        .orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
    )
    return fused.limit(top_k) if top_k else fused
