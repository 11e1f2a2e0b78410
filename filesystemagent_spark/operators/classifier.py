"""Distributed classifier training as DataFrame aggregation.

The reference has no ML training, but a 100 TB curation pipeline needs
cheap learned filters (quality / language classifiers a la fastText
used by the big public corpus recipes). This module implements the
training LOOP in the engine's iterative-algorithm shape — like
k-means (operators/similarity.py) and PageRank (queries/graph.py),
each iteration is one distributed aggregation whose result crossing
the driver is a single fixed-width row, so the control plane stays
O(iterations), never O(rows).

Batch perceptron specifically, over INTEGER features: the update
w += sum_{misclassified} y * x is an integer sum, which is exactly
associative/commutative — the result is bit-identical under any
partitioning or aggregation order, so the entire multi-iteration
training run (not just one step) is replayable by an external SQL
engine as unrolled CTEs and hash-matched. A float GD loop could not
make that guarantee (sum order drifts ulps); this is the same
exact-arithmetic discipline the TPC-H money queries use (decimal
sums) applied to model training.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["perceptron_train", "perceptron_oracle_sql"]


def perceptron_train(
    feats: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iterations: int = 3,
) -> tuple[list[int], DataFrame]:
    """Train a batch perceptron on integer features.

    ``feats`` must have integer feature columns (a constant 1 column
    serves as bias) and ``label_col`` in {-1, +1}. Returns the final
    integer weight vector and the confusion matrix DataFrame
    (label, pred, n) — predictions use sign(w.x) with 0 mapped to -1.

    Scale shape: each iteration is one scan + partial-agg reduce of
    the (narrow, persisted) feature projection; the driver sees one
    row of k integers per iteration. 100 TB ready: no collect of row
    data, no growing lineage (weights are plain Python ints folded
    into next iteration's expressions).
    """
    from filesystemagent_spark.caching import track_persist

    y = F.col(label_col)
    feats = track_persist(feats)
    w = [0] * len(feature_cols)
    for _ in range(iterations):
        margin = _dot(w, feature_cols) * y
        grad = feats.select(
            *[
                F.sum(F.when(margin <= 0, y * F.col(c)).otherwise(F.lit(0))).alias(c)
                for c in feature_cols
            ]
        ).first()
        w = [wi + int(grad[c] or 0) for wi, c in zip(w, feature_cols)]
    pred = F.when(_dot(w, feature_cols) > 0, 1).otherwise(-1)
    confusion = (
        feats.groupBy(y.alias("label"), pred.alias("pred"))
        .agg(F.count("*").alias("n"))
    )
    return w, confusion


def _dot(w: list[int], cols: list[str]) -> Column:
    out = F.lit(0).cast("long")
    for wi, c in zip(w, cols):
        out = out + F.lit(wi) * F.col(c)
    return out


def perceptron_oracle_sql(
    source_cte: str, feature_exprs: dict[str, str], label_expr: str, iterations: int = 3
) -> str:
    """Generate the DuckDB replay of the ENTIRE training run: unrolled
    CTEs, one per iteration, each cross-joining the previous weight
    row — the SQL twin of the driver loop above. ``feature_exprs``
    maps feature name -> SQL expression over the source; the caller
    embeds the returned WITH-query as its oracle."""
    names = list(feature_exprs)
    feat_select = ", ".join(f"{e} AS {n}" for n, e in feature_exprs.items())
    sql = [
        f"WITH src AS ({source_cte}),",
        f"f AS (SELECT {feat_select}, {label_expr} AS y FROM src),",
    ]
    prev_w = {n: "0" for n in names}
    for it in range(1, iterations + 1):
        dot = " + ".join(f"({prev_w[n]}) * {n}" for n in names)
        # ANY_VALUE: the previous-weight CTE has exactly one row, but a
        # bare column ref is not allowed next to SUM without GROUP BY
        sums = ", ".join(
            f"ANY_VALUE({prev_w[n]})"
            f" + SUM(CASE WHEN y * ({dot}) <= 0 THEN y * {n} ELSE 0 END) AS w_{n}"
            for n in names
        )
        join = "" if it == 1 else f" CROSS JOIN w{it - 1}"
        sql.append(f"w{it} AS (SELECT {sums} FROM f{join}),")
        prev_w = {n: f"w{it}.w_{n}" for n in names}
    final_dot = " + ".join(f"{prev_w[n]} * {n}" for n in names)
    sql.append(
        f"scored AS (SELECT y AS label, CASE WHEN ({final_dot}) > 0 THEN 1 ELSE -1 END"
        f" AS pred FROM f CROSS JOIN w{iterations})"
    )
    sql.append(
        "SELECT label, pred, COUNT(*) AS n FROM scored GROUP BY label, pred"
        " ORDER BY label, pred"
    )
    return "\n".join(sql)
