"""Distributed perceptron training (operators/classifier.py): exact
integer reproducibility under repartitioning, convergence on separable
data, and the generated oracle's equivalence to a pure-Python replay."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from filesystemagent_spark.operators.classifier import (
    perceptron_oracle_sql,
    perceptron_train,
)


def _toy(spark, n=400, seed=3, parts=1):
    """Separable threshold on a dominant small-range feature plus a
    small noise feature — the geometry batch perceptron handles well
    (mirrors doc_quality_perceptron's len_h/digits_8 ranges; wide
    noise features make full-batch updates oscillate for a long time)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 6, n)
    b = rng.integers(0, 4, n)
    y = np.where(a >= 3, 1, -1)
    df = spark.createDataFrame(
        [(1, int(ai), int(bi), int(yi)) for ai, bi, yi in zip(a, b, y)],
        "bias long, a long, b long, y long",
    )
    return df.repartition(parts), a, b, y


def _replay(X, y, iters):
    w = np.zeros(X.shape[1], dtype=np.int64)
    for _ in range(iters):
        mis = y * (X @ w) <= 0
        w = w + (y[mis, None] * X[mis]).sum(axis=0)
    return w


def test_weights_match_pure_python_replay(spark):
    df, a, b, y = _toy(spark)
    X = np.stack([np.ones_like(a), a, b], axis=1).astype(np.int64)
    for iters in (1, 3, 7):
        w, _ = perceptron_train(df, ["bias", "a", "b"], "y", iterations=iters)
        assert w == _replay(X, y.astype(np.int64), iters).tolist(), iters


def test_weights_invariant_under_partitioning(spark):
    """Integer gradient sums are exactly associative — any partition
    count must give bit-identical weights (the property that makes the
    full trajectory oracle-replayable)."""
    results = []
    for parts in (1, 7, 32):
        df, *_ = _toy(spark, parts=parts)
        w, _ = perceptron_train(df, ["bias", "a", "b"], "y", iterations=5)
        results.append(w)
    assert results[0] == results[1] == results[2]


def test_converges_on_separable_data(spark):
    df, *_ = _toy(spark)
    w, confusion = perceptron_train(df, ["bias", "a", "b"], "y", iterations=25)
    rows = {(r["label"], r["pred"]): r["n"] for r in confusion.collect()}
    wrong = sum(n for (lab, pred), n in rows.items() if lab != pred)
    assert wrong == 0  # converges exactly at iteration 24 (replay-pinned)


def test_confusion_matrix_counts_everything(spark):
    df, *_ = _toy(spark)
    _w, confusion = perceptron_train(df, ["bias", "a", "b"], "y", iterations=2)
    assert confusion.agg(F.sum("n")).first()[0] == df.count()


def test_oracle_sql_replays_training(spark):
    """The generated unrolled-CTE SQL, run through DuckDB on the same
    rows, must equal the Spark-trained confusion matrix."""
    duckdb = pytest.importorskip("duckdb")
    df, a, b, y = _toy(spark)
    _w, confusion = perceptron_train(df, ["bias", "a", "b"], "y", iterations=4)
    got = sorted(tuple(r) for r in confusion.collect())

    con = duckdb.connect()
    con.execute("CREATE TABLE t (a BIGINT, b BIGINT, y BIGINT)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?, ?)",
        [(int(ai), int(bi), int(yi)) for ai, bi, yi in zip(a, b, y)],
    )
    sql = perceptron_oracle_sql(
        "SELECT * FROM t",
        {"bias": "1", "a": "a", "b": "b"},
        "y",
        iterations=4,
    )
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want
