"""Semantics tests for SCD type-2 dimension maintenance."""

from __future__ import annotations

from pyspark.sql import functions as F

from filesystemagent_spark.operators.scd import scd2_apply


def _dim(spark, rows):
    return spark.createDataFrame(
        rows, "k long, seg string, valid_from string, valid_to string, is_current boolean"
    )


def _chg(spark, rows):
    return spark.createDataFrame(rows, "k long, seg string")


def _apply(spark, dim_rows, chg_rows):
    out = scd2_apply(
        _dim(spark, dim_rows), _chg(spark, chg_rows), "k", ["seg"], "2025-06-01"
    )
    return sorted(
        (r.k, r.seg, r.valid_from, r.valid_to, r.is_current) for r in out.collect()
    )


def test_change_closes_and_reopens(spark):
    got = _apply(spark, [(1, "A", "2025-01-01", None, True)], [(1, "B")])
    assert got == [
        (1, "A", "2025-01-01", "2025-06-01", False),
        (1, "B", "2025-06-01", None, True),
    ]


def test_restated_value_is_noop_and_unkeyed_rows_carry(spark):
    dim = [(1, "A", "2025-01-01", None, True), (2, "B", "2025-01-01", None, True)]
    got = _apply(spark, dim, [(1, "A")])
    assert got == [
        (1, "A", "2025-01-01", None, True),
        (2, "B", "2025-01-01", None, True),
    ]


def test_new_key_inserted(spark):
    got = _apply(spark, [(1, "A", "2025-01-01", None, True)], [(9, "Z")])
    assert (9, "Z", "2025-06-01", None, True) in got
    assert (1, "A", "2025-01-01", None, True) in got


def test_history_rows_pass_through_untouched(spark):
    dim = [
        (1, "OLD", "2024-01-01", "2025-01-01", False),
        (1, "A", "2025-01-01", None, True),
    ]
    got = _apply(spark, dim, [(1, "B")])
    assert got == [
        (1, "A", "2025-01-01", "2025-06-01", False),
        (1, "B", "2025-06-01", None, True),
        (1, "OLD", "2024-01-01", "2025-01-01", False),
    ]


def test_reapplication_is_idempotent(spark):
    dim = _dim(spark, [(1, "A", "2025-01-01", None, True)])
    chg = _chg(spark, [(1, "B")])
    once = scd2_apply(dim, chg, "k", ["seg"], "2025-06-01")
    twice = scd2_apply(once, chg, "k", ["seg"], "2025-06-01")
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b


def test_null_attr_change_detection(spark):
    """eqNullSafe: NULL→value is a change; NULL→NULL is not."""
    dim = [(1, None, "2025-01-01", None, True), (2, None, "2025-01-01", None, True)]
    out = scd2_apply(
        _dim(spark, dim), _chg(spark, [(1, "X"), (2, None)]), "k", ["seg"], "2025-06-01"
    )
    got = {(r.k, r.seg, r.valid_from, r.valid_to, r.is_current) for r in out.collect()}
    assert got == {
        (1, None, "2025-01-01", "2025-06-01", False),
        (1, "X", "2025-06-01", None, True),
        (2, None, "2025-01-01", None, True),
    }
