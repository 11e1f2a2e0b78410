"""Unit semantics for the as-of join (backward/forward, inclusive
ties, tolerance, left-outer nulls). The sf-data oracle check lives in
the `events_asof_prior_view` gate query."""

from __future__ import annotations

from datetime import datetime

from filesystemagent_spark.operators.temporal import as_of_join


def _ts(s):
    return datetime.fromisoformat(s)


def _left(spark):
    return spark.createDataFrame(
        [
            ("k1", _ts("2026-01-01 10:00:00"), "l1"),
            ("k1", _ts("2026-01-01 12:00:00"), "l2"),
            ("k2", _ts("2026-01-01 09:00:00"), "l3"),  # before any right row
        ],
        "key string, ts timestamp, lval string",
    )


def _right(spark):
    return spark.createDataFrame(
        [
            ("k1", _ts("2026-01-01 09:30:00"), "r1"),
            ("k1", _ts("2026-01-01 10:00:00"), "r2"),  # simultaneous with l1
            ("k1", _ts("2026-01-01 11:00:00"), "r3"),
            ("k2", _ts("2026-01-01 10:30:00"), "r4"),
        ],
        "key string, ts timestamp, rval string",
    )


def test_backward_inclusive(spark):
    got = {
        r["lval"]: r["right_rval"]
        for r in as_of_join(_left(spark), _right(spark), on="key").collect()
    }
    # l1 matches the simultaneous r2 (inclusive), not the earlier r1
    assert got == {"l1": "r2", "l2": "r3", "l3": None}


def test_forward(spark):
    got = {
        r["lval"]: r["right_rval"]
        for r in as_of_join(
            _left(spark), _right(spark), on="key", direction="forward"
        ).collect()
    }
    # l2 (12:00) has no later right row; l3 picks the next one at 10:30
    assert got == {"l1": "r2", "l2": None, "l3": "r4"}


def test_tolerance(spark):
    got = {
        r["lval"]: r["right_rval"]
        for r in as_of_join(
            _left(spark), _right(spark), on="key", tolerance_seconds=1800.0
        ).collect()
    }
    # l2 (12:00) -> r3 (11:00) is 3600s away: voided by the 1800s cap
    assert got == {"l1": "r2", "l2": None, "l3": None}


def test_left_columns_preserved(spark):
    out = as_of_join(_left(spark), _right(spark), on="key")
    assert out.columns == ["key", "ts", "lval", "right_ts", "right_rval"]
    assert out.count() == 3
