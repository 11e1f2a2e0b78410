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


class TestRangeJoin:
    def _frames(self, spark):
        left = spark.createDataFrame(
            [("k1", _ts("2026-01-01 10:00:00"), "e1"),
             ("k1", _ts("2026-01-01 12:00:00"), "e2"),
             ("k2", _ts("2026-01-01 10:00:00"), "e3")],
            "key string, ts timestamp, lid string",
        )
        right = spark.createDataFrame(
            [("k1", _ts("2026-01-01 09:58:00"), "r1"),   # 120s before e1
             ("k1", _ts("2026-01-01 10:04:59"), "r2"),   # 299s after e1
             ("k1", _ts("2026-01-01 10:05:01"), "r3"),   # 301s after e1
             ("k2", _ts("2026-01-01 11:00:00"), "r4")],  # far from e3
            "key string, ts timestamp, rid string",
        )
        return left, right

    def test_inner_within_gap(self, spark):
        from filesystemagent_spark.operators.temporal import range_join

        left, right = self._frames(spark)
        got = {
            (r["lid"], r["right_rid"])
            for r in range_join(
                left, right, on="key", max_gap_seconds=300.0
            ).collect()
        }
        assert got == {("e1", "r1"), ("e1", "r2")}

    def test_left_keeps_unmatched(self, spark):
        from filesystemagent_spark.operators.temporal import range_join

        left, right = self._frames(spark)
        rows = range_join(left, right, on="key", max_gap_seconds=300.0, how="left").collect()
        by_lid = {}
        for r in rows:
            by_lid.setdefault(r["lid"], set()).add(r["right_rid"])
        assert by_lid == {"e1": {"r1", "r2"}, "e2": {None}, "e3": {None}}

    def test_matches_naive_join(self, spark):
        """Binned implementation == naive inequality join on random-ish
        data (the differential oracle for bin-boundary bugs)."""
        from pyspark.sql import functions as F

        from filesystemagent_spark.operators.temporal import range_join

        left = spark.range(0, 200).selectExpr(
            "cast(id % 5 as string) as key",
            "timestamp_seconds(1700000000 + id * 37) as ts",
            "id as lid",
        )
        right = spark.range(0, 200).selectExpr(
            "cast(id % 5 as string) as key",
            "timestamp_seconds(1700000000 + id * 53 + 11) as ts",
            "id as rid",
        )
        gap = 100.0
        got = range_join(left, right, on="key", max_gap_seconds=gap)
        naive = left.alias("l").join(
            right.alias("r"),
            (F.col("l.key") == F.col("r.key"))
            & (
                F.abs(F.col("l.ts").cast("double") - F.col("r.ts").cast("double"))
                <= gap
            ),
        )
        assert got.count() == naive.count()
        a = {(r["lid"], r["right_rid"]) for r in got.collect()}
        b = {(r["lid"], r["rid"]) for r in naive.collect()}
        assert a == b
