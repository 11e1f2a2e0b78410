"""Accuracy contracts for the sketch queries.

The sketches register without oracles (approximate by design); these
tests pin them to the exact answers within their configured error
bounds, so a regression in sketch wiring (wrong column, wrong rsd,
bad merge) fails loudly rather than drifting.
"""

from __future__ import annotations

import pytest

from filesystemagent_spark.queries import registry

QUERIES = registry()


def _rows_by_key(df, key):
    return {r[key]: r.asDict() for r in df.collect()}


def test_hll_events_within_rsd(spark, sf_dir, duck):
    approx = _rows_by_key(
        QUERIES["events_distinct_users_hll"].fn(spark, sf_dir), "event_type"
    )
    exact = {
        t: n
        for t, n in duck.sql(
            "SELECT event_type, COUNT(DISTINCT user_id) FROM events GROUP BY 1"
        ).fetchall()
    }
    assert set(approx) == set(exact)
    for t, n in exact.items():
        # rsd=0.02 → 3σ bound of 6%; floor of 2 absorbs tiny groups.
        tol = max(2.0, 0.06 * n)
        assert abs(approx[t]["approx_users"] - n) <= tol, (t, approx[t], n)


def test_hll_orders_within_rsd(spark, sf_dir, duck):
    approx = _rows_by_key(
        QUERIES["orders_custkey_hll_by_status"].fn(spark, sf_dir), "o_orderstatus"
    )
    exact = {
        s: n
        for s, n in duck.sql(
            "SELECT o_orderstatus, COUNT(DISTINCT o_custkey) FROM orders GROUP BY 1"
        ).fetchall()
    }
    assert set(approx) == set(exact)
    for s, n in exact.items():
        tol = max(2.0, 0.06 * n)
        assert abs(approx[s]["approx_customers"] - n) <= tol, (s, approx[s], n)


@pytest.mark.parametrize("col,q", [("p50", 0.5), ("p90", 0.9), ("p99", 0.99)])
def test_quantile_sketch_rank_accuracy(spark, sf_dir, duck, col, q):
    """The sketch's value must sit within ±1% RANK of the requested
    quantile (value-space checks are meaningless for skewed data)."""
    approx = _rows_by_key(
        QUERIES["events_value_quantile_sketch"].fn(spark, sf_dir), "event_type"
    )
    eps = 0.01
    for t, row in approx.items():
        lo, hi = max(0.0, q - eps), min(1.0, q + eps)
        bounds = duck.sql(
            f"""
            SELECT quantile_cont(value, {lo}), quantile_cont(value, {hi})
            FROM events WHERE event_type = '{t}' AND value IS NOT NULL
            """
        ).fetchall()[0]
        assert bounds[0] <= row[col] <= bounds[1], (t, col, row[col], bounds)


def test_hll_daily_rollup_merge_accuracy(spark, sf_dir, duck):
    """The hourly-sketch → daily-union rollup must estimate daily
    distinct users within the DataSketches HLL error envelope
    (lgConfigK=14 → rse ≈ 1.04/√2¹⁴ ≈ 0.8%; 3σ ≈ 2.5%), proving the
    union actually merges sketch state rather than double-counting."""
    approx = _rows_by_key(
        QUERIES["events_daily_users_hll_rollup"].fn(spark, sf_dir), "day"
    )
    exact = {
        d: n
        for d, n in duck.sql(
            "SELECT STRFTIME(date_trunc('day', ts), '%Y-%m-%d'),"
            " COUNT(DISTINCT user_id) FROM events GROUP BY 1"
        ).fetchall()
    }
    assert set(approx) == set(exact)
    for d, n in exact.items():
        tol = max(2.0, 0.025 * n)
        assert abs(approx[d]["approx_users"] - n) <= tol, (d, approx[d], n)


def test_rolling_users_hll_tracks_exact(spark, sf_dir, duck):
    """The HLL rolling-window twin must stay within 3 sigma of the
    exact trailing-7-day distinct counts on every day."""
    from filesystemagent_spark.queries import registry

    approx = {
        r.day: r.approx_users_7d
        for r in registry()["events_rolling_users_hll"].fn(spark, sf_dir).collect()
    }
    exact = {
        r[0]: r[1]
        for r in duck.sql(
            registry()["events_rolling_distinct_users"].oracle
        ).fetchall()
    }
    assert set(approx) == set(exact)
    # default lgConfigK=12 → rsd ~1.6%; 3 sigma with a small floor for
    # tiny counts
    for day, est in approx.items():
        tol = max(3 * 0.016 * exact[day], 2.0)
        assert abs(est - exact[day]) <= tol, (day, est, exact[day])
