"""Every registered query with an oracle must hash-match DuckDB —
a local mirror of the driver's CORRECTNESS gate (t2), run at the
smallest SF for speed."""

from __future__ import annotations

import pytest

from filesystemagent_spark.queries import registry
from tests.oracle_utils import SHARED_PLANS, compare, formatted_plan

QUERIES = registry()
ORACLE_NAMES = sorted(n for n, q in QUERIES.items() if q.oracle is not None)
ROWS_ONLY_NAMES = sorted(n for n, q in QUERIES.items() if q.oracle is None)

# Spark-side row count per query, recorded by the parity run that
# already fully materializes every result (compare() goes through
# toPandas). The vacuity test below reads it instead of re-running the
# whole query — for the lifecycle/sink queries a second fn() replays
# the entire DML pipeline, which doubled this module's wall time
# (measured 233 s of pure duplication at sf0.001). Test-session-local
# bookkeeping only: the engine under test caches nothing across runs.
_PARITY_SPARK_ROWS: dict[str, int] = {}


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(name, spark, sf_dir, duck):
    q = QUERIES[name]
    sdf = q.fn(spark, sf_dir)
    SHARED_PLANS[name] = formatted_plan(sdf)  # for test_plans' registry scan
    rel = duck.sql(q.oracle)
    ok, msg, n_spark = compare(sdf, rel)
    _PARITY_SPARK_ROWS[name] = n_spark
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_queries_run(name, spark, sf_dir):
    """Approximate operators at least execute and return a stable schema."""
    q = QUERIES[name]
    df = q.fn(spark, sf_dir)
    SHARED_PLANS[name] = formatted_plan(df)  # for test_plans' registry scan
    assert df.columns, name
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_graded_window_is_curated():
    """The round driver evaluates only the first 50 registry entries;
    that window must stay all-oracle and contain every bench headliner
    plus the streaming gates (adding a query without placing it in
    GRADE_ORDER silently pushes something important out)."""
    names = list(QUERIES)
    window = names[:50]
    missing_oracle = [n for n in window if QUERIES[n].oracle is None]
    assert not missing_oracle, f"rows-only in graded window: {missing_oracle}"
    headliners = {n for n, q in QUERIES.items() if q.headline}
    # Round 10: the bench headliner SET stays fixed (the 10.4–13.5s
    # series band is only comparable across rounds on a stable set),
    # but two headliners' graded slots rotated to their
    # maintained/stored successors, whose oracles REPLAY the displaced
    # pipelines over a DML-replayed corpus. A headliner outside the
    # window must be one of those named displacements, and every
    # headliner must stay oracle-backed (driver_sim checks the full
    # registry each round, so they remain value-hashed — just not in
    # the driver's graded 50).
    displaced_headliners = {
        "doc_minhash_pairs_checkable",  # → doc_minhash_incremental_index
        "doc_minhash_incremental",      # → doc_minhash_incremental_stored
    }
    out_of_window = headliners - set(window)
    assert out_of_window <= displaced_headliners, out_of_window
    assert all(QUERIES[n].oracle is not None for n in headliners)
    gates = {"events_stream_tumbling", "events_stream_sessions",
             "events_stream_late_accounting"}
    assert gates <= set(window)
    # round-7 rotation: the storage flagships hold graded slots
    assert {"events_txtable_mor_dml", "events_txtable_incremental_join"} <= set(
        window
    )
    # round-8 rotation: UPDATE lifecycle and the bidirectional join
    # view hold graded slots
    assert {
        "events_txtable_update_dml",
        "events_txtable_bidirectional_join",
    } <= set(window)
    # round-9 rotation: incremental BM25 index maintenance, the
    # container-invariance video dedup, and the FULL OUTER stream-stream
    # interval-join gate hold graded slots (displacing doc_bm25_search,
    # doc_gif_video_dedup, events_stream_interval_join_outer)
    assert {
        "doc_bm25_incremental_index",
        "doc_mkv_video_dedup",
        "events_stream_interval_join_full",
    } <= set(window)
    # round-10 rotation: the maintained LSH band index and the
    # stats-pruned stored-index batch dedup hold graded slots
    # (displacing doc_minhash_pairs_checkable and
    # doc_minhash_incremental, whose pipelines both oracles replay)
    assert {
        "doc_minhash_incremental_index",
        "doc_minhash_incremental_stored",
    } <= set(window)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_queries_are_not_vacuous(name, spark, sf_dir):
    """A query whose Spark AND oracle sides both return zero rows
    'matches' while proving nothing — three anti-join queries shipped
    that way (every customer has orders; every user spans both diff
    windows). Every oracle-checked query must return at least one row
    at every test SF. Checked on the SAME materialized result the
    parity test hashed (re-running fn() replayed every DML/sink
    lifecycle a second time for a row-count — 233 s of duplicated
    work); the fallback executes only under -k selections that skip
    the parity run."""
    n = _PARITY_SPARK_ROWS.get(name)
    if n is None:  # parity didn't run in this session — execute fresh
        n = QUERIES[name].fn(spark, sf_dir).limit(1).count()
    assert n >= 1, f"{name} returns 0 rows — vacuous oracle match"
