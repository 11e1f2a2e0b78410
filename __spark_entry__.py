"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real surface lives in ``filesystemagent_spark.queries``; this
module just adapts it to the contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from filesystemagent_spark.queries import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from filesystemagent_spark.queries.tpch_like import regional_revenue
    from filesystemagent_spark.session import tune_caller_session

    # The driver hands us a bare session; entry() runs before any other
    # query, so this is the one place the per-process overhead knobs
    # (DataFrame-debugging call-site capture — 3-4 py4j round trips per
    # DataFrame op, cached process-globally on first use) can still be
    # switched off for the whole verify loop.
    tune_caller_session(spark)
    return regional_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; approximate (LSH) operators are
    intentionally omitted → driver records the weaker rows-only check."""
    return {name: q.oracle for name, q in registry().items() if q.oracle is not None}
