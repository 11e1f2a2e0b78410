"""Query registry — the driver-contract surface.

Every implemented operator from SURVEY.md §2 (plus the training-data
pipeline extensions) registers here as a named query:

- ``fn(spark, sf_dir) -> DataFrame``  — the Spark implementation;
- ``oracle``                          — equivalent DuckDB SQL, or None
  for genuinely non-SQL-expressible ops (the driver then records a
  weaker rows-only check);
- ``headline``                        — included in bench.py timing.

Cross-engine hashing rules used throughout (the driver compares
value hashes, so both sides must be bit-identical):
- money/value sums go through DECIMAL(18,6) in BOTH engines (exact
  arithmetic, no float summation-order drift), cast to DOUBLE at the end;
- averages of doubles are rounded (error ~1e-13 « rounding step);
- rankings use exact or rounded keys plus a unique-id tie-break so
  LIMIT/top-k selects identical rows in both engines;
- timestamps are emitted as formatted strings.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None
    headline: bool = False
    tags: tuple[str, ...] = ()


_REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = Query(name, fn, oracle, headline, tags)
        return fn

    return deco


def registry() -> dict[str, Query]:
    """Import all query modules (idempotent) and return the registry."""
    from filesystemagent_spark.queries import (  # noqa: F401
        curation,
        documents,
        embeddings,
        events,
        findings,
        media,
        sketches,
        streaming_gate,
        tpch_deep,
        tpch_like,
    )

    return dict(_REGISTRY)
