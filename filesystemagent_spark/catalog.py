"""Table catalog over a directory of parquet tables.

The reference keeps its catalog in SQLite
(/root/reference/src/file_indexing_system.py:35-56); here the catalog
is just schema-on-read parquet — the layout that scales to 100 TB
(partition pruning + column pruning + predicate pushdown all reach the
scan). Tables are cached DataFrame handles, not materialized data.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as ST

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
)
EXTRA_TABLES = ("events", "documents", "embeddings")
ALL_TABLES = TPCH_TABLES + EXTRA_TABLES

# Tables whose parquet timestamps are NANOS-precision (see table()).
_NANO_TS_COLS = {"events": ("ts",)}

# Dimension tables small enough to broadcast at any realistic scale
# factor (region=5 rows, nation=25 at every SF; supplier/part grow
# sub-linearly vs lineitem). Fact tables must never be broadcast.
BROADCAST_DIMS = frozenset({"region", "nation", "supplier", "part"})


# Plan-handle memo shared by every Catalog instance of one session:
# each query call builds a fresh Catalog, and a cold `read.parquet` is
# 2-3 py4j round trips plus a JVM analysis pass per table (measured
# 0.1-0.5 s each) repeated for every table of every run. The memo
# holds lazy DataFrame HANDLES only — no rows, no results: every
# execution still scans the parquet from disk (the fixture dirs are
# immutable per sf_dir). Keyed weakly by session so a stopped/replaced
# session drops its entries instead of serving dead JVM references.
from weakref import WeakKeyDictionary

_HANDLES: "WeakKeyDictionary[SparkSession, dict[tuple[str, str, int], DataFrame]]" = (
    WeakKeyDictionary()
)


class Catalog:
    """Lazy handle set over ``{sf_dir}/{table}.parquet``."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        self._cache = _HANDLES.setdefault(spark, {})
        # Deterministic timestamp rendering even under a caller-provided
        # session (the driver builds its own): parquet timestamps are
        # naive, so formatting must not shift with a local timezone.
        spark.conf.set("spark.sql.session.timeZone", "UTC")

    def table(self, name: str) -> DataFrame:
        path = os.path.join(self.sf_dir, f"{name}.parquet")
        # Freshness guard in the key (not just (sf_dir, name)): Spark
        # snapshots the file listing at read.parquet time, so a table
        # file regenerated in-process would otherwise be served from a
        # stale handle (FileNotFound or old listing). stat() is one
        # syscall — noise next to the 0.1-0.5 s analysis pass the memo
        # saves — and mirrors the footer-cache keying in txtable.py.
        try:
            mtime = os.stat(path).st_mtime_ns
        except OSError:
            mtime = -1
        key = (self.sf_dir, name, mtime)
        if key not in self._cache:
            if name in _NANO_TS_COLS:
                # Parquet TIMESTAMP(NANOS) is unreadable by Spark's
                # native reader; ingest as int64 nanos and truncate to
                # microsecond timestamps (integer div — these values
                # exceed double precision). Runtime-settable, so this
                # also works under a driver-provided session.
                self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
                df = self.spark.read.parquet(path)
                for col in _NANO_TS_COLS[name]:
                    if isinstance(df.schema[col].dataType, ST.LongType):
                        df = df.withColumn(
                            col, F.timestamp_micros(F.expr(f"{col} div 1000"))
                        )
            else:
                df = self.spark.read.parquet(path)
            self._cache[key] = self._normalize_ts(df)
        return self._cache[key]

    @staticmethod
    def _normalize_ts(df: DataFrame) -> DataFrame:
        """Pin every timestamp-like column to TIMESTAMP_NTZ. Pandas-
        written parquet (isAdjustedToUTC=false) reads as NTZ under
        Spark 4 defaults but as LTZ when `inferTimestampNTZ` is off —
        the cast (identity under the UTC session tz set above) makes
        query semantics and output schemas independent of the reader
        config of whatever session the driver hands us. DATE columns
        are widened the same way: the driver regenerates testdata
        between rounds and has already changed temporal physical types
        once (NANOS→micros), so a DATE l_shipdate must not change any
        query's comparison or formatting behavior."""
        ts_cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ST.TimestampType, ST.DateType))
        ]
        for c in ts_cols:
            df = df.withColumn(c, F.col(c).cast("timestamp_ntz"))
        return df

    def __getattr__(self, name: str) -> DataFrame:
        if name in ALL_TABLES:
            return self.table(name)
        raise AttributeError(name)

    def register_views(self, tables: tuple[str, ...] = ALL_TABLES) -> None:
        """Expose tables as temp views for the SQL surface."""
        for name in tables:
            self.table(name).createOrReplaceTempView(name)
