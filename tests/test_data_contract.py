"""Early-warning contract on the driver's testdata: the generator has
changed physical types between rounds before (TIMESTAMP(NANOS) →
naive µs), silently breaking type-sensitive operators. This test fails
loudly at round start if a table is missing expected columns or a
timestamp column stops normalizing, instead of letting 40 queries
discover it one stack trace at a time."""

from __future__ import annotations

import pytest
from pyspark.sql import types as ST

from filesystemagent_spark.catalog import ALL_TABLES, Catalog

EXPECTED_COLS = {
    "region": {"r_regionkey", "r_name"},
    "nation": {"n_nationkey", "n_name", "n_regionkey"},
    "customer": {"c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"},
    "supplier": {"s_suppkey", "s_name", "s_nationkey"},
    "part": {"p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"},
    "orders": {"o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
               "o_orderdate", "o_orderpriority"},
    "lineitem": {"l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                 "l_extendedprice", "l_discount", "l_returnflag", "l_linestatus",
                 "l_shipdate"},
    "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
    "documents": {"doc_id", "text", "lang", "source", "n_chars"},
    "embeddings": {"vec_id", "embedding", "label"},
}

TS_COLS = {"events": ["ts"], "orders": ["o_orderdate"], "lineitem": ["l_shipdate"]}


@pytest.mark.parametrize("table", ALL_TABLES)
def test_table_contract(spark, sf_dir, table):
    df = Catalog(spark, sf_dir).table(table)
    missing = EXPECTED_COLS[table] - set(df.columns)
    assert not missing, f"{table} lost columns {missing} — testdata regenerated?"
    for c in TS_COLS.get(table, []):
        # whatever the parquet physical type, the catalog must surface NTZ
        assert isinstance(df.schema[c].dataType, ST.TimestampNTZType), (
            table, c, df.schema[c].dataType,
        )
    assert df.limit(1).count() == 1, f"{table} is empty"


def test_embedding_is_numeric_array(spark, sf_dir):
    df = Catalog(spark, sf_dir).embeddings
    dt = df.schema["embedding"].dataType
    assert isinstance(dt, ST.ArrayType) and isinstance(
        dt.elementType, (ST.FloatType, ST.DoubleType)
    ), dt


@pytest.mark.parametrize(
    "qname", ["events_sessions", "events_rollup_reagg", "events_asof_prior_view"]
)
def test_ts_queries_survive_ltz_reader(spark, sf_dir, qname):
    """Round-1 regression class: the driver's reader config flipped
    parquet timestamps between LTZ and NTZ and every raw epoch
    expression (`unix_micros`, `cast(double)`) broke. The epoch-math
    queries must produce IDENTICAL output under both reader modes —
    proving `Catalog._normalize_ts` + `functions/tscompat` make query
    semantics reader-config-independent."""
    from filesystemagent_spark.queries import registry

    fn = registry()[qname].fn
    key = "spark.sql.parquet.inferTimestampNTZ.enabled"
    prev = spark.conf.get(key)
    ntz_rows = fn(spark, sf_dir).collect()
    try:
        spark.conf.set(key, "false")
        ltz_rows = fn(spark, sf_dir).collect()
    finally:
        spark.conf.set(key, prev)
    assert ntz_rows == ltz_rows


def test_catalog_normalizes_date_columns(spark, tmp_path):
    """The driver has changed temporal physical types between rounds
    (NANOS → naive micros); if a round ships DATE columns, Catalog
    must widen them to TIMESTAMP_NTZ so every query's comparisons and
    date_format outputs behave exactly as today."""
    from pyspark.sql import functions as F

    from filesystemagent_spark.catalog import Catalog

    sf = tmp_path / "sfdate"
    sf.mkdir()
    spark.createDataFrame(
        [(1, "1997-03-05")], "o_orderkey bigint, o_orderdate string"
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("date")).write.parquet(
        str(sf / "orders.parquet")
    )
    df = Catalog(spark, str(sf)).orders
    assert dict(df.dtypes)["o_orderdate"] == "timestamp_ntz"
    got = df.select(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"),
        (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")).alias(
            "lt"
        ),
    ).first()
    assert got.d == "1997-03-05" and got.lt is True
