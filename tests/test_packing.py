"""Invariants of the FFD sequence packer (greedy → no value oracle;
these pin the properties that make a packing usable for training)."""

from __future__ import annotations

from pyspark.sql import functions as F

from filesystemagent_spark.operators.packing import pack_first_fit

BUDGET = 100


def _chunks(spark):
    rows = [
        ("a", i, 1 + (i * 37) % 90) for i in range(40)
    ] + [("b", i, 5 + (i * 17) % 60) for i in range(25)]
    return spark.createDataFrame(
        [(g, i, i, s) for g, i, s in rows],
        "source string, doc_id long, chunk_id long, sz long",
    )


def test_every_chunk_assigned_once(spark):
    chunks = _chunks(spark)
    packed = pack_first_fit(chunks, "source", "sz", BUDGET)
    assert packed.count() == chunks.count()
    assert (
        packed.groupBy("source", "doc_id", "chunk_id").count().filter("count > 1").count()
        == 0
    )


def test_no_bin_over_budget(spark):
    packed = pack_first_fit(_chunks(spark), "source", "sz", BUDGET)
    over = (
        packed.groupBy("source", "bin_id")
        .agg(F.sum("size").alias("fill"), F.count("*").alias("n"))
        .filter((F.col("fill") > BUDGET) & (F.col("n") > 1))
    )
    assert over.count() == 0, over.collect()


def test_oversize_chunk_gets_own_bin(spark):
    chunks = spark.createDataFrame(
        [("a", 0, 0, 250), ("a", 1, 1, 40), ("a", 2, 2, 50)],
        "source string, doc_id long, chunk_id long, sz long",
    )
    packed = pack_first_fit(chunks, "source", "sz", BUDGET).collect()
    big_bin = next(r.bin_id for r in packed if r.size == 250)
    assert all(r.bin_id != big_bin for r in packed if r.size != 250)


def test_packing_is_deterministic(spark):
    chunks = _chunks(spark).repartition(7)
    a = sorted(map(tuple, pack_first_fit(chunks, "source", "sz", BUDGET).collect()))
    b = sorted(map(tuple, pack_first_fit(chunks.repartition(3), "source", "sz", BUDGET).collect()))
    assert a == b


def test_ffd_fill_is_tight(spark):
    """All bins except possibly one per group are ≥ half full — the
    basic guarantee that packing beats padding."""
    packed = pack_first_fit(_chunks(spark), "source", "sz", BUDGET)
    fills = (
        packed.groupBy("source", "bin_id").agg(F.sum("size").alias("fill")).collect()
    )
    slack = {}
    for r in fills:
        if r.fill < BUDGET / 2:
            slack[r.source] = slack.get(r.source, 0) + 1
    assert all(v <= 1 for v in slack.values()), fills
