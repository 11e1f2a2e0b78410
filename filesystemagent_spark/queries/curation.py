"""Training-data curation operators: chunking, splits, packing.

Completes the curation funnel (documents.py) with the three ops every
large-scale pipeline runs after dedup/filtering:

- chunking: fixed windows with overlap → model-sized pieces
  (explode over a generated index — pure JVM, no UDF);
- deterministic train/test split: content-hash bucketing, stable
  across runs/engines/cluster sizes (never random()-per-row, which
  is neither reproducible nor oracle-checkable);
- sequence packing: operators/packing.py applyInPandas FFD.

Chunking and split carry exact DuckDB oracles; packing is a greedy
per-group heuristic (bin ids depend on in-group iteration) so it
registers rows-only with invariants pinned in tests/test_packing.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filesystemagent_spark.catalog import Catalog
from filesystemagent_spark.queries import register

CHUNK_W = 200  # window chars (BPE-free stand-in for a token window)
CHUNK_S = 150  # stride chars → 50-char overlap between chunks
TRAIN_PCT = 90
PACK_BUDGET = 1000


def _chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc → (doc_id, chunk_id, chunk_text): starts at i*stride,
    n = max(1, ceil((len-w)/s)+1) covers every char; short docs give
    exactly one chunk."""
    docs = Catalog(spark, sf_dir).documents
    n_chunks = F.greatest(
        F.lit(1),
        (F.ceil((F.col("n_chars") - CHUNK_W) / float(CHUNK_S)) + 1).cast("int"),
    )
    return (
        docs.withColumn("chunk_id", F.explode(F.sequence(F.lit(0), n_chunks - 1)))
        .select(
            "doc_id",
            "chunk_id",
            F.substring(
                F.col("text"), F.col("chunk_id") * CHUNK_S + 1, CHUNK_W
            ).alias("chunk_text"),
        )
        .withColumn("chunk_len", F.length("chunk_text").cast("long"))
    )


@register(
    "doc_chunks",
    tags=("text", "chunking", "explode"),
    oracle=f"""
SELECT d.doc_id, t.i AS chunk_id,
       substr(d.text, CAST(t.i * {CHUNK_S} + 1 AS INT), {CHUNK_W}) AS chunk_text,
       length(substr(d.text, CAST(t.i * {CHUNK_S} + 1 AS INT), {CHUNK_W})) AS chunk_len
FROM documents d,
     UNNEST(generate_series(0,
        GREATEST(1, CAST(CEIL((d.n_chars - {CHUNK_W}) / {CHUNK_S}.0) AS BIGINT) + 1) - 1
     )) AS t(i)
ORDER BY doc_id, chunk_id
""",
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking as a generated-sequence explode: the
    chunk index materializes per row on the executors (no UDF, no
    shuffle — chunking is map-side and scales with input bytes)."""
    return _chunks(spark, sf_dir).orderBy("doc_id", "chunk_id")


@register(
    "doc_train_test_split",
    tags=("split", "hash", "agg"),
    oracle=f"""
WITH bucketed AS (
    SELECT lang,
           n_chars,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
             % 100 AS bucket
    FROM documents
)
SELECT CASE WHEN bucket < {TRAIN_PCT} THEN 'train' ELSE 'test' END AS split,
       lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM bucketed
GROUP BY split, lang
ORDER BY split, lang
""",
)
def doc_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/10 split: md5(doc_id) → 32-bit bucket % 100.

    Hash-bucketing (never per-row random) keeps the split stable under
    re-runs, repartitioning, and engine changes — the property that
    lets eval sets stay uncontaminated as the corpus grows. The oracle
    computes the identical md5 bucket in DuckDB.
    """
    docs = Catalog(spark, sf_dir).documents
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    return (
        docs.withColumn(
            "split", F.when(bucket < TRAIN_PCT, "train").otherwise("test")
        )
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("split", "lang")
    )


@register(
    "doc_pack_stats",
    tags=("packing", "applyInPandas", "approx"),
)
def doc_pack_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk → FFD bins of PACK_BUDGET chars, grouped per source doc
    shard; reports bins and fill factor per group. Greedy bin ids are
    heuristic (rows-only); hard invariants live in tests/test_packing.py.
    """
    from filesystemagent_spark.operators.packing import pack_first_fit

    docs = Catalog(spark, sf_dir).documents.select("doc_id", "source")
    chunks = _chunks(spark, sf_dir).join(docs, "doc_id")
    packed = pack_first_fit(
        chunks, "source", "chunk_len", PACK_BUDGET, ["doc_id", "chunk_id"]
    )
    return (
        packed.groupBy("source")
        .agg(
            F.count("*").alias("n_chunks"),
            (F.max("bin_id") + 1).alias("n_bins"),
            (
                F.sum("size").cast("double")
                / ((F.max("bin_id") + 1) * PACK_BUDGET)
            ).alias("fill_factor"),
        )
        .orderBy("source")
    )


# Per-source sampling rates for corpus composition. Unlisted sources
# fall back to DEFAULT_RATE. Rates are fractions in [0,1].
MIXTURE_RATES = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.1}
DEFAULT_RATE = 0.75


def _sql_rate_case() -> str:
    arms = "\n         ".join(
        f"WHEN source = '{s}' THEN {r}" for s, r in sorted(MIXTURE_RATES.items())
    )
    return f"CASE {arms} ELSE {DEFAULT_RATE} END"


@register(
    "doc_mixture_sample",
    tags=("sampling", "mixture", "hash"),
    oracle=f"""
WITH rated AS (
    SELECT source,
           n_chars,
           {_sql_rate_case()} AS rate,
           CAST(('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
             % 10000 AS bucket
    FROM documents
)
SELECT source,
       COUNT(*) AS n_total,
       CAST(COUNT(CASE WHEN bucket < rate * 10000 THEN 1 END) AS BIGINT) AS n_sampled,
       CAST(SUM(CASE WHEN bucket < rate * 10000 THEN n_chars END) AS BIGINT) AS sampled_chars
FROM rated
GROUP BY source
ORDER BY source
""",
)
def doc_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source mixture sampling (corpus composition).

    Each source gets an independent keep-rate applied via a salted
    md5 bucket of the doc id — like `sampleBy`, but reproducible
    across runs, engines, and partitionings (`sampleBy` draws from a
    per-partition RNG stream, so its sample changes whenever layout
    does; hash sampling never moves). The salt ('mix:') decorrelates
    this decision from the train/test split buckets.
    """
    docs = Catalog(spark, sf_dir).documents
    rate = F.lit(DEFAULT_RATE)
    for s, r in sorted(MIXTURE_RATES.items()):
        rate = F.when(F.col("source") == s, F.lit(r)).otherwise(rate)
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % 10000
    )
    keep = bucket < (rate * 10000)
    return (
        docs.withColumn("keep", keep)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_total"),
            F.count_if(F.col("keep")).alias("n_sampled"),
            F.sum(F.when(F.col("keep"), F.col("n_chars"))).cast("long").alias("sampled_chars"),
        )
        .orderBy("source")
    )


@register(
    "doc_weighted_sample",
    tags=("sampling", "importance", "hash"),
    oracle="""
WITH mx AS (SELECT MAX(n_chars) AS max_chars FROM documents),
rated AS (
    SELECT d.source, d.n_chars,
           sqrt(d.n_chars / mx.max_chars) AS rate,
           CAST(('0x' || substr(md5('imp:' || CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
             % 1000000 AS bucket
    FROM documents d, mx
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(COUNT(CASE WHEN bucket < rate * 1000000.0 THEN 1 END) AS BIGINT)
           AS n_kept,
       CAST(SUM(CASE WHEN bucket < rate * 1000000.0 THEN n_chars END) AS BIGINT)
           AS kept_chars
FROM rated
GROUP BY source
ORDER BY source
""",
)
def doc_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance resampling with a per-document keep-probability
    (temperature-flattened quality weight, here sqrt(n_chars/max)):
    the corpus-composition op behind quality-weighted training mixes.

    Per-row acceptance is a salted md5 bucket compared against the
    weight — deterministic and layout-independent, unlike rand()-gated
    sampling whose accepted set changes with partitioning. The corpus
    max is a 1-row aggregate broadcast into the scan (no shuffle of
    the documents themselves: plan is scan → cross-broadcast → agg).
    sqrt is IEEE-correctly-rounded so both engines accept identical
    rows; the salt ('imp:') decorrelates from split/mixture buckets.
    """
    docs = Catalog(spark, sf_dir).documents
    mx = docs.agg(F.max("n_chars").alias("max_chars"))
    rate = F.sqrt(F.col("n_chars") / F.col("max_chars"))
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("imp:"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 1000000
    )
    keep = bucket < (rate * 1000000.0)
    return (
        docs.crossJoin(F.broadcast(mx))
        .withColumn("keep", keep)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_total"),
            F.count_if(F.col("keep")).alias("n_kept"),
            F.sum(F.when(F.col("keep"), F.col("n_chars")))
            .cast("long")
            .alias("kept_chars"),
        )
        .orderBy("source")
    )


N_ORDER_SHARDS = 16
ORDER_HEAD = 5


@register(
    "doc_training_order",
    tags=("shuffle", "ordering", "hash", "window"),
    oracle=f"""
WITH keyed AS (
    SELECT doc_id,
           md5('ord:42:' || CAST(doc_id AS VARCHAR)) AS ord_key,
           CAST(('0x' || substr(md5('ord:42:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
             % {N_ORDER_SHARDS} AS shard
    FROM documents
),
pos AS (
    SELECT shard, doc_id,
           ROW_NUMBER() OVER (PARTITION BY shard ORDER BY ord_key, doc_id)
               AS pos
    FROM keyed
)
SELECT shard, CAST(pos AS BIGINT) AS pos, doc_id
FROM pos
WHERE pos <= {ORDER_HEAD}
ORDER BY shard, pos
""",
)
def doc_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for one training epoch, shaped for
    scale: a single ROW_NUMBER over the whole corpus would serialize
    into one partition, so the order is two-level — md5 of the seeded
    doc key picks a shard (major order), the full hash orders rows
    WITHIN each shard (minor order), and per-shard positions come from
    a window partitioned by shard (all shards number in parallel).
    Readers consume shard 0..N-1 in sequence; (shard, pos) is a total
    order that never moves a row when the corpus is repartitioned or
    the engine changes. Emits the head of each shard's reading order.
    """
    docs = Catalog(spark, sf_dir).documents
    from pyspark.sql import Window

    ord_key = F.md5(F.concat(F.lit("ord:42:"), F.col("doc_id").cast("string")))
    keyed = docs.select(
        "doc_id",
        ord_key.alias("ord_key"),
        (F.conv(F.substring(ord_key, 1, 8), 16, 10).cast("long") % N_ORDER_SHARDS).alias(
            "shard"
        ),
    )
    w = Window.partitionBy("shard").orderBy("ord_key", "doc_id")
    return (
        keyed.withColumn("pos", F.row_number().over(w).cast("long"))
        .where(F.col("pos") <= ORDER_HEAD)
        .select("shard", "pos", "doc_id")
        .orderBy("shard", "pos")
    )


@register(
    "doc_sentences_udtf",
    tags=("udtf", "lateral", "text"),
    oracle="""
WITH split AS (
    SELECT doc_id, regexp_split_to_array(text, '\\.\\s+') AS sents
    FROM documents
)
SELECT s.doc_id,
       CAST(t.i AS INTEGER) AS sent_id,
       s.sents[t.i + 1] AS sentence,
       CAST(length(s.sents[t.i + 1]) AS INTEGER) AS sent_chars
FROM split s, UNNEST(generate_series(0, len(s.sents) - 1)) AS t(i)
ORDER BY doc_id, sent_id
""",
)
def doc_sentences_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF via LATERAL join — the table-generating UDF surface
    (absent from the reference, SURVEY §2.9). The split regex is
    RE2-safe so DuckDB's regexp_split_to_array reproduces the rows
    exactly: a UDTF gate query that is still value-hash-checkable.
    Per-row Python is the slow path by design — doc_chunks shows the
    JVM explode form for scale."""
    from filesystemagent_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    Catalog(spark, sf_dir).documents.createOrReplaceTempView("_docs_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, s.sent_id, s.sentence, s.sent_chars
        FROM _docs_udtf d, LATERAL split_sentences(d.text) s
        ORDER BY d.doc_id, s.sent_id
        """
    )


_PROFILE_COLS = ("doc_id", "text", "lang", "source", "n_chars")


@register(
    "doc_column_profile",
    tags=("profiling", "agg", "unpivot"),
    oracle="\nUNION ALL\n".join(
        f"""SELECT '{c}' AS column_name,
       CAST(COUNT({c}) AS BIGINT) AS n_nonnull,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(MIN(LENGTH(CAST({c} AS VARCHAR))) AS BIGINT) AS min_len,
       CAST(MAX(LENGTH(CAST({c} AS VARCHAR))) AS BIGINT) AS max_len
FROM documents"""
        for c in _PROFILE_COLS
    )
    + "\nORDER BY column_name",
)
def doc_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-table column profiler — the data-quality sweep a pipeline
    runs before training ingestion (null counts, cardinalities,
    value-length envelope per column). ONE scan computes every
    column's stats as parallel aggregates, then `stack` unpivots the
    1-row result into (column, stats) rows: no per-column re-scans.
    The exact COUNT(DISTINCT)s expand the single pass into a multi-way
    shuffle; at 100 TB swap them for approx_count_distinct (2% HLL) —
    the sketch family already in queries/sketches.py."""
    docs = Catalog(spark, sf_dir).documents
    aggs = []
    for c in _PROFILE_COLS:
        ln = F.length(F.col(c).cast("string"))
        aggs += [
            F.count(F.col(c)).alias(f"n_{c}"),
            F.countDistinct(F.col(c)).alias(f"d_{c}"),
            F.min(ln).cast("long").alias(f"mn_{c}"),
            F.max(ln).cast("long").alias(f"mx_{c}"),
        ]
    wide = docs.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', n_{c}, d_{c}, mn_{c}, mx_{c}" for c in _PROFILE_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
            "(column_name, n_nonnull, n_distinct, min_len, max_len)"
        )
    ).orderBy("column_name")


@register(
    "doc_shard_stats",
    tags=("split", "hash", "layout"),
    oracle="""
SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 16
           AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
FROM documents
GROUP BY shard
ORDER BY shard
""",
)
def doc_shard_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-assignment profile for training export (the query behind
    `sources/layout.write_sharded`): md5-deterministic shard ids, so
    membership survives re-runs and engine swaps (Spark's internal
    hashpartitioning would not be reproducible outside Spark). The
    size histogram per shard is the skew check a 100 TB export runs
    BEFORE writing — md5 uniformity keeps shards balanced without a
    post-hoc rebalance pass."""
    docs = Catalog(spark, sf_dir).documents
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 16
    )
    return (
        docs.groupBy(shard.alias("shard"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .orderBy("shard")
    )
