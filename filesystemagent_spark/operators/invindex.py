"""Stored inverted index for lexical retrieval (BM25 over TxTable).

The 100 TB retrieval shape: tokenize the corpus ONCE into a posting
table (term, doc_id, tf, dl) plus a per-term document-frequency table,
persist both in the transactional table format, and answer every
query from the index — the corpus text is never rescanned. This is
the lexical mirror of the incremental-dedup story
(operators/dedup.minhash_band_index): a derived, storable,
incrementally-maintainable artifact replaces recomputation.

Scale shape of the query path: each query term is a stats-pruned
`TxTable.read(where=[("term", "=", t)])` — the postings are written
range-partitioned and sorted on term, so the manifest's per-file
min/max prunes non-matching files BEFORE Spark plans the scan (and
parquet row-group stats prune inside the survivors). The per-term
frequency lookups broadcast. Nothing in the query path is
proportional to corpus size except the postings actually read.

Exact-float contract: the per-(term, doc) BM25 part is computed
row-locally with the same IEEE expression as the full-scan scorer
(queries/documents._bm25_scored), and parts combine in FIXED term
order (a pivot + literal-ordered addition, NOT a grouped float sum,
whose order is nondeterministic at 3+ terms) — so index-answered
scores are bit-identical to the full scan and the same DuckDB oracle
replays them.

Reference parity: the reference greps files per query
(/root/reference/src — content search is a full scan per call); an
inverted index is what that becomes at engine scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filesystemagent_spark.sources.txtable import TxTable


def build_bm25_index(
    docs: DataFrame,
    index_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_term_partitions: int = 8,
) -> tuple[TxTable, TxTable]:
    """Tokenize once and persist (postings, term_df) TxTables under
    `index_dir`. Postings are range-partitioned AND sorted on term so
    every file covers a tight term range (manifest stats skipping does
    the rest at query time). Corpus scalars (n_docs, avgdl) ride the
    postings table's app metadata — they are the model, two doubles.
    Returns the two opened tables."""
    from filesystemagent_spark.caching import track_persist
    from filesystemagent_spark.functions import text as T

    # persisted: the scalars agg AND the postings write both consume it
    # — without the persist the tokenizer (the dominant cost of an index
    # build) runs over the whole corpus twice
    toks = track_persist(
        docs.select(
            F.col(id_col).alias("doc_id"), T.tokens(F.col(text_col)).alias("tk")
        )
    )
    scalars = toks.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg(F.size("tk").cast("double")).alias("avgdl"),
    ).collect()[0]
    postings = (
        toks.select(
            "doc_id",
            F.size("tk").cast("double").alias("dl"),
            F.explode("tk").alias("term"),
        )
        .groupBy("term", "doc_id", "dl")
        .agg(F.count("*").cast("double").alias("tf"))
        .repartitionByRange(n_term_partitions, "term")
        .sortWithinPartitions("term", "doc_id")
    )
    post_t = TxTable(os.path.join(index_dir, "postings"))
    post_t.init(
        postings,
        app={"n_docs": float(scalars["n_docs"]), "avgdl": float(scalars["avgdl"])},
    )
    toks.unpersist()
    # df(term) = posting rows per term (postings are (term, doc) grain)
    term_t = TxTable(os.path.join(index_dir, "terms"))
    term_t.init(
        post_t.read(docs.sparkSession)
        .groupBy("term")
        .agg(F.count("*").cast("double").alias("df"))
        .repartitionByRange(n_term_partitions, "term")
        .sortWithinPartitions("term")
    )
    return post_t, term_t


def bm25_from_index(
    spark: SparkSession,
    index_dir: str,
    terms: tuple[str, ...],
    *,
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> DataFrame:
    """Answer a BM25 top-k from the stored index: one stats-pruned
    postings read per query term, per-term frequencies broadcast, the
    per-(term, doc) part computed row-locally, parts pivoted and added
    in FIXED term order (bit-identical to the full-scan scorer). The
    corpus text is never touched."""
    post_t = TxTable(os.path.join(index_dir, "postings"))
    term_t = TxTable(os.path.join(index_dir, "terms"))
    # corpus scalars ride commit app metadata; maintenance commits that
    # don't refresh them (compact, vacuum-era merges) publish their own
    # app, so walk back to the newest commit that carries them
    n_docs_v = post_t.latest_app_value("n_docs")
    avgdl_v = post_t.latest_app_value("avgdl")
    if n_docs_v is None or avgdl_v is None:
        raise ValueError(f"no corpus scalars recorded in {index_dir}/postings")
    n_docs, avgdl = float(n_docs_v), float(avgdl_v)

    dfs = {
        r["term"]: float(r["df"])
        for t in terms
        for r in term_t.read(spark, where=[("term", "=", t)]).collect()
    }
    matched = None
    for t in terms:
        part = post_t.read(spark, where=[("term", "=", t)]).select(
            "doc_id", "term", "tf", "dl"
        )
        matched = part if matched is None else matched.unionByName(part)

    def part_expr(i: int, t: str):
        df_t = dfs.get(t, 0.0)
        if df_t == 0.0:
            return F.lit(0.0)
        # ln through the JVM (F.log), not python's libm: the full-scan
        # scorer computes it JVM-side, and libm builds differ by ulps.
        # The argument is pre-folded driver-side with the exact IEEE op
        # sequence the scorer uses, so the ln input is bit-identical.
        idf = F.log(F.lit((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0))
        tfd = F.col(f"tf_{i}")
        return idf * (tfd * (k1 + 1.0)) / (
            tfd + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))
        )

    # pivot columns are aliased by term INDEX, not term text: a term
    # containing '.', ' ', or '`' would otherwise break F.col parsing
    # (dots parse as struct access). The term→index map stays driver-side.
    pivoted = matched.groupBy("doc_id").agg(
        F.max("dl").alias("dl"),  # dl is per-doc constant
        *[
            F.coalesce(
                F.max(F.when(F.col("term") == t, F.col("tf"))), F.lit(0.0)
            ).alias(f"tf_{i}")
            for i, t in enumerate(terms)
        ],
    )
    score = None
    for i, t in enumerate(terms):  # FIXED order — matches the full scan's fold
        p = part_expr(i, t)
        score = p if score is None else score + p
    return (
        pivoted.select("doc_id", F.round(score, 6).alias("bm25"))
        .filter(F.col("bm25") > 0)
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(top_k)
    )
