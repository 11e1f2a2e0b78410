"""Semantic invariants for the round-2 training-pipeline queries
(queries/training.py) — independent of the oracle-parity hash check,
these pin the properties the SQL mirror can't state (monotonicity,
bounds, split discipline)."""

from __future__ import annotations

from filesystemagent_spark.queries import registry
from filesystemagent_spark.queries.training import TRAIN_PCT, _split_col

QUERIES = registry()


def test_repetition_bounds(spark, sf_dir):
    rows = QUERIES["doc_repetition_stats"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_distinct_tokens <= r.n_tokens
        assert 0 <= r.n_distinct_2grams <= r.n_2grams
        assert 0.0 <= r.dup_token_ratio <= 1.0
        assert 0.0 <= r.dup_2gram_ratio <= 1.0
        # n tokens produce n-1 bigrams (or 0 for degenerate docs)
        assert r.n_2grams in (0, r.n_tokens - 1)


def test_funnel_is_monotone_nonincreasing(spark, sf_dir):
    rows = (
        QUERIES["events_funnel"].fn(spark, sf_dir)
        .orderBy("stage_order")
        .collect()
    )
    assert [r.stage for r in rows] == ["signup", "view", "click", "purchase"]
    counts = [r.n_users for r in rows]
    assert counts == sorted(counts, reverse=True), counts
    assert all(0.0 <= r.conversion_from_prev <= 1.0 for r in rows[1:])
    assert rows[0].conversion_from_first == 1.0 or rows[0].n_users == 0


def test_retention_day_zero_covers_every_user(spark, sf_dir):
    from filesystemagent_spark.catalog import Catalog

    ret = QUERIES["events_retention"].fn(spark, sf_dir)
    day0 = ret.filter("day_offset = 0").agg({"n_active_users": "sum"}).collect()[0][0]
    n_users = Catalog(spark, sf_dir).events.select("user_id").distinct().count()
    # every user is active on their own cohort day by construction
    assert day0 == n_users
    assert ret.filter("day_offset < 0").count() == 0


def test_contamination_only_test_split_and_bounded(spark, sf_dir):
    from filesystemagent_spark.catalog import Catalog

    out = QUERIES["doc_ngram_contamination"].fn(spark, sf_dir)
    rows = out.collect()
    assert rows, "contamination check must be non-vacuous on testdata"
    for r in rows:
        assert 0 <= r.n_contaminated <= r.n_ngrams
        assert 0.0 <= r.contamination_rate <= 1.0
    # output ids are exactly the shingled test-split docs
    docs = Catalog(spark, sf_dir).documents
    test_ids = {
        r.doc_id
        for r in docs.select("doc_id", _split_col().alias("s"))
        .filter("s = 'test'")
        .collect()
    }
    out_ids = {r.doc_id for r in rows}
    assert out_ids <= test_ids
    assert 0 < TRAIN_PCT < 100


def test_quality_deciles_approx_agrees_with_exact(spark, sf_dir):
    """The sketch-boundary decile assignment must agree with exact
    NTILE(10) for nearly every document (disagreement only within
    sketch error of a boundary), and produce ~equal-sized deciles."""
    from filesystemagent_spark.queries import registry

    reg = registry()
    exact = {r.decile: r.n_docs for r in reg["doc_quality_deciles"].fn(spark, sf_dir).collect()}
    approx = {r.decile: r.n_docs for r in reg["doc_quality_deciles_approx"].fn(spark, sf_dir).collect()}
    n = sum(exact.values())
    assert sum(approx.values()) == n  # every doc assigned exactly once
    # per-decile counts within 20% of n/10 (ties can shift boundary mass)
    for d in range(1, 11):
        assert approx.get(d, 0) >= 0.5 * n / 10, (d, approx)
    # total absolute deviation from the exact histogram is small
    dev = sum(abs(exact.get(d, 0) - approx.get(d, 0)) for d in range(1, 11))
    assert dev <= 0.2 * n, (dev, exact, approx)


def test_bm25_index_term_reads_skip_files(spark, sf_dir, tmp_path):
    """The postings are range-partitioned + sorted on term, so a
    single-term read must open only the files whose manifest term
    range covers it — the property that makes index-answered queries
    sublinear in index size."""
    from filesystemagent_spark.catalog import Catalog
    from filesystemagent_spark.operators.invindex import build_bm25_index

    docs = Catalog(spark, sf_dir).documents
    post_t, _ = build_bm25_index(docs, str(tmp_path / "idx"), n_term_partitions=8)
    all_files = len(post_t.read(spark).inputFiles())
    pruned = len(post_t.read(spark, where=[("term", "=", "spark")]).inputFiles())
    assert all_files >= 8
    assert pruned <= all_files // 2, (pruned, all_files)


def test_bm25_index_incremental_merge_matches_full_build(spark, sf_dir, tmp_path):
    """Continuous-ingest maintenance: index half the corpus, MERGE the
    other half's postings in (key = (term, doc_id)) with the refreshed
    corpus scalars riding the commit's app metadata, recompute the df
    table, and the index-answered top-k must equal a from-scratch
    build over the full corpus — bit-for-bit."""
    import pyspark.sql.functions as F

    from filesystemagent_spark.catalog import Catalog
    from filesystemagent_spark.functions import text as T
    from filesystemagent_spark.operators.invindex import (
        bm25_from_index,
        build_bm25_index,
    )
    from filesystemagent_spark.queries.documents import (
        _BM25_B,
        _BM25_K1,
        _BM25_TERMS,
        _BM25_TOPK,
    )

    docs = Catalog(spark, sf_dir).documents
    first = docs.where(F.col("doc_id") % 2 == 0)
    second = docs.where(F.col("doc_id") % 2 == 1)

    inc_dir = str(tmp_path / "inc")
    post_t, term_t = build_bm25_index(first, inc_dir, n_term_partitions=4)

    # the incremental batch: second half's postings, staged the same way
    toks2 = second.select("doc_id", T.tokens(F.col("text")).alias("tk"))
    add = (
        toks2.select(
            "doc_id", F.size("tk").cast("double").alias("dl"),
            F.explode("tk").alias("term"),
        )
        .groupBy("term", "doc_id", "dl")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    # refreshed corpus scalars ride the merge's app metadata (the
    # Delta userMetadata recipe) — no side channel
    toks_all = docs.select("doc_id", T.tokens(F.col("text")).alias("tk"))
    sc = toks_all.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg(F.size("tk").cast("double")).alias("avgdl"),
    ).collect()[0]
    post_t.merge_into(
        add, ["term", "doc_id"],
        app={"n_docs": float(sc["n_docs"]), "avgdl": float(sc["avgdl"])},
    )
    term_t.overwrite(
        post_t.read(spark).groupBy("term").agg(
            F.count("*").cast("double").alias("df")
        )
    )

    full_dir = str(tmp_path / "full")
    build_bm25_index(docs, full_dir, n_term_partitions=4)

    def answer(d):
        return {
            (r.doc_id, r.bm25)
            for r in bm25_from_index(
                spark, d, _BM25_TERMS, k1=_BM25_K1, b=_BM25_B,
                top_k=_BM25_TOPK,
            ).collect()
        }

    assert answer(inc_dir) == answer(full_dir)


def test_bm25_feed_sink_tracks_dml_and_matches_fresh_build(
    spark, sf_dir, tmp_path
):
    """The round-8 FEED-DRIVEN index maintenance
    (operators/invindex.start_bm25_index_sink): a corpus TxTable
    mutates (insert + text UPDATE that shifts df/tf + keyed DELETE)
    and the sink tracks it from the change feed — df deltas from the
    pre/post images, postings retraction via key tombstones, scalars
    on the commit app. The maintained index must answer BIT-IDENTICAL
    to a from-scratch build over the final corpus — including the
    incremental n_docs/avgdl scalars equalling the fresh ones exactly
    (integer-exact sums, so the float division agrees) — and an empty
    re-drain must publish nothing to either table (per-table
    exactly-once stamps)."""
    import pyspark.sql.functions as F

    from filesystemagent_spark.catalog import Catalog
    from filesystemagent_spark.operators.invindex import (
        bm25_from_index,
        build_bm25_index,
        start_bm25_index_sink,
    )
    from filesystemagent_spark.queries.documents import (
        _BM25_B,
        _BM25_K1,
        _BM25_TERMS,
        _BM25_TOPK,
    )
    from filesystemagent_spark.sources.txtable import TxTable

    docs = Catalog(spark, sf_dir).documents.select("doc_id", "text")
    src = str(tmp_path / "docs")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    t = TxTable(src)
    t.init(docs.filter(F.col("doc_id") % 2 == 0))                    # v1
    start_bm25_index_sink(spark, src, idx, ckpt).awaitTermination()
    upd = docs.filter(
        (F.col("doc_id") % 2 == 1) | (F.col("doc_id") % 5 == 1)
    ).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 1,
            F.concat(F.col("text"), F.lit(" spark merge")),
        ).otherwise(F.col("text")).alias("text"),
    )
    t.merge_into(upd, ["doc_id"], change_feed=True)                  # v2
    t.delete_keys(
        docs.filter(F.col("doc_id") % 7 == 3).select("doc_id"),
        ["doc_id"], change_feed=True,
    )                                                                # v3
    start_bm25_index_sink(spark, src, idx, ckpt).awaitTermination()

    final_docs = docs.filter(F.col("doc_id") % 7 != 3).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 1,
            F.concat(F.col("text"), F.lit(" spark merge")),
        ).otherwise(F.col("text")).alias("text"),
    )
    fresh = str(tmp_path / "fresh")
    build_bm25_index(final_docs, fresh, n_term_partitions=4)

    def answer(d):
        return [
            (r.doc_id, r.bm25)
            for r in bm25_from_index(
                spark, d, _BM25_TERMS, k1=_BM25_K1, b=_BM25_B,
                top_k=_BM25_TOPK,
            ).collect()
        ]

    assert answer(idx) == answer(fresh)
    import os as _os

    post_inc = TxTable(_os.path.join(idx, "postings"))
    post_fresh = TxTable(_os.path.join(fresh, "postings"))
    for key in ("n_docs", "avgdl"):
        assert float(post_inc.latest_app_value(key)) == float(
            post_fresh.latest_app_value(key)
        ), key
    # maintained content equals the fresh build's, row for row
    inc_rows = {
        tuple(r) for r in post_inc.read(spark)
        .select("term", "doc_id", "tf", "dl").collect()
    }
    fresh_rows = {
        tuple(r) for r in post_fresh.read(spark)
        .select("term", "doc_id", "tf", "dl").collect()
    }
    assert inc_rows == fresh_rows
    # exactly-once: an empty re-drain publishes nothing to either table
    term_inc = TxTable(_os.path.join(idx, "terms"))
    heads = (post_inc.latest_version(), term_inc.latest_version())
    start_bm25_index_sink(spark, src, idx, ckpt).awaitTermination()
    assert (post_inc.latest_version(), term_inc.latest_version()) == heads


def test_bm25_sink_crash_between_tables_replays_only_missing_half(
    spark, sf_dir, tmp_path, monkeypatch
):
    """The sink's exactly-once claim under its worst crash point: fail
    AFTER the postings commit but BEFORE the terms commit. The restart
    must replay the batch, SKIP the already-stamped postings half (no
    double tombstone/merge), apply the terms half once, and converge
    to the fresh-build state — a double-applied df delta or a repeated
    postings merge would shift the final answer."""
    import pyspark.sql.functions as F

    from filesystemagent_spark.catalog import Catalog
    from filesystemagent_spark.operators.invindex import (
        bm25_from_index,
        build_bm25_index,
        start_bm25_index_sink,
    )
    from filesystemagent_spark.queries.documents import (
        _BM25_B,
        _BM25_K1,
        _BM25_TERMS,
        _BM25_TOPK,
    )
    from filesystemagent_spark.sources.txtable import TxTable

    docs = Catalog(spark, sf_dir).documents.select("doc_id", "text")
    src, idx, ckpt = (str(tmp_path / d) for d in ("docs", "idx", "ckpt"))
    t = TxTable(src)
    t.init(docs.filter(F.col("doc_id") % 2 == 0))
    start_bm25_index_sink(spark, src, idx, ckpt).awaitTermination()
    t.merge_into(
        docs.filter(F.col("doc_id") % 2 == 1), ["doc_id"], change_feed=True
    )

    import os

    orig = TxTable.merge_into
    boom = {"armed": True}

    def failing(self, *a, **kw):
        if boom["armed"] and self.path.endswith(os.sep + "terms"):
            boom["armed"] = False
            raise RuntimeError("injected crash before the terms commit")
        return orig(self, *a, **kw)

    monkeypatch.setattr(TxTable, "merge_into", failing)
    q = start_bm25_index_sink(spark, src, idx, ckpt)
    import pytest as _pytest

    with _pytest.raises(Exception, match="injected crash"):
        q.awaitTermination()
    post_t = TxTable(os.path.join(idx, "postings"))
    term_t = TxTable(os.path.join(idx, "terms"))
    post_head = post_t.latest_version()     # postings half landed...
    term_head = term_t.latest_version()     # ...terms half did not
    assert post_t.latest_app_value("bm25_batch_id") is not None
    # restart: replay applies ONLY the terms half
    start_bm25_index_sink(spark, src, idx, ckpt).awaitTermination()
    assert post_t.latest_version() == post_head  # postings untouched
    assert term_t.latest_version() > term_head

    fresh = str(tmp_path / "fresh")
    build_bm25_index(docs, fresh, n_term_partitions=4)

    def answer(d):
        return [
            (r.doc_id, r.bm25)
            for r in bm25_from_index(
                spark, d, _BM25_TERMS, k1=_BM25_K1, b=_BM25_B,
                top_k=_BM25_TOPK,
            ).collect()
        ]

    assert answer(idx) == answer(fresh)


def test_bm25_index_survives_compaction(spark, sf_dir, tmp_path):
    """compact() publishes its own app metadata; the query path must
    walk back to the newest commit carrying the corpus scalars, and
    answers must be unchanged (compaction is layout-only)."""
    from filesystemagent_spark.catalog import Catalog
    from filesystemagent_spark.operators.invindex import (
        bm25_from_index,
        build_bm25_index,
    )
    from filesystemagent_spark.queries.documents import (
        _BM25_B,
        _BM25_K1,
        _BM25_TERMS,
        _BM25_TOPK,
    )
    from filesystemagent_spark.sources.txtable import TxTable
    import os

    idx = str(tmp_path / "idx")
    post_t, _ = build_bm25_index(
        Catalog(spark, sf_dir).documents, idx, n_term_partitions=4
    )
    before = {
        (r.doc_id, r.bm25)
        for r in bm25_from_index(
            spark, idx, _BM25_TERMS, k1=_BM25_K1, b=_BM25_B, top_k=_BM25_TOPK
        ).collect()
    }
    post_t.compact(spark, target_files=2, zorder_cols=None)
    after = {
        (r.doc_id, r.bm25)
        for r in bm25_from_index(
            spark, idx, _BM25_TERMS, k1=_BM25_K1, b=_BM25_B, top_k=_BM25_TOPK
        ).collect()
    }
    assert after == before


def test_bm25_query_path_is_one_scan_per_table(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Round 9: a T-term query is ONE stats-pruned `term IN (...)` read
    per index table — 2 Spark scans total, not ~2T (was: a per-term
    read + collect for df lookups, then per-term postings reads unioned
    in a Python loop). Gated three ways: (a) TxTable.read is invoked
    exactly once per table, (b) the single postings scan's inputFiles
    is the manifest-pruned subset (the IN predicate reaches per-file
    min/max stats before Spark plans the scan), and (c) answers stay
    bit-identical to the full-scan scorer."""
    import os

    from filesystemagent_spark.operators.invindex import (
        bm25_from_index,
        build_bm25_index,
    )
    from filesystemagent_spark.queries.documents import (
        _BM25_B,
        _BM25_K1,
        _BM25_TERMS,
        _BM25_TOPK,
        _bm25_scored,
        _doc_text_rebalanced,
    )
    from filesystemagent_spark.sources.txtable import TxTable

    idx = str(tmp_path / "idx")
    post_t, _ = build_bm25_index(
        _doc_text_rebalanced(spark, sf_dir), idx, n_term_partitions=8
    )
    n_post_files = len(post_t.read(spark).inputFiles())

    reads = []  # (table basename, n files the pruned scan will touch)
    orig = TxTable.read

    def counting(self, *a, **kw):
        df = orig(self, *a, **kw)
        reads.append((os.path.basename(self.path), len(df.inputFiles())))
        return df

    monkeypatch.setattr(TxTable, "read", counting)
    got = [
        (r.doc_id, r.bm25)
        for r in bm25_from_index(
            spark, idx, _BM25_TERMS, k1=_BM25_K1, b=_BM25_B, top_k=_BM25_TOPK
        ).collect()
    ]
    monkeypatch.setattr(TxTable, "read", orig)

    by_table = sorted(t for t, _ in reads)
    assert by_table == ["postings", "terms"], reads  # one scan per table
    post_files_scanned = dict(reads)["postings"]
    assert post_files_scanned < n_post_files, (
        post_files_scanned,
        n_post_files,
    )  # the IN predicate pruned files before Spark planned the scan

    full = _bm25_scored(spark, sf_dir)
    import pyspark.sql.functions as F

    want = [
        (r.doc_id, r.bm25)
        for r in full.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(_BM25_TOPK)
        .collect()
    ]
    assert got == want  # bit-identical to the corpus scan


def test_bloom_contamination_never_undercounts_exact(spark, sf_dir):
    """The Bloom guarantee: per test doc, n_flagged >= the exact join's
    n_contaminated (false positives only, never negatives)."""
    from filesystemagent_spark.queries import registry

    reg = registry()
    exact = {
        r.doc_id: r.n_contaminated
        for r in reg["doc_ngram_contamination"].fn(spark, sf_dir).collect()
    }
    bloom = {
        r.doc_id: r.n_flagged
        for r in reg["doc_ngram_contamination_bloom"].fn(spark, sf_dir).collect()
    }
    assert set(bloom) == set(exact)
    assert all(bloom[d] >= exact[d] for d in exact)


def test_bm25_sink_folds_tombstones_under_delete_only_load(
    spark, sf_dir, tmp_path
):
    """Round 9 (measured gap): delete-only feed batches stack one MoR
    tombstone each on the postings table — six batches left depth 6
    with covered_frac 1.0, every read paying six anti-joins over every
    file — because only merges self-materialize. The sinks now fold
    under the shared policy (_maybe_fold_tombstones, depth > 4 OR
    covered_frac > 0.5), so depth stays bounded through a delete-only
    run and the index still answers bit-identical to a fresh build
    over the surviving corpus."""
    import os

    import pyspark.sql.functions as F

    from filesystemagent_spark.catalog import Catalog
    from filesystemagent_spark.operators.invindex import (
        bm25_from_index,
        build_bm25_index,
        start_bm25_index_sink,
    )
    from filesystemagent_spark.queries.documents import (
        _BM25_B,
        _BM25_K1,
        _BM25_TERMS,
        _BM25_TOPK,
    )
    from filesystemagent_spark.sources.txtable import TxTable

    docs = Catalog(spark, sf_dir).documents.select("doc_id", "text")
    src, idx, ckpt = (str(tmp_path / d) for d in ("docs", "idx", "ckpt"))
    t = TxTable(src)
    t.init(docs)
    start_bm25_index_sink(spark, src, idx, ckpt).awaitTermination()
    post_t = TxTable(os.path.join(idx, "postings"))

    max_depth = 0
    for i in range(6):
        t.delete_keys(
            docs.filter(F.col("doc_id") % 37 == i).select("doc_id"),
            ["doc_id"], change_feed=True,
        )
        start_bm25_index_sink(spark, src, idx, ckpt).awaitTermination()
        max_depth = max(max_depth, post_t.tombstone_info()["depth"])
    # pre-fix this reached 6 and kept growing; the policy folds at >4
    # (or covered_frac > 0.5, which an all-files tombstone trips first)
    assert max_depth <= 4, max_depth
    assert post_t.tombstone_info()["covered_frac"] <= 0.5

    survivors = docs.filter(~((F.col("doc_id") % 37).isin(*range(6))))
    fresh = str(tmp_path / "fresh")
    build_bm25_index(survivors, fresh, n_term_partitions=4)

    def answer(d):
        return [
            (r.doc_id, r.bm25)
            for r in bm25_from_index(
                spark, d, _BM25_TERMS, k1=_BM25_K1, b=_BM25_B,
                top_k=_BM25_TOPK,
            ).collect()
        ]

    assert answer(idx) == answer(fresh)
