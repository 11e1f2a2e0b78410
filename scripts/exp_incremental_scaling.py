"""Growth curve of the incremental-maintenance trilogy (round 9,
verdict item 6): per-batch cost must be O(batch), not O(table).

Round 8 closed the per-batch scale-killers — join-view legs
footprint-prune the opposite side's read, the BM25/IVF sinks derive
every delta from the feed's images and never rescan corpus or index.
SCALE.md had absolute numbers but no growth curve; this measures one:
for each maintained artifact (BM25 lexical index, IVF cell table,
bidirectional join view), apply IDENTICAL fixed-size DML batches
against a base table of size S and of size 10·S and time each drain.
If per-batch cost is O(batch), the 10× table pays ~the same per batch
(streaming machinery floor + batch-proportional work); if any sink
still scans the table or the index per batch, the 10× run shows it.

Each config applies `n_batches` single-commit batches (merge of `b`
keys + delete of b/5 keys, disjoint key ranges per batch) with one
availableNow drain per batch. Reported per config: the per-batch drain
times, their mean, and the 10×/1× mean ratio with a PASS/FAIL against
ratio < 2.0 (floor + batch work dominate; table size must not).

Base tables are derived from the sf0.1 harness parquet, replicated
key-shifted to reach the target sizes (documents → BM25, embeddings →
IVF, events-as-facts ⋈ users-dim → join view; the dimension is staged
range-clustered so footprint pruning has files to skip — the 100 TB
layout the sinks assume).

Run: python scripts/exp_incremental_scaling.py [sf_dir] [n_batches]
Output: one JSON line per config + a summary table; paste into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    from pyspark.sql import functions as F

    from filesystemagent_spark.catalog import Catalog
    from filesystemagent_spark.operators.dedup import start_minhash_index_sink
    from filesystemagent_spark.operators.invindex import start_bm25_index_sink
    from filesystemagent_spark.operators.similarity import (
        centroids_from_labels,
        start_ivf_index_sink,
    )
    from filesystemagent_spark.session import get_spark
    from filesystemagent_spark.sources.txtable import TxTable
    from filesystemagent_spark.streaming.sinks import (
        start_bidirectional_join_sinks,
    )

    spark = get_spark()
    cat = Catalog(spark, sf_dir)

    def replicate(df, key, copies):
        """`copies` key-shifted copies of df — same distribution,
        disjoint keys (key must be integral)."""
        span = df.agg(F.max(key)).first()[0] + 1
        return (
            df.crossJoin(spark.range(copies).select(F.col("id").alias("_k")))
            .withColumn(key, F.col(key) + F.col("_k") * F.lit(span))
            .drop("_k")
        ), span

    results = []

    def run(config, init_fn, batch_fn, drain_fn):
        """init, then n_batches (DML batch -> timed drain)."""
        init_fn()
        times = []
        for i in range(n_batches):
            batch_fn(i)
            t0 = time.monotonic()
            drain_fn()
            times.append(round(time.monotonic() - t0, 3))
        row = {
            "config": config,
            "per_batch_sec": times,
            "mean_sec": round(sum(times) / len(times), 3),
        }
        print(json.dumps(row), flush=True)
        return row

    B = 100  # batch size: merge B keys, delete B//5 — constant everywhere

    # -- BM25 lexical index ------------------------------------------
    docs = cat.documents.select("doc_id", "text")
    for copies in (1, 10):
        big, span = replicate(docs, "doc_id", copies)
        tmp = tempfile.mkdtemp(prefix=f"scal_bm25_{copies}x_")
        src, idx, ckpt = (os.path.join(tmp, d) for d in ("src", "idx", "ck"))
        t = TxTable(src)

        def init(t=t, big=big, src=src, idx=idx, ckpt=ckpt):
            t.init(big.repartition(8))
            start_bm25_index_sink(spark, src, idx, ckpt).awaitTermination()

        def batch(i, t=t, docs=docs):
            sl = docs.filter(
                (F.col("doc_id") >= i * B) & (F.col("doc_id") < i * B + B)
            )
            t.merge_into(
                sl.select(
                    "doc_id",
                    F.concat(F.col("text"), F.lit(f" rev{i}")).alias("text"),
                ),
                ["doc_id"], change_feed=True,
            )
            t.delete_keys(
                sl.filter(F.col("doc_id") % 5 == 0).select("doc_id"),
                ["doc_id"], change_feed=True,
            )

        def drain(src=src, idx=idx, ckpt=ckpt):
            start_bm25_index_sink(spark, src, idx, ckpt).awaitTermination()

        results.append(run(f"bm25_{copies}x", init, batch, drain))

    # -- MinHash band index (round 9: the fourth maintained artifact) -
    for copies in (1, 10):
        big, span = replicate(docs, "doc_id", copies)
        tmp = tempfile.mkdtemp(prefix=f"scal_mh_{copies}x_")
        src, idx, ckpt = (os.path.join(tmp, d) for d in ("src", "idx", "ck"))
        t = TxTable(src)

        def init(t=t, big=big, src=src, idx=idx, ckpt=ckpt):
            t.init(big.repartition(8))
            start_minhash_index_sink(spark, src, idx, ckpt).awaitTermination()

        def batch(i, t=t, docs=docs):
            sl = docs.filter(
                (F.col("doc_id") >= i * B) & (F.col("doc_id") < i * B + B)
            )
            t.merge_into(
                sl.select(
                    "doc_id",
                    F.concat(F.col("text"), F.lit(f" rev{i}")).alias("text"),
                ),
                ["doc_id"], change_feed=True,
            )
            t.delete_keys(
                sl.filter(F.col("doc_id") % 5 == 0).select("doc_id"),
                ["doc_id"], change_feed=True,
            )

        def drain(src=src, idx=idx, ckpt=ckpt):
            start_minhash_index_sink(spark, src, idx, ckpt).awaitTermination()

        results.append(run(f"minhash_{copies}x", init, batch, drain))

    # -- IVF cell table ----------------------------------------------
    emb = cat.embeddings
    cents = centroids_from_labels(
        emb, label_col="label", vec_col="embedding", dim=64
    )
    for copies in (1, 10):
        big, span = replicate(
            emb.select("vec_id", "embedding"), "vec_id", copies
        )
        tmp = tempfile.mkdtemp(prefix=f"scal_ivf_{copies}x_")
        src, idx, ckpt = (os.path.join(tmp, d) for d in ("src", "idx", "ck"))
        t = TxTable(src)

        def init(t=t, big=big, idx=idx, src=src, ckpt=ckpt):
            t.init(big.repartition(8))
            TxTable(os.path.join(idx, "centroids")).init(cents)
            start_ivf_index_sink(spark, src, idx, ckpt).awaitTermination()

        def batch(i, t=t, emb=emb):
            sl = emb.filter(
                (F.col("vec_id") >= i * B) & (F.col("vec_id") < i * B + B)
            )
            t.merge_into(
                sl.select(
                    "vec_id",
                    F.transform(
                        F.reverse("embedding"), lambda x: x.cast("float")
                    ).alias("embedding"),
                ),
                ["vec_id"], change_feed=True,
            )
            t.delete_keys(
                sl.filter(F.col("vec_id") % 5 == 0).select("vec_id"),
                ["vec_id"], change_feed=True,
            )

        def drain(src=src, idx=idx, ckpt=ckpt):
            start_ivf_index_sink(spark, src, idx, ckpt).awaitTermination()

        results.append(run(f"ivf_{copies}x", init, batch, drain))

    # -- bidirectional join view (only L mutates; R is the big
    # -- range-clustered dimension the leg must NOT fully rescan) -----
    ev = cat.events.select(
        F.col("event_id").alias("pk"), F.col("user_id").alias("jk"),
        F.col("value").alias("v"),
    )
    users = (
        cat.events.select(F.col("user_id").alias("jk")).distinct()
        .withColumn("dim", F.col("jk") * 10)
    )
    for copies in (1, 10):
        bigdim, span = replicate(users, "jk", copies)
        tmp = tempfile.mkdtemp(prefix=f"scal_join_{copies}x_")
        lp, rp, dp = (os.path.join(tmp, d) for d in ("L", "R", "D"))
        ckl, ckr = (os.path.join(tmp, d) for d in ("ckl", "ckr"))
        L, R = TxTable(lp), TxTable(rp)

        def init(L=L, R=R, bigdim=bigdim, lp=lp, rp=rp, dp=dp, ckl=ckl,
                 ckr=ckr):
            L.init(ev.repartition(8))
            R.init(bigdim.repartitionByRange(16, "jk"))
            ql, qr = start_bidirectional_join_sinks(
                spark, lp, rp, dp, ckl, ckr,
                on="jk", left_pk="pk", right_pk="jk",
            )
            ql.awaitTermination()
            qr.awaitTermination()

        def batch(i, L=L):
            sl = ev.filter(
                (F.col("pk") >= i * B) & (F.col("pk") < i * B + B)
            )
            L.merge_into(
                sl.withColumn("v", F.col("v") + 1), ["pk"],
                change_feed=True,
            )
            L.delete_keys(
                sl.filter(F.col("pk") % 5 == 0).select("pk"),
                ["pk"], change_feed=True,
            )

        def drain(lp=lp, rp=rp, dp=dp, ckl=ckl, ckr=ckr):
            ql, qr = start_bidirectional_join_sinks(
                spark, lp, rp, dp, ckl, ckr,
                on="jk", left_pk="pk", right_pk="jk",
            )
            ql.awaitTermination()
            qr.awaitTermination()

        results.append(run(f"join_{copies}x", init, batch, drain))

    print("\n| sink | base | per-batch drains (s) | mean (s) |")
    print("|---|---|---|---|")
    for r in results:
        sink, base = r["config"].rsplit("_", 1)
        print(
            f"| {sink} | {base} | {r['per_batch_sec']} | {r['mean_sec']} |"
        )
    by = {r["config"]: r["mean_sec"] for r in results}
    print("\nO(batch) check (10x table / 1x table mean per-batch ratio, "
          "PASS iff < 2.0):")
    ok = True
    for sink in ("bm25", "minhash", "ivf", "join"):
        ratio = by[f"{sink}_10x"] / by[f"{sink}_1x"]
        verdict = "PASS" if ratio < 2.0 else "FAIL"
        ok = ok and ratio < 2.0
        print(f"  {sink}: {ratio:.2f}  {verdict}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
