"""Measure the centroid-drift → recall decay curve for the stored IVF
index (round 9, verdict item 3) and pick the re-train trigger.

`start_ivf_index_sink` tracks DML against FIXED centroids — correct by
construction, but after distribution shift the cells skew and recall@k
decays with no error anywhere. Round 9 adds an exact per-batch drift
ledger (`ivf_cos_sum`/`ivf_n` vs the training snapshot's
`ivf_cos_sum0`/`ivf_n0`, riding the same app metadata as the
exactly-once stamp) exposed through `ivf_drift_info`. This experiment
calibrates the ledger's `drift_ratio` against realized recall@10 so
the re-train threshold is measured, not guessed.

Method (sf0.1 by default, the scale BENCH runs at): the harness
embeddings are near-uniform noise — IVF recall on them is governed by
nprobe/|cells| and barely moves under drift (measured: recall@10 flat
at 0.36–0.39 across every drift state while the ratio fell 1.0→0.926).
So the experiment derives a CLUSTERED corpus deterministically from
the same table — v_c = 0.75·centroid(label) + 0.25·v — where IVF
actually earns its recall and drift genuinely costs it. Centroids
train on 3/4 of the clustered corpus (the sink's init drain snapshots
the ledger baseline), then drift states arrive through REAL
change-feed DML:
  benign   same-distribution inserts (the held-out quarter)
  mild     30% of rows blended halfway toward their reverse
           v' = 0.5·v + 0.5·reverse(v)   (deterministic, no RNG)
  heavy    60% of rows fully reversed
  negate   60% of rows negated (adversarial flip)
— draining the sink after each. At every state: `drift_ratio` from the
ledger, recall@10 of the stored-index IVF answer (nprobe=2, the
registered default) against the exact brute-force top-10 over the SAME
live corpus, and recall_after_retrain = recall after rebuilding
centroids from the live corpus and re-assigning once (what acting on
the trigger buys back).

Output: one JSON line per state + a summary table; paste into SCALE.md.

Run: python scripts/exp_ivf_drift.py [sf_dir] [n_queries]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    k = 10

    from pyspark.sql import functions as F

    from filesystemagent_spark.catalog import Catalog
    from filesystemagent_spark.operators import similarity as S
    from filesystemagent_spark.session import get_spark
    from filesystemagent_spark.sources.txtable import TxTable

    spark = get_spark()
    raw = Catalog(spark, sf_dir).embeddings
    # deterministic CLUSTERED corpus: pull each vector 3/4 of the way
    # to its label centroid so IVF recall is real (see module doc)
    label_cents = S.centroids_from_labels(
        raw, label_col="label", vec_col="embedding", dim=64
    ).withColumnRenamed("cell_id", "label")
    emb = (
        raw.join(label_cents, "label")
        .select(
            "vec_id", "label",
            F.transform(
                F.zip_with(
                    "centroid", "embedding",
                    lambda c, v: c * F.lit(0.75) + v * F.lit(0.25),
                ),
                lambda x: x.cast("float"),
            ).alias("embedding"),
        )
        .cache()
    )
    emb.count()
    tmp = tempfile.mkdtemp(prefix="ivf_drift_")
    src = os.path.join(tmp, "corpus")
    idx = os.path.join(tmp, "index")
    ckpt = os.path.join(tmp, "ckpt")
    cent_path = os.path.join(idx, "centroids")
    cells_path = os.path.join(idx, "cells")

    corpus0 = emb.filter(F.col("vec_id") % 4 != 0)
    t = TxTable(src)
    t.init(corpus0.select("vec_id", "embedding"))
    TxTable(cent_path).init(
        S.centroids_from_labels(
            corpus0, label_col="label", vec_col="embedding", dim=64
        )
    )
    S.start_ivf_index_sink(spark, src, idx, ckpt).awaitTermination()

    def drain() -> None:
        S.start_ivf_index_sink(spark, src, idx, ckpt).awaitTermination()

    def recall(centroids, cells) -> float:
        # the query workload FOLLOWS the data: queries sample the LIVE
        # corpus (drifted rows included) — a drifted query probing
        # cells trained pre-drift is exactly the failure mode the
        # trigger exists to catch; fixed pre-drift queries measure
        # nothing (their neighbors stay well-assigned; verified flat)
        live = t.read(spark)
        stride = max(1, live.count() // n_queries)
        queries = live.filter(F.col("vec_id") % stride == 1).select(
            "vec_id", "embedding"
        )
        exact: dict[int, set] = {}
        for r in S.knn_bruteforce(
            queries, live, id_col="vec_id", vec_col="embedding", k=k
        ).collect():
            exact.setdefault(r.query_id, set()).add(r.neighbor_id)
        approx: dict[int, set] = {}
        for r in S.knn_ivf(
            queries, None, centroids,
            id_col="vec_id", vec_col="embedding", k=k, nprobe=2,
            corpus_cells=cells,
        ).collect():
            approx.setdefault(r.query_id, set()).add(r.neighbor_id)
        per_q = [
            len(exact[q] & approx.get(q, set())) / len(exact[q])
            for q in exact
        ]
        return sum(per_q) / len(per_q)

    def measure(state: str) -> dict:
        info = S.ivf_drift_info(idx)
        cents = TxTable(cent_path).read(spark)
        cells = TxTable(cells_path).read(spark)
        r_stored = recall(cents, cells)
        # what re-training buys back at this state: rebuild centroids
        # from the live corpus (k-means init from the stored ones),
        # re-assign once — the Faiss offline re-train recipe
        live = t.read(spark)
        cents2 = S.kmeans_centroids(
            live, k=cents.count(), id_col="vec_id", vec_col="embedding",
            max_iter=5,
        )
        cells2 = S.assign_cells(
            live, cents2, id_col="vec_id", vec_col="embedding", nprobe=1
        )
        r_retrained = recall(cents2, cells2)
        row = {
            "state": state,
            "n_rows": info["n_rows"],
            "drift_ratio": round(info["drift_ratio"], 4),
            "recall_at_10": round(r_stored, 4),
            "recall_after_retrain": round(r_retrained, 4),
        }
        print(json.dumps(row), flush=True)
        return row

    rows = [measure("initial")]

    t.merge_into(
        emb.filter(F.col("vec_id") % 4 == 0).select("vec_id", "embedding"),
        ["vec_id"], change_feed=True,
    )
    drain()
    rows.append(measure("benign_inserts"))

    half = F.transform(
        F.zip_with(
            "embedding", F.reverse("embedding"),
            lambda a, b: a * F.lit(0.5) + b * F.lit(0.5),
        ),
        lambda x: x.cast("float"),
    )
    t.merge_into(
        emb.filter(F.col("vec_id") % 10 < 3).select(
            "vec_id", half.alias("embedding")
        ),
        ["vec_id"], change_feed=True,
    )
    drain()
    rows.append(measure("mild_30pct_halfblend"))

    t.merge_into(
        emb.filter(F.col("vec_id") % 5 != 0).select(
            "vec_id",
            F.transform(F.reverse("embedding"), lambda x: x.cast("float"))
            .alias("embedding"),
        ),
        ["vec_id"], change_feed=True,
    )
    drain()
    rows.append(measure("heavy_60pct_reversed"))

    t.merge_into(
        emb.filter(F.col("vec_id") % 5 != 0).select(
            "vec_id",
            F.transform("embedding", lambda x: (-x).cast("float"))
            .alias("embedding"),
        ),
        ["vec_id"], change_feed=True,
    )
    drain()
    rows.append(measure("negate_60pct"))

    print("\n| state | n_rows | drift_ratio | recall@10 (stored) | recall@10 (re-trained) |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['state']} | {r['n_rows']} | {r['drift_ratio']} "
            f"| {r['recall_at_10']} | {r['recall_after_retrain']} |"
        )


if __name__ == "__main__":
    main()
