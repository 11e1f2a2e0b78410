"""Measure the codebook-drift → ADC-recall decay curve for the stored
PQ index (round 10, verdict item 3) and pick the re-train trigger —
`exp_ivf_drift.py`'s sibling for the compressed-vector leg.

`start_pq_index_sink` encodes against a FIXED codebook — correct by
construction, but after distribution shift the per-subspace centroids
sit in the wrong regions, reconstruction error grows, and ADC
distances (and therefore recall) degrade with no error anywhere.
Round 10 adds an exact per-batch reconstruction-error ledger
(`pq_err_sum`/`pq_n` vs the training snapshot's `pq_err_sum0`/`pq_n0`)
exposed through `pq_drift_info`. This calibrates the ledger's
`drift_ratio` (mean live error / baseline mean error — RISES under
drift, the opposite direction from IVF's cosine) against realized
recall@10 so the re-train threshold is measured, not guessed.

Method (sf0.1 by default): normalized harness embeddings, codebook
(m=8, k=16) trained on 3/4 of the corpus, the sink's init drain
snapshotting the ledger baseline; then drift states arrive through
REAL change-feed DML. The states are MEAN SHIFTS (normalize(v + c·1)
on 30–60% of rows): a first run with the IVF experiment's
reverse/negate states showed those are another draw from the SAME
per-coordinate distribution on isotropic noise — error ratio
0.88–0.99, recall flat — i.e. NOT codebook drift, while shifts move
every subspace's distribution and measurably destroy ADC recall. At
every state: `drift_ratio` AND `concentration_ratio` from the
two-signal ledger, recall@10 of
ADC-with-exact-rerank (knn_pq_rerank, rerank=20 = 2k) against the
brute-force top-10 over the SAME live corpus, plus pure-ADC (knn_pq)
recall, and recall after re-training the codebook on the live corpus
and re-encoding once (what acting on the trigger buys back).

Output: one JSON line per state + a summary table; paste into
SCALE.md and set `pq_drift_info`'s default retrain_ratio from it.

Run: python scripts/exp_pq_drift.py [sf_dir] [n_queries]
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
    dim, m, k_cells = 64, 8, 16

    from pyspark.sql import functions as F

    from filesystemagent_spark.catalog import Catalog
    from filesystemagent_spark.operators import similarity as S
    from filesystemagent_spark.session import get_spark
    from filesystemagent_spark.sources.txtable import TxTable

    spark = get_spark()
    emb = S.normalize(Catalog(spark, sf_dir).embeddings).select(
        "vec_id", "embedding"
    ).cache()
    emb.count()
    tmp = tempfile.mkdtemp(prefix="pq_drift_")
    src = os.path.join(tmp, "corpus")
    idx = os.path.join(tmp, "index")
    ckpt = os.path.join(tmp, "ckpt")
    book_path = os.path.join(idx, "codebook")
    codes_path = os.path.join(idx, "codes")

    corpus0 = emb.filter(F.col("vec_id") % 4 != 0)
    t = TxTable(src)
    t.init(corpus0)
    TxTable(book_path).init(
        S.pq_codebooks(
            corpus0, id_col="vec_id", vec_col="embedding", dim=dim, m=m,
            k=k_cells, max_iter=3,
        )
    )

    def drain() -> None:
        S.start_pq_index_sink(
            spark, src, idx, ckpt, dim=dim, m=m, k_cells=k_cells
        ).awaitTermination()

    drain()

    def recall(codes, book, live, queries, exact, rerank) -> float:
        approx: dict[int, set] = {}
        if rerank:
            got = S.knn_pq_rerank(
                queries, codes, book, live, id_col="vec_id",
                vec_col="embedding", dim=dim, m=m, k_cells=k_cells, k=k,
                rerank=rerank,
            )
        else:
            got = S.knn_pq(
                queries, codes, book, id_col="vec_id", vec_col="embedding",
                dim=dim, m=m, k_cells=k_cells, k=k,
            )
        for r in got.collect():
            approx.setdefault(r.query_id, set()).add(r.neighbor_id)
        per_q = [
            len(exact[q] & approx.get(q, set())) / len(exact[q])
            for q in exact
        ]
        return sum(per_q) / len(per_q)

    def measure(state: str) -> dict:
        info = S.pq_drift_info(idx, retrain_ratio=float("inf"))
        book = TxTable(book_path).read(spark)
        codes = TxTable(codes_path).read(spark)
        # queries follow the data: sample the LIVE corpus (drifted rows
        # included) — the exp_ivf_drift discipline
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
        r_adc = recall(codes, book, live, queries, exact, rerank=None)
        r_rr = recall(codes, book, live, queries, exact, rerank=2 * k)
        # what re-training buys back: rebuild codebook on live, re-encode
        book2 = S.pq_codebooks(
            live, id_col="vec_id", vec_col="embedding", dim=dim, m=m,
            k=k_cells, max_iter=3,
        )
        codes2 = S.pq_encode(
            live, book2, id_col="vec_id", vec_col="embedding", dim=dim,
            m=m, k=k_cells,
        )
        r_rr2 = recall(codes2, book2, live, queries, exact, rerank=2 * k)
        row = {
            "state": state,
            "n_rows": info["n_rows"],
            "drift_ratio": round(info["drift_ratio"], 4),
            "concentration_ratio": round(info["concentration_ratio"], 4),
            "usage_concentration": round(info["usage_concentration"], 4),
            "mean_recon_err": round(info["mean_recon_err"], 6),
            "recall_adc": round(r_adc, 4),
            "recall_rerank20": round(r_rr, 4),
            "recall_rerank20_retrained": round(r_rr2, 4),
        }
        print(json.dumps(row), flush=True)
        return row

    rows = [measure("initial")]

    t.merge_into(
        emb.filter(F.col("vec_id") % 4 == 0), ["vec_id"], change_feed=True
    )
    drain()
    rows.append(measure("benign_inserts"))

    # PQ drift states are MEAN SHIFTS, not the IVF experiment's
    # reverse/negate: on the isotropic harness noise, reversing or
    # negating a vector is another draw from the SAME per-coordinate
    # distribution, so the codebook stays matched (measured: ratio
    # 0.88-0.99, recall flat). A shift toward the all-ones direction
    # moves EVERY subspace's distribution away from the zero-mean
    # training data — the "new corpus domain" failure mode the ledger
    # exists to catch. Shifted vectors are re-normalized (the corpus
    # contract).
    def shifted(c: float):
        sh = F.transform("embedding", lambda x: x + F.lit(c))
        nrm = F.sqrt(
            F.aggregate(sh, F.lit(0.0), lambda a, x: a + x * x)
        )
        return F.transform(sh, lambda x: x / nrm)

    t.merge_into(
        emb.filter(F.col("vec_id") % 10 < 3).select(
            "vec_id", shifted(0.05).alias("embedding")
        ),
        ["vec_id"], change_feed=True,
    )
    drain()
    rows.append(measure("mild_30pct_shift0.05"))

    t.merge_into(
        emb.filter(F.col("vec_id") % 5 != 0).select(
            "vec_id", shifted(0.12).alias("embedding")
        ),
        ["vec_id"], change_feed=True,
    )
    drain()
    rows.append(measure("heavy_60pct_shift0.12"))

    t.merge_into(
        emb.filter(F.col("vec_id") % 5 != 0).select(
            "vec_id", shifted(0.3).alias("embedding")
        ),
        ["vec_id"], change_feed=True,
    )
    drain()
    rows.append(measure("extreme_60pct_shift0.3"))

    print(
        "\n| state | n_rows | err ratio | conc ratio | recall@10 ADC "
        "| +rerank20 | re-trained |"
    )
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['state']} | {r['n_rows']} | {r['drift_ratio']} "
            f"| {r['concentration_ratio']} "
            f"| {r['recall_adc']} | {r['recall_rerank20']} "
            f"| {r['recall_rerank20_retrained']} |"
        )


if __name__ == "__main__":
    main()
