"""Phase profile of doc_bigram_logprob (round 11, VERDICT item 7):
where do its ~16 s at sf0.01 go — tokenize/persist, bigram explode,
the three broadcast builds, or the DECIMAL(38,18) scoring aggregation?

    python scripts/exp_bigram_profile.py [sf_dir]

Replicates the query's phases inline (read-only experiment). The last
two phases time the scoring aggregation twice: once with the shipped
DECIMAL(38,18) partials and once with a plain DOUBLE sum — attribution
only (the DOUBLE variant is NOT hash-stable and is never shipped).
"""

from __future__ import annotations

import json
import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from filesystemagent_spark.functions import text as T  # noqa: E402
from filesystemagent_spark.queries.training import _docs_rebalanced  # noqa: E402
from filesystemagent_spark.session import get_spark  # noqa: E402
from filesystemagent_spark.caching import track_persist, release_tracked_caches  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("exp-bigram-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    out: dict[str, float] = {}

    def timed(label, fn):
        sc.setJobDescription(label)
        t0 = time.time()
        r = fn()
        out[label] = round(time.time() - t0, 3)
        sc.setJobDescription(None)
        return r

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    docs = _docs_rebalanced(spark, sf_dir)
    toks = track_persist(
        docs.select("doc_id", T.tokens(F.col("text")).alias("tk"))
    )
    timed("0_tokenize_persist", lambda: toks.count())
    bi = track_persist(
        toks.filter(F.size("tk") >= 2)
        .select(
            "doc_id",
            F.posexplode(F.slice("tk", 1, F.size("tk") - 1)).alias("_i", "w1"),
            F.col("tk"),
        )
        .select("doc_id", "w1", F.expr("tk[_i + 1]").alias("w2"))
    )
    timed("1_bigrams_persist", lambda: bi.count())

    big_c = bi.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    uni_c = bi.groupBy(F.col("w1").alias("_u1")).agg(F.count("*").alias("c1"))
    vocab = toks.select(F.explode("tk").alias("w")).agg(
        F.countDistinct("w").alias("vocab")
    )
    timed("2_bigram_counts", lambda: noop(big_c))
    timed("3_context_counts", lambda: noop(uni_c))
    timed("4_vocab", lambda: vocab.first())

    joined = (
        bi.join(F.broadcast(big_c), ["w1", "w2"])
        .join(F.broadcast(uni_c), F.col("w1") == F.col("_u1"))
        .join(F.broadcast(vocab))
    )
    lp_dec = (
        F.log((F.col("c12") + 1).cast("double"))
        - F.log((F.col("c1") + F.col("vocab")).cast("double"))
    ).cast("decimal(38,18)")
    lp_dbl = F.log((F.col("c12") + 1).cast("double")) - F.log(
        (F.col("c1") + F.col("vocab")).cast("double")
    )
    for label, lp in (("5_score_decimal", lp_dec), ("6_score_double", lp_dbl)):
        agg = (
            joined.select("doc_id", lp.alias("lp"))
            .groupBy("doc_id")
            .agg(
                F.count("*").alias("n_bigrams"),
                F.round(F.sum("lp").cast("double") / F.count("*"), 6).alias(
                    "avg_logprob"
                ),
            )
        )
        timed(label, lambda a=agg: noop(a))

    release_tracked_caches()
    from filesystemagent_spark.queries import registry

    timed(
        "7_full_query",
        lambda: registry()["doc_bigram_logprob"].fn(spark, sf_dir).count(),
    )
    release_tracked_caches()
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
