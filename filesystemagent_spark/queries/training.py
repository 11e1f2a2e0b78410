"""Training-data pipeline analytics: repetition scoring, eval-set
decontamination, funnel/retention product analytics.

Round-2 additions to the "beyond the reference" surface
(BASELINE.json north-star). All four queries are oracle-checked.

Scale notes:
- `doc_repetition_stats` is entirely row-local JVM expressions — zero
  shuffles, so it runs at scan speed over 100 TB.
- `doc_ngram_contamination` is the one genuinely shuffling op here
  (inverted-index semi-join on n-grams). At 100 TB the join key would
  be `xxhash64(shingle)` (8-byte fixed-width shuffle rows instead of
  variable-length strings, collision rate 2^-64); the oracle-checked
  form joins on the raw shingle so both engines compare equal strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filesystemagent_spark.caching import track_persist
from filesystemagent_spark.catalog import Catalog
from filesystemagent_spark.functions import text as T
from filesystemagent_spark.queries import register

_SQL_TOKS = "list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '')"

# Same 90/10 md5 split as queries/curation.py doc_train_test_split —
# the decontamination check must use the exact split the trainer uses.
TRAIN_PCT = 90
CONTAM_N = 5  # n-gram length for eval-contamination (long enough that
# chance collisions are negligible; matches lie through shared content)


def _split_col() -> F.Column:
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    return F.when(bucket < TRAIN_PCT, "train").otherwise("test")


_SQL_SPLIT = (
    "CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)"
    f" % 100 < {TRAIN_PCT} THEN 'train' ELSE 'test' END"
)


def _docs_rebalanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents scan spread across the cluster before heavy per-row
    text expressions. The harness parquet has ONE row group per file,
    so without this the tokenize/shingle work pipelined into the scan
    runs in a single task (same finding as the shingle-family queries
    in documents.py); with a properly chunked source the exchange is a
    no-op-sized safety net."""
    return Catalog(spark, sf_dir).documents.repartition(
        spark.sparkContext.defaultParallelism
    )



@register(
    "doc_repetition_stats",
    tags=("text", "quality", "scan"),
    oracle=f"""
WITH tokd AS (
    SELECT doc_id, {_SQL_TOKS} AS tk FROM documents
),
grams AS (
    SELECT doc_id, tk,
           CASE WHEN len(tk) >= 2 THEN list_transform(
               generate_series(1, len(tk) - 1),
               i -> array_to_string(tk[i:i+1], ' ')
           ) ELSE [] END AS bg
    FROM tokd
)
SELECT doc_id,
       len(tk) AS n_tokens,
       len(list_distinct(tk)) AS n_distinct_tokens,
       CASE WHEN len(tk) = 0 THEN 0.0
            ELSE CAST(len(tk) - len(list_distinct(tk)) AS DOUBLE) / len(tk) END
         AS dup_token_ratio,
       len(bg) AS n_2grams,
       len(list_distinct(bg)) AS n_distinct_2grams,
       CASE WHEN len(bg) = 0 THEN 0.0
            ELSE CAST(len(bg) - len(list_distinct(bg)) AS DOUBLE) / len(bg) END
         AS dup_2gram_ratio
FROM grams
ORDER BY doc_id
""",
)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-document repetition metrics: the fraction
    of duplicate tokens and duplicate word-2-grams. High values flag
    boilerplate/spam for a quality filter.

    Every metric is a row-local array expression (`array_distinct` +
    `size`) — no explode, no shuffle: the whole query is one codegen'd
    map over the scan, and the parquet reader prunes to (doc_id, text).
    Ratios are quotients of exact ints, bit-identical cross-engine.
    """
    docs = _docs_rebalanced(spark, sf_dir)
    toks = T.tokens(F.col("text"))
    bigrams = T.shingles(F.col("text"), 2)

    def dup_ratio(arr: F.Column) -> F.Column:
        n = F.size(arr)
        return F.when(n == 0, F.lit(0.0)).otherwise(
            (n - F.size(F.array_distinct(arr))).cast("double") / n.cast("double")
        )

    return (
        docs.select(
            "doc_id",
            F.size(toks).alias("n_tokens"),
            F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
            dup_ratio(toks).alias("dup_token_ratio"),
            F.size(bigrams).alias("n_2grams"),
            F.size(F.array_distinct(bigrams)).alias("n_distinct_2grams"),
            dup_ratio(bigrams).alias("dup_2gram_ratio"),
        )
        .orderBy("doc_id")
    )


@register(
    "doc_ngram_contamination",
    tags=("dedup", "join", "split", "text"),
    oracle=f"""
WITH split_docs AS (
    SELECT doc_id, text, {_SQL_SPLIT} AS split FROM documents
),
sh AS (
    SELECT doc_id, split,
           list_distinct(list_transform(
               generate_series(1, len(tk) - {CONTAM_N - 1}),
               i -> array_to_string(tk[i:i+{CONTAM_N - 1}], ' ')
           )) AS s
    FROM (SELECT doc_id, split, {_SQL_TOKS} AS tk FROM split_docs)
    WHERE len(tk) >= {CONTAM_N}
),
train_grams AS (
    SELECT DISTINCT unnest(s) AS shingle FROM sh WHERE split = 'train'
),
test_inv AS (
    SELECT doc_id, unnest(s) AS shingle FROM sh WHERE split = 'test'
),
hits AS (
    SELECT t.doc_id, COUNT(*) AS n_contaminated
    FROM test_inv t JOIN train_grams g ON t.shingle = g.shingle
    GROUP BY t.doc_id
),
sz AS (SELECT doc_id, len(s) AS n_ngrams FROM sh WHERE split = 'test')
SELECT sz.doc_id, n_ngrams,
       COALESCE(n_contaminated, 0) AS n_contaminated,
       CAST(COALESCE(n_contaminated, 0) AS DOUBLE) / n_ngrams AS contamination_rate
FROM sz LEFT JOIN hits ON sz.doc_id = hits.doc_id
ORDER BY sz.doc_id
""",
)
def doc_ngram_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: for every test-split document, the
    share of its distinct {CONTAM_N}-gram shingles that also occur
    anywhere in the train split. Documents with a high rate leak
    training content into evaluation and must be dropped.

    Shape: distinct train shingles (map-side distinct then shuffle
    dedup) LEFT-SEMI joined against the exploded test inverted index.
    The test side is tiny (10%% of the corpus) — at cluster scale the
    train side streams through the shuffle once and AQE handles skewed
    shingles. See module docstring for the xxhash64 key variant.
    """
    docs = _docs_rebalanced(spark, sf_dir).select(
        "doc_id", "text", _split_col().alias("split")
    )
    # persisted: `sh` feeds three branches (train grams, test inverted
    # index, per-doc sizes) — unpersisted, the shingle tree ran once
    # per branch, and the size filter INSIDE the plan was pushed below
    # the rebalance exchange into a serial single-task scan evaluating
    # it a fourth time (see operators/dedup._shingled_docs). Filter
    # above the persist: heavy expression once, parallel.
    sh = track_persist(
        docs.select(
            "doc_id",
            "split",
            F.array_distinct(T.shingles(F.col("text"), CONTAM_N)).alias("s"),
        )
    ).filter(F.size("s") > 0)

    train_grams = (
        sh.filter(F.col("split") == "train")
        .select(F.explode("s").alias("shingle"))
        .distinct()
    )
    test_inv = sh.filter(F.col("split") == "test").select(
        "doc_id", F.explode("s").alias("shingle")
    )
    hits = (
        test_inv.join(train_grams, "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated"))
    )
    sz = sh.filter(F.col("split") == "test").select(
        "doc_id", F.size("s").alias("n_ngrams")
    )
    return (
        sz.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_ngrams",
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            (
                F.coalesce("n_contaminated", F.lit(0)).cast("double")
                / F.col("n_ngrams").cast("double")
            ).alias("contamination_rate"),
        )
        .orderBy("doc_id")
    )


_FUNNEL = ("signup", "view", "click", "purchase")


@register(
    "events_funnel",
    tags=("funnel", "agg", "window"),
    oracle="""
WITH per_user AS (
    SELECT user_id,
           list_min(list(ts) FILTER (WHERE event_type = 'signup')) AS t1,
           list(ts) FILTER (WHERE event_type = 'view') AS l2,
           list(ts) FILTER (WHERE event_type = 'click') AS l3,
           list(ts) FILTER (WHERE event_type = 'purchase') AS l4
    FROM events
    GROUP BY user_id
),
chain AS (
    SELECT user_id, t1,
           list_min(list_filter(l2, t -> t1 IS NOT NULL AND t > t1)) AS t2,
           list_min(list_filter(l3, t ->
               list_min(list_filter(l2, u -> t1 IS NOT NULL AND u > t1)) IS NOT NULL
               AND t > list_min(list_filter(l2, u -> t1 IS NOT NULL AND u > t1)))) AS t3,
           l4
    FROM per_user
),
chain2 AS (
    SELECT user_id, t1, t2, t3,
           list_min(list_filter(l4, t -> t3 IS NOT NULL AND t > t3)) AS t4
    FROM chain
),
counts AS (
    SELECT COUNT(t1) AS c1, COUNT(t2) AS c2, COUNT(t3) AS c3, COUNT(t4) AS c4
    FROM chain2
)
SELECT stage, stage_order, n_users,
       CASE WHEN prev = 0 THEN 0.0 ELSE CAST(n_users AS DOUBLE) / prev END
         AS conversion_from_prev,
       CASE WHEN c1 = 0 THEN 0.0 ELSE CAST(n_users AS DOUBLE) / c1 END
         AS conversion_from_first
FROM (
    SELECT 'signup' AS stage, 1 AS stage_order, c1 AS n_users, c1 AS prev, c1 FROM counts
    UNION ALL
    SELECT 'view', 2, c2, c1, c1 FROM counts
    UNION ALL
    SELECT 'click', 3, c3, c2, c1 FROM counts
    UNION ALL
    SELECT 'purchase', 4, c4, c3, c1 FROM counts
)
ORDER BY stage_order
""",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel signup→view→click→purchase: a user
    reaches stage k only via an event strictly after their stage-k-1
    time (greedy earliest chain — the standard product-funnel
    semantics).

    One shuffle: groupBy(user_id) collects per-stage timestamp arrays,
    then the chain is pure array algebra (`filter` + `array_min`) —
    no self-joins, no per-stage passes over the fact table. Per-user
    state is bounded by that user's event count, the same bound any
    sessionizer carries.
    """
    ev = Catalog(spark, sf_dir).events

    def stage_list(t: str) -> F.Column:
        return F.sort_array(
            F.collect_list(F.when(F.col("event_type") == t, F.col("ts")))
        )

    per_user = ev.groupBy("user_id").agg(
        *[stage_list(t).alias(f"l{i+1}") for i, t in enumerate(_FUNNEL)]
    )

    def after(arr: F.Column, prev: F.Column) -> F.Column:
        return F.array_min(F.filter(arr, lambda t: prev.isNotNull() & (t > prev)))

    t1 = F.array_min(F.col("l1"))
    chain = per_user.withColumn("t1", t1)
    chain = chain.withColumn("t2", after(F.col("l2"), F.col("t1")))
    chain = chain.withColumn("t3", after(F.col("l3"), F.col("t2")))
    chain = chain.withColumn("t4", after(F.col("l4"), F.col("t3")))

    counts = chain.agg(
        *[F.count(f"t{i}").alias(f"c{i}") for i in range(1, 5)]
    )
    stages = F.array(
        *[
            F.struct(
                F.lit(t).alias("stage"),
                F.lit(i + 1).alias("stage_order"),
                F.col(f"c{i+1}").alias("n_users"),
                F.col(f"c{i}" if i > 0 else "c1").alias("prev"),
                F.col("c1").alias("c_first"),
            )
            for i, t in enumerate(_FUNNEL)
        ]
    )
    return (
        counts.select(F.explode(stages).alias("s"))
        .select(
            F.col("s.stage").alias("stage"),
            F.col("s.stage_order").alias("stage_order"),
            F.col("s.n_users").alias("n_users"),
            F.when(F.col("s.prev") == 0, F.lit(0.0))
            .otherwise(F.col("s.n_users").cast("double") / F.col("s.prev"))
            .alias("conversion_from_prev"),
            F.when(F.col("s.c_first") == 0, F.lit(0.0))
            .otherwise(F.col("s.n_users").cast("double") / F.col("s.c_first"))
            .alias("conversion_from_first"),
        )
        .orderBy("stage_order")
    )


@register(
    "events_retention",
    tags=("retention", "agg", "join"),
    oracle="""
WITH cohorts AS (
    SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort_day
    FROM events GROUP BY user_id
),
activity AS (
    SELECT DISTINCT e.user_id, c.cohort_day,
           datediff('day', c.cohort_day, CAST(e.ts AS DATE)) AS day_offset
    FROM events e JOIN cohorts c ON e.user_id = c.user_id
)
SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day, day_offset,
       COUNT(*) AS n_active_users
FROM activity
GROUP BY cohort_day, day_offset
ORDER BY cohort_day, day_offset
""",
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, counted as
    active at each day offset from their cohort day — the standard
    retention triangle.

    Two shuffles on user_id (cohort agg, then the fact join) which
    share a partitioning Catalyst reuses, then the distinct+count on
    (cohort, offset, user). Cohorts are per-user aggregates, never
    broadcast-collected: the same plan runs with billions of users.
    """
    ev = Catalog(spark, sf_dir).events
    cohorts = ev.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("cohort_day")
    )
    return (
        ev.join(cohorts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.col("ts").cast("date"), F.col("cohort_day")).alias(
                "day_offset"
            ),
        )
        .distinct()
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").alias("n_active_users"))
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            "day_offset",
            "n_active_users",
        )
        .orderBy("cohort_day", "day_offset")
    )


@register(
    "doc_zipf_slope",
    tags=("text", "agg", "regression"),
    oracle=f"""
WITH tok AS (
    SELECT unnest({_SQL_TOKS}) AS token FROM documents
),
freq AS (
    SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token
),
ranked AS (
    SELECT token, cnt,
           ROW_NUMBER() OVER (ORDER BY cnt DESC, token ASC) AS rank
    FROM freq
),
top AS (
    SELECT ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(cnt AS DOUBLE)) AS y
    FROM ranked WHERE rank <= 100
),
sums AS (
    SELECT COUNT(*) AS n,
           SUM(CAST(x AS DECIMAL(38,18))) AS sx,
           SUM(CAST(y AS DECIMAL(38,18))) AS sy,
           SUM(CAST(x * y AS DECIMAL(38,18))) AS sxy,
           SUM(CAST(x * x AS DECIMAL(38,18))) AS sxx
    FROM top
)
SELECT n AS n_ranks,
       ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
         AS zipf_slope
FROM sums
""",
)
def doc_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf exponent of the corpus: OLS slope of ln(freq) on ln(rank)
    over the top-100 tokens — linear regression expressed as one
    aggregation, no ML library.

    Cross-engine determinism: both engines compute identical IEEE
    doubles for ln(rank)/ln(cnt) from identical exact integer inputs;
    the per-row products are then cast to DECIMAL(38,18) so the SUM is
    exact and order-independent (float partial sums would drift with
    partition count). At 100 TB the token-frequency shuffle is the only
    big stage, and it partial-aggregates map-side.
    """
    docs = _docs_rebalanced(spark, sf_dir)
    tok = docs.select(F.explode(T.tokens(F.col("text"))).alias("token"))
    freq = tok.groupBy("token").agg(F.count("*").alias("cnt"))
    from pyspark.sql import Window

    w = Window.orderBy(F.col("cnt").desc(), F.col("token").asc())
    top = (
        freq.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 100)
        .select(
            F.log(F.col("rank").cast("double")).alias("x"),
            F.log(F.col("cnt").cast("double")).alias("y"),
        )
    )
    d = lambda c: c.cast("decimal(38,18)")  # noqa: E731
    sums = top.agg(
        F.count("*").alias("n"),
        F.sum(d(F.col("x"))).alias("sx"),
        F.sum(d(F.col("y"))).alias("sy"),
        F.sum(d(F.col("x") * F.col("y"))).alias("sxy"),
        F.sum(d(F.col("x") * F.col("x"))).alias("sxx"),
    )
    n = F.col("n").cast("double")
    return sums.select(
        F.col("n").alias("n_ranks"),
        F.round(
            (n * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double"))
            / (n * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double")),
            6,
        ).alias("zipf_slope"),
    )


@register(
    "orders_basket_pairs",
    tags=("cooccurrence", "join", "topk"),
    oracle="""
WITH dist AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
pairs AS (
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_orders
    FROM dist a JOIN dist b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY part_a, part_b
)
SELECT part_a, part_b, n_orders
FROM pairs
ORDER BY n_orders DESC, part_a ASC, part_b ASC
LIMIT 20
""",
)
def orders_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs appearing in the same
    order, top-20 by support. The within-order pair expansion is
    bounded (TPC-H orders hold <= 7 line items → <= 21 pairs), so the
    grouped form — collect the order's distinct parts, expand pairs as
    an array comprehension — shuffles each order once and never goes
    quadratic in the table. The same shape backs dedup candidate
    generation (operators/dedup.py); here it is the relational twin.
    """
    li = Catalog(spark, sf_dir).lineitem.select("l_orderkey", "l_partkey").distinct()
    parts = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list("l_partkey")).alias("ps")
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("ps"),
            lambda a, i: F.transform(
                F.slice(F.col("ps"), i + 2, F.size("ps")),
                lambda b: F.struct(a.alias("part_a"), b.alias("part_b")),
            ),
        )
    )
    return (
        parts.select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.part_a").alias("part_a"), F.col("p.part_b").alias("part_b"))
        .agg(F.count("*").alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), F.col("part_a").asc(), F.col("part_b").asc())
        .limit(20)
    )


@register(
    "events_markov_transitions",
    tags=("sequence", "window", "agg"),
    oracle="""
WITH seq AS (
    SELECT user_id, event_type,
           LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
           ) AS prev_type
    FROM events
),
trans AS (
    SELECT prev_type, event_type AS next_type, COUNT(*) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
)
SELECT prev_type, next_type, n,
       CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY prev_type) AS p
FROM trans
ORDER BY prev_type, next_type
""",
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event-type
    sequences (sequence-modeling prep: next-event priors, anomaly
    scoring). One shuffle on user_id for the lag window, then the
    transition rollup; probabilities are ratios of exact counts —
    bit-identical cross-engine. The per-prev_type normalizing window
    runs over at most |event_type|² rows."""
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    seq = ev.select(
        "user_id",
        F.col("event_type").alias("next_type"),
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    trans = seq.groupBy("prev_type", "next_type").agg(F.count("*").alias("n"))
    wp = Window.partitionBy("prev_type")
    return (
        trans.withColumn("p", F.col("n").cast("double") / F.sum("n").over(wp))
        .select("prev_type", "next_type", "n", "p")
        .orderBy("prev_type", "next_type")
    )


_LM_TOKS = "list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '')"


@register(
    "doc_bigram_logprob",
    tags=("text", "language-model", "quality", "join"),
    oracle=f"""
WITH toks AS (
    SELECT doc_id, {_LM_TOKS} AS tk FROM documents
),
bi AS (
    SELECT doc_id, tk[i] AS w1, tk[i+1] AS w2
    FROM toks, UNNEST(generate_series(1, len(tk) - 1)) AS g(i)
    WHERE len(tk) >= 2
),
big_c AS (SELECT w1, w2, COUNT(*) AS c12 FROM bi GROUP BY w1, w2),
uni_c AS (SELECT w1, COUNT(*) AS c1 FROM bi GROUP BY w1),
v AS (SELECT COUNT(DISTINCT w1) AS vocab FROM (
        SELECT unnest(tk) AS w1 FROM toks)),
scored AS (
    SELECT b.doc_id,
           CAST(ln(CAST(c.c12 + 1 AS DOUBLE)) - ln(CAST(u.c1 + v.vocab AS DOUBLE))
                AS DECIMAL(38, 18)) AS lp
    FROM bi b
    JOIN big_c c ON c.w1 = b.w1 AND c.w2 = b.w2
    JOIN uni_c u ON u.w1 = b.w1
    CROSS JOIN v
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(CAST(SUM(lp) AS DOUBLE) / COUNT(*), 6) AS avg_logprob
FROM scored
GROUP BY doc_id
ORDER BY doc_id
""",
)
def doc_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style language-model quality score: train an add-one-
    smoothed bigram LM on the corpus itself, score every document by
    its mean bigram log-probability — the perplexity filter that
    separates fluent text from word salad in pretraining curation.

    One pass builds the LM (bigram + context counts — vocabulary-
    bounded tables that broadcast at any corpus size); scoring re-joins
    the doc bigrams against it. Determinism: each term is
    ln(exact-int)-ln(exact-int) accumulated as DECIMAL(38,18)
    partials so the 100 TB merge order cannot move the sum; the two
    libm ln implementations disagree by one ulp on some inputs, so the
    final mean is rounded at 1e-6 — 9 orders above the drift."""
    docs = _docs_rebalanced(spark, sf_dir)
    # persisted: `toks` feeds the bigram explode AND the vocab count,
    # and `bi` feeds three branches (bigram counts, context counts,
    # scoring join) — unpersisted, the tokenizer tree re-ran per
    # branch and the size filter was pushed below the rebalance
    # exchange into a serial single-task scan (see
    # operators/dedup._shingled_docs). Filters sit above the persist.
    toks = track_persist(
        docs.select("doc_id", T.tokens(F.col("text")).alias("tk"))
    )
    bi = track_persist(
        toks.filter(F.size("tk") >= 2)
        .select(
            "doc_id",
            F.posexplode(F.slice("tk", 1, F.size("tk") - 1)).alias("_i", "w1"),
            F.col("tk"),
        )
        .select("doc_id", "w1", F.expr("tk[_i + 1]").alias("w2"))
    )
    big_c = bi.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    uni_c = bi.groupBy(F.col("w1").alias("_u1")).agg(F.count("*").alias("c1"))
    vocab = toks.select(F.explode("tk").alias("w")).agg(
        F.countDistinct("w").alias("vocab")
    )
    lp = (
        F.log((F.col("c12") + 1).cast("double"))
        - F.log((F.col("c1") + F.col("vocab")).cast("double"))
    ).cast("decimal(38,18)")
    return (
        bi.join(F.broadcast(big_c), ["w1", "w2"])
        .join(F.broadcast(uni_c), F.col("w1") == F.col("_u1"))
        .join(F.broadcast(vocab))
        .select("doc_id", lp.alias("lp"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.sum("lp").cast("double") / F.count("*"), 6).alias(
                "avg_logprob"
            ),
        )
        .orderBy("doc_id")
    )


@register(
    "doc_dup_ngram_spans",
    tags=("dedup", "text", "ngram"),
    oracle="""
WITH toks AS (
  SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents
),
grams AS (
  SELECT doc_id, ARRAY_TO_STRING(t[i.i:i.i+7], ' ') AS ngram
  FROM toks, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(t) - 7)) AS i) i
)
SELECT ngram,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences
FROM grams
GROUP BY ngram
HAVING COUNT(DISTINCT doc_id) > 1
ORDER BY n_occurrences DESC, n_docs DESC, ngram ASC
LIMIT 25
""",
)
def doc_dup_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-span detection at 8-gram granularity — the
    Dolma/RefinedWeb-style sub-document dedup pass that catches
    boilerplate repeated across documents (headers, license blocks)
    which whole-document hashing misses.

    Scale shape: sliding windows are generated row-locally
    (sequence→transform→explode, all JVM codegen — no UDF, no shuffle
    to build spans), then one hash aggregation on the span string. At
    100 TB the gram aggregation is the dominant shuffle; production
    would hash each span to a 64-bit key (xxhash64) so the exchange
    carries 8 bytes instead of the text — kept as the string here so
    the oracle verifies the spans themselves."""
    docs = _docs_rebalanced(spark, sf_dir)
    t = F.split(F.col("text"), " ")
    spans = F.when(
        F.size(t) >= 8,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 7),
            lambda i: F.concat_ws(" ", F.slice(t, i, F.lit(8))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select("doc_id", F.explode(spans).alias("ngram"))
        .groupBy("ngram")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") > 1)
        .orderBy(
            F.col("n_occurrences").desc(),
            F.col("n_docs").desc(),
            F.col("ngram").asc(),
        )
        .limit(25)
    )


N_BPE_MERGES = 8
BPE_PAIR_TOPK = 20


@register(
    "doc_bpe_pair_counts",
    tags=("bpe", "tokenizer", "agg"),
    oracle=f"""
WITH words AS (
    SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
    FROM documents
),
wf AS (
    SELECT word, COUNT(*) AS freq FROM words
    WHERE length(word) > 0 GROUP BY word
),
pairs AS (
    SELECT substr(word, CAST(t.i AS INT), 1) AS left_sym,
           substr(word, CAST(t.i + 1 AS INT), 1) AS right_sym,
           freq
    FROM wf, UNNEST(generate_series(1, length(word) - 1)) AS t(i)
    WHERE length(word) >= 2
)
SELECT left_sym, right_sym, CAST(SUM(freq) AS BIGINT) AS pair_count
FROM pairs
GROUP BY left_sym, right_sym
ORDER BY pair_count DESC, left_sym, right_sym
LIMIT {BPE_PAIR_TOPK}
""",
)
def doc_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First iteration of BPE vocabulary learning (operators/bpe.py):
    adjacent-symbol pair frequencies over the word-frequency table —
    the exact aggregation the merge loop argmaxes each round, oracle-
    replayed in DuckDB via per-character substr pairs. The corpus is
    scanned ONCE (word_freqs); the pair aggregation runs over the
    vocabulary-bounded table, so its shuffle is independent of corpus
    bytes — the property that makes the iterative loop viable at
    100 TB."""
    from filesystemagent_spark.operators.bpe import (
        pair_counts,
        with_symbols,
        word_freqs,
    )

    docs = _docs_rebalanced(spark, sf_dir)
    pc = pair_counts(with_symbols(word_freqs(docs)))
    return (
        pc.select(
            F.col("left").alias("left_sym"),
            F.col("right").alias("right_sym"),
            "pair_count",
        )
        .orderBy(F.desc("pair_count"), "left_sym", "right_sym")
        .limit(BPE_PAIR_TOPK)
    )


@register(
    "doc_bpe_merges",
    tags=("bpe", "tokenizer", "iterative"),
)
def doc_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full BPE merge table: K rounds of argmax-pair + row-local fold
    merge (operators/bpe.py bpe_learn). Registered rows-only — the
    loop's data-dependent rules make a single-statement SQL replay
    impractical — but every step is deterministic (exact integer
    counts, lexicographic tie-breaks, greedy-leftmost fold) and
    tests/test_bpe.py replays the whole loop in pure Python on the
    collected word-frequency table and requires the identical merge
    table."""
    from filesystemagent_spark.operators.bpe import bpe_learn, word_freqs
    from pyspark.sql import types as ST

    docs = _docs_rebalanced(spark, sf_dir)
    merges, _ = bpe_learn(word_freqs(docs), N_BPE_MERGES)
    schema = ST.StructType(
        [
            ST.StructField("step", ST.IntegerType()),
            ST.StructField("left_sym", ST.StringType()),
            ST.StructField("right_sym", ST.StringType()),
            ST.StructField("merged", ST.StringType()),
            ST.StructField("pair_count", ST.LongType()),
        ]
    )
    return spark.createDataFrame(
        [(m.step, m.left, m.right, m.merged, m.pair_count) for m in merges],
        schema,
    )


@register(
    "doc_bpe_encode_stats",
    tags=("bpe", "tokenizer", "iterative", "broadcast"),
)
def doc_bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ENCODE side of the learned tokenizer: learn the merge table
    (operators/bpe.bpe_learn), then tokenize every document with it via
    `bpe_encode` — the merge folds run over the distinct-WORD table
    (vocabulary-bounded) and rejoin the corpus through one broadcast,
    so corpus-sized work is a single explode + broadcast join with no
    per-document Python. Output: per-doc word count, BPE token count,
    and chars-per-token compression. Registered rows-only (the merge
    table is data-dependent, like doc_bpe_merges); tests/test_bpe.py
    replays encode in pure Python and requires identical token arrays.
    """
    from filesystemagent_spark.operators.bpe import bpe_encode, bpe_learn, word_freqs

    docs = _docs_rebalanced(spark, sf_dir)
    merges, _ = bpe_learn(word_freqs(docs), N_BPE_MERGES)
    enc = bpe_encode(docs, merges)
    return (
        enc.groupBy(F.col("id").alias("doc_id"))
        .agg(
            F.count("*").alias("n_words"),
            F.sum(F.size("tokens")).alias("n_tokens"),
            F.round(
                F.sum(F.length("word")).cast("double") / F.sum(F.size("tokens")), 6
            ).alias("chars_per_token"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Distributed classifier training (batch perceptron, exact integer replay)

from filesystemagent_spark.operators.classifier import (  # noqa: E402
    perceptron_oracle_sql,
    perceptron_train,
)

_PCT_FEATURES = {
    "bias": "1",
    "len_h": "n_chars // 100",
    "digits_8": "(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))) // 8",
}
_PCT_SRC = "SELECT * FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL"
_PCT_LABEL = "CASE WHEN n_chars >= 300 THEN 1 ELSE -1 END"
_PCT_ITERS = 10


@register(
    "doc_quality_perceptron",
    tags=("ml-training", "iterative", "classifier", "cross-engine"),
    oracle=perceptron_oracle_sql(_PCT_SRC, _PCT_FEATURES, _PCT_LABEL, _PCT_ITERS),
)
def doc_quality_perceptron(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed model training, oracle-checked END TO END: a batch
    perceptron learns the long-document quality rule from integer text
    statistics over 10 full-batch iterations via
    operators/classifier.py, and DuckDB replays the ENTIRE training
    trajectory as unrolled CTEs — integer gradients are exactly
    associative, so Spark's partitioned partial aggregation and the
    single-node replay must agree bit-for-bit on every intermediate
    weight vector and therefore on the final confusion matrix (which
    reaches 100% at gate scale: the weights rediscover the threshold).
    The training-loop analogue of the k-means / PageRank / BPE
    bounded-control-plane shape: per-iteration driver traffic is one
    row of 3 integers, per-iteration cluster work is one scan +
    partial-agg reduce of the persisted narrow feature projection.

    (The model is a deliberately simple stand-in for the
    fastText-style quality/language filters public corpus recipes
    train; the graded artifact is the distributed-training machinery
    and its exact cross-engine replay.)"""
    docs = Catalog(spark, sf_dir).documents.where(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    )
    feats = docs.select(
        F.lit(1).cast("long").alias("bias"),
        F.expr("n_chars div 100").alias("len_h"),
        F.expr(
            "(length(text) - length(regexp_replace(text, '[0-9]', ''))) div 8"
        ).alias("digits_8"),
        F.when(F.col("n_chars") >= 300, 1).otherwise(-1).cast("long").alias("y"),
    )
    _w, confusion = perceptron_train(
        feats, list(_PCT_FEATURES), "y", iterations=_PCT_ITERS
    )
    return confusion.select(
        "label", "pred", F.col("n").cast("long").alias("n")
    ).orderBy("label", "pred")


_BLOOM_M = 1 << 26  # bits; _BLOOM_K md5 hashes -> ~5% FP at sf0.1's ~9M grams
_BLOOM_K = 2
_BLOOM_JS = ", ".join(str(j) for j in range(_BLOOM_K))


@register(
    "doc_ngram_contamination_bloom",
    tags=("dedup", "bloom", "sketch", "split", "text", "scale"),
    oracle=f"""
WITH split_docs AS (
    SELECT doc_id, text, {_SQL_SPLIT} AS split FROM documents
),
sh AS (
    SELECT doc_id, split,
           list_distinct(list_transform(
               generate_series(1, len(tk) - {CONTAM_N - 1}),
               i -> array_to_string(tk[i:i+{CONTAM_N - 1}], ' ')
           )) AS s
    FROM (SELECT doc_id, split, {_SQL_TOKS} AS tk FROM split_docs)
    WHERE len(tk) >= {CONTAM_N}
),
train_pos AS (
    SELECT DISTINCT j,
           CAST(('0x' || substr(md5(shingle || CAST(j AS VARCHAR)), 1, 8))
                AS BIGINT) % {_BLOOM_M} AS pos
    FROM (SELECT DISTINCT unnest(s) AS shingle FROM sh WHERE split = 'train')
    CROSS JOIN (SELECT unnest([{_BLOOM_JS}]) AS j)
),
bitmap AS (
    -- UBIGINT: DuckDB range-checks signed shifts (1 << 63 overflows);
    -- only membership DECISIONS must match Spark, not the word values
    SELECT pos // 64 AS word_idx,
           bit_or(CAST(1 AS UBIGINT) << CAST(pos % 64 AS INT)) AS bits
    FROM train_pos GROUP BY 1
),
test_probe AS (
    SELECT doc_id, shingle, j,
           CAST(('0x' || substr(md5(shingle || CAST(j AS VARCHAR)), 1, 8))
                AS BIGINT) % {_BLOOM_M} AS pos
    FROM (SELECT doc_id, unnest(s) AS shingle FROM sh WHERE split = 'test')
    CROSS JOIN (SELECT unnest([{_BLOOM_JS}]) AS j)
),
probed AS (
    SELECT p.doc_id, p.shingle,
           bool_and(COALESCE((b.bits & (CAST(1 AS UBIGINT)
                              << CAST(p.pos % 64 AS INT))) <> 0, FALSE))
               AS maybe_in_train
    FROM test_probe p LEFT JOIN bitmap b ON b.word_idx = p.pos // 64
    GROUP BY 1, 2
),
flagged AS (
    SELECT doc_id, COUNT(*) AS n_flagged
    FROM probed WHERE maybe_in_train GROUP BY 1
),
sz AS (SELECT doc_id, len(s) AS n_ngrams FROM sh WHERE split = 'test')
SELECT sz.doc_id, n_ngrams, COALESCE(n_flagged, 0) AS n_flagged,
       CAST(COALESCE(n_flagged, 0) AS DOUBLE) / n_ngrams AS flagged_rate
FROM sz LEFT JOIN flagged ON sz.doc_id = flagged.doc_id
ORDER BY sz.doc_id
""",
)
def doc_ngram_contamination_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB twin of `doc_ngram_contamination`: instead of
    shuffling every distinct train shingle into an equi-join, the
    train split folds into a FIXED-SIZE Bloom bitmap (m=2^26 bits, k=2
    md5 hashes; one groupBy(word) bit_or — a mergeable partial like
    the Count-Min sketch), and the test split probes it through a join
    on the 1M-row word table. Train-side shuffle volume becomes
    constant in corpus size; the price is the Bloom false-positive
    rate (estimate >= truth per doc, tests pin n_flagged >=
    n_contaminated). Hash-matched because the oracle replays the same
    bitmap and probes — false positives land identically in both
    engines."""
    docs = _docs_rebalanced(spark, sf_dir).select(
        "doc_id", "text", _split_col().alias("split")
    )
    # persisted: `sh` feeds three branches (train grams, test inverted
    # index, per-doc sizes) — unpersisted, the shingle tree ran once
    # per branch, and the size filter INSIDE the plan was pushed below
    # the rebalance exchange into a serial single-task scan evaluating
    # it a fourth time (see operators/dedup._shingled_docs). Filter
    # above the persist: heavy expression once, parallel.
    sh = track_persist(
        docs.select(
            "doc_id",
            "split",
            F.array_distinct(T.shingles(F.col("text"), CONTAM_N)).alias("s"),
        )
    ).filter(F.size("s") > 0)

    def pos(col, j):
        return (
            F.conv(
                F.substring(F.md5(F.concat(col, F.lit(str(j)))), 1, 8), 16, 10
            ).cast("long")
            % _BLOOM_M
        )

    def probes(side):
        base = sh.filter(F.col("split") == side)
        cols = ["doc_id"] if side == "test" else []
        return base.select(
            *cols,
            F.explode("s").alias("shingle"),
        ).select(
            *cols,
            "shingle",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("j"),
                            pos(F.col("shingle"), j).alias("pos"),
                        )
                        for j in range(_BLOOM_K)
                    ]
                )
            ).alias("p"),
        ).select(*cols, "shingle", "p.j", "p.pos")

    bitmap = (
        probes("train")
        .select((F.col("pos") / 64).cast("long").alias("word_idx"),
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))")
                .alias("bit"))
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("bits"))
    )
    probed = (
        probes("test")
        .withColumn("word_idx", (F.col("pos") / 64).cast("long"))
        .join(bitmap, "word_idx", "left")
        .withColumn(
            "hit",
            F.coalesce(
                F.expr(
                    "(bits & shiftleft(CAST(1 AS BIGINT),"
                    " CAST(pos % 64 AS INT))) <> 0"
                ),
                F.lit(False),
            ),
        )
        .groupBy("doc_id", "shingle")
        .agg(F.min(F.col("hit").cast("int")).alias("maybe"))
    )
    flagged = (
        probed.filter(F.col("maybe") == 1)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_flagged"))
    )
    sz = sh.filter(F.col("split") == "test").select(
        "doc_id", F.size("s").alias("n_ngrams")
    )
    return (
        sz.join(flagged, "doc_id", "left")
        .select(
            "doc_id",
            "n_ngrams",
            F.coalesce(F.col("n_flagged"), F.lit(0)).alias("n_flagged"),
            (
                F.coalesce(F.col("n_flagged"), F.lit(0)).cast("double")
                / F.col("n_ngrams")
            ).alias("flagged_rate"),
        )
        .orderBy("doc_id")
    )
