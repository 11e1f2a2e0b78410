"""BPE vocabulary learning as an iterative DataFrame operator.

The reference counts tokens with fixed rules (SURVEY §2.7 F-rows; our
``functions/text.py``); training pipelines additionally LEARN the
tokenizer — byte-pair encoding (Sennrich et al. 2016): repeatedly find
the most frequent adjacent symbol pair in the corpus and fuse it into a
new vocabulary symbol.

Scale shape (what makes this 100 TB-able):

- The loop runs over the WORD-FREQUENCY table, not the corpus: one
  corpus-sized aggregation up front, then every iteration touches only
  the vocabulary (bounded, ≪ corpus; Zipf makes it tiny relative to
  input bytes).
- Per-iteration shuffle is only the pair-count aggregation over that
  bounded table; map-side partial aggregation makes the exchanged
  state proportional to distinct pairs, not rows.
- The winning pair is ONE scalar row per iteration on the driver
  (like a k-means centroid update) — the merge application itself is a
  row-local ``aggregate`` fold over each word's symbol array, zero
  shuffle, zero Python.
- Lineage is truncated each round (localCheckpoint) so K iterations
  never stack K plans — the same rule the PageRank loop follows
  (operators/graph.py).

Determinism: pair counts are exact integer sums (merge-order
independent); ties break lexicographically on (left, right); the fold
is greedy-leftmost-nonoverlapping, the standard BPE semantics. A
pure-Python replay in tests/test_bpe.py must reproduce the merge table
exactly, and the first iteration's pair counts are oracle-matched
against DuckDB (`doc_bpe_pair_counts`).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WORD_RE = "[a-z]+"


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → (word, freq): the ONLY corpus-sized pass in BPE.

    Lowercased alphabetic words; everything after this aggregation is
    vocabulary-bounded.
    """
    return (
        docs.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(WORD_RE), F.lit(0)
                )
            ).alias("word")
        )
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def with_symbols(words: DataFrame) -> DataFrame:
    """(word, freq) → (word, freq, syms): initial symbol array = the
    word's characters (no end-of-word marker — documented simplification;
    adding one is a single `concat(syms, array(lit('</w>')))`)."""
    return words.withColumn("syms", F.split(F.col("word"), ""))


def pair_counts(syms_df: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies, weighted by word freq.

    `arrays_zip(syms[:-1], syms[1:])` materializes each word's adjacent
    pairs map-side; the only shuffle is the (left, right) aggregation.
    """
    n = F.size("syms")
    pairs = F.arrays_zip(
        F.slice(F.col("syms"), 1, n - 1).alias("l"),
        F.slice(F.col("syms"), 2, n - 1).alias("r"),
    )
    return (
        syms_df.where(n >= 2)
        .select("freq", F.explode(pairs).alias("p"))
        .groupBy(
            F.col("p.l").alias("left"), F.col("p.r").alias("right")
        )
        .agg(F.sum("freq").alias("pair_count"))
    )


def merge_pair(syms_df: DataFrame, left: str, right: str) -> DataFrame:
    """Apply one merge rule greedy-leftmost-nonoverlapping, row-local.

    A single `aggregate` fold per word: append each symbol unless the
    accumulator ends with `left` and the symbol is `right`, in which
    case the tail is replaced by the fused token. Fusing never creates
    a false re-match within the pass (the fused token `left||right`
    differs from `left` because `right` is non-empty), so the fold is
    exactly the repeated-leftmost-merge semantics of standard BPE.
    """
    l, r = F.lit(left), F.lit(right)
    fused = F.lit(left + right)
    folded = F.aggregate(
        "syms",
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, s: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == l) & (s == r),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(fused)),
        ).otherwise(F.concat(acc, F.array(s))),
    )
    return syms_df.withColumn("syms", folded)


@dataclass(frozen=True)
class Merge:
    step: int
    left: str
    right: str
    merged: str
    pair_count: int


def bpe_learn(
    words: DataFrame, n_merges: int, min_count: int = 2
) -> tuple[list[Merge], DataFrame]:
    """Learn up to ``n_merges`` BPE merges; returns (merge table, final
    symbolized vocabulary).

    Driver traffic is one scalar row per iteration (the argmax pair) —
    the same bounded-control-plane shape as k-means (similarity.py) and
    PageRank (graph.py). Stops early when no pair reaches ``min_count``.
    """
    syms_df = with_symbols(words).localCheckpoint(eager=True)
    merges: list[Merge] = []
    for step in range(1, n_merges + 1):
        top = (
            pair_counts(syms_df)
            .orderBy(F.desc("pair_count"), "left", "right")
            .limit(1)
            .collect()
        )
        if not top or top[0]["pair_count"] < min_count:
            break
        row = top[0]
        merges.append(
            Merge(step, row["left"], row["right"], row["left"] + row["right"],
                  int(row["pair_count"]))
        )
        prev = syms_df
        syms_df = merge_pair(syms_df, row["left"], row["right"]).localCheckpoint(
            eager=True
        )
        prev.unpersist()
    return merges, syms_df


def bpe_apply(vocab_words: DataFrame, merges: list[Merge]) -> DataFrame:
    """(word) -> (word, syms) after applying ``merges`` in training
    order — the ENCODE side of BPE, factored through the vocabulary.

    Each merge is the same row-local greedy-leftmost fold the learner
    uses (`merge_pair`), so encode is consistent-by-construction with
    training. Lineage is truncated every few merges: the fold nests
    one `aggregate` per merge inside a single projection, and a deep
    enough expression tree would blow codegen otherwise.
    """
    df = with_symbols(vocab_words)
    for i, m in enumerate(merges):
        df = merge_pair(df, m.left, m.right)
        if (i + 1) % 8 == 0:
            df = df.localCheckpoint(eager=False)
    return df


def bpe_encode(
    docs: DataFrame,
    merges: list[Merge],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize documents with a learned merge table. Returns
    (id, pos, word, tokens) — one row per word occurrence, ``tokens``
    the word's BPE symbol array, ``pos`` the word's position.

    Scale shape: BPE tokenization factors through WORDS, so the merge
    folds run over the distinct-word table (vocabulary-bounded — Zipf
    makes it tiny relative to corpus bytes), and the corpus-sized work
    is one tokenize-explode plus a BROADCAST join of word->tokens back
    onto the occurrence stream. No per-document Python; everything
    stays in codegen'd expressions plus one small broadcast.
    """
    words = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_RE), F.lit(0))
        ).alias("pos", "word"),
    )
    vocab = bpe_apply(words.select("word").distinct(), merges).withColumnRenamed(
        "syms", "tokens"
    )
    return words.join(F.broadcast(vocab), "word").select("id", "pos", "word", "tokens")
