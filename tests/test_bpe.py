"""BPE vocabulary learning (operators/bpe.py).

The merge loop's rules are data-dependent, so `doc_bpe_merges` is
rows-only in the driver contract; the correctness gate lives here — a
pure-Python reference BPE (greedy-leftmost merge, lexicographic
tie-break) replays the whole loop on the collected word-frequency
table and must produce the identical merge table.
"""

from __future__ import annotations

import pytest

from filesystemagent_spark.operators.bpe import (
    bpe_learn,
    merge_pair,
    pair_counts,
    with_symbols,
    word_freqs,
)

SF_DIR = "/root/testdata/sf0.001"


def _py_bpe(freqs: dict[str, int], n_merges: int, min_count: int = 2):
    """Reference implementation: dict-based Sennrich-style BPE."""
    vocab = {tuple(w): f for w, f in freqs.items()}
    merges = []
    for step in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        # argmax with (count desc, left asc, right asc) tie-break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_count:
            break
        merges.append((step, left, right, left + right, cnt))
        fused = left + right
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, f in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = fused
                else:
                    out.append(s)
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + f
        vocab = new_vocab
    return merges


def test_merge_pair_greedy_leftmost(spark):
    df = spark.createDataFrame(
        [("aaa", 1, ["a", "a", "a"]), ("aaaa", 1, ["a", "a", "a", "a"]),
         ("bab", 1, ["b", "a", "b"]), ("ab", 1, ["a", "b"])],
        "word string, freq long, syms array<string>",
    )
    got = {r["word"]: r["syms"] for r in merge_pair(df, "a", "a").collect()}
    assert got["aaa"] == ["aa", "a"]      # leftmost wins, no re-merge
    assert got["aaaa"] == ["aa", "aa"]    # non-overlapping pairs
    assert got["bab"] == ["b", "a", "b"]  # untouched
    got2 = {r["word"]: r["syms"] for r in merge_pair(df, "a", "b").collect()}
    assert got2["ab"] == ["ab"]
    assert got2["bab"] == ["b", "ab"]


def test_pair_counts_weighted(spark):
    df = spark.createDataFrame(
        [("ab", 3, ["a", "b"]), ("abb", 2, ["a", "b", "b"]), ("c", 9, ["c"])],
        "word string, freq long, syms array<string>",
    )
    got = {
        (r["left"], r["right"]): r["pair_count"]
        for r in pair_counts(df).collect()
    }
    assert got == {("a", "b"): 5, ("b", "b"): 2}


def test_bpe_learn_matches_python_replay(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    wf = word_freqs(docs)
    freqs = {r["word"]: r["freq"] for r in wf.collect()}
    assert freqs, "word_freqs produced an empty vocabulary"

    merges, final_syms = bpe_learn(wf, 6)
    expected = _py_bpe(freqs, 6)
    assert [
        (m.step, m.left, m.right, m.merged, m.pair_count) for m in merges
    ] == expected
    assert len(merges) == 6  # corpus is big enough that no early stop fires

    # final vocabulary: every word's symbols re-concatenate to the word
    bad = final_syms.selectExpr(
        "word", "concat_ws('', syms) AS rebuilt"
    ).filter("word <> rebuilt")
    assert bad.count() == 0


def test_bpe_early_stop_on_min_count(spark):
    wf = spark.createDataFrame([("ab", 1), ("cd", 1)], "word string, freq long")
    merges, _ = bpe_learn(wf, 5, min_count=2)
    assert merges == []  # no pair reaches min_count


def _py_encode(word: str, merges) -> list[str]:
    out = list(word)
    for _step, left, right, fused, _cnt in merges:
        new: list[str] = []
        for s in out:
            if new and new[-1] == left and s == right:
                new[-1] = fused
            else:
                new.append(s)
        out = new
    return out


def test_bpe_encode_matches_python_replay(spark):
    """Encode (bpe_apply through the vocab + broadcast rejoin) must
    tokenize every word occurrence exactly as the pure-Python greedy
    fold does, in document order."""
    import re

    from filesystemagent_spark.operators.bpe import bpe_encode

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    wf = word_freqs(docs)
    merges, _ = bpe_learn(wf, 6)
    mt = [(m.step, m.left, m.right, m.merged, m.pair_count) for m in merges]

    enc = bpe_encode(docs, merges)
    got = {
        (r["id"], r["pos"]): (r["word"], list(r["tokens"]))
        for r in enc.collect()
    }
    for row in docs.select("doc_id", "text").collect():
        words = re.findall("[a-z]+", (row["text"] or "").lower())
        for pos, w in enumerate(words):
            assert got[(row["doc_id"], pos)] == (w, _py_encode(w, mt)), (
                row["doc_id"],
                pos,
            )
    assert len(got) == sum(
        len(re.findall("[a-z]+", (r["text"] or "").lower()))
        for r in docs.select("text").collect()
    )


def test_bpe_encode_tokens_rebuild_words(spark):
    from filesystemagent_spark.operators.bpe import bpe_encode

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    merges, _ = bpe_learn(word_freqs(docs), 6)
    bad = (
        bpe_encode(docs, merges)
        .selectExpr("word", "concat_ws('', tokens) AS rebuilt")
        .filter("word <> rebuilt")
    )
    assert bad.count() == 0
