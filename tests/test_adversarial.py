"""Adversarial single-run checks for the two trickiest set-based
algorithms: migration rename allocation (global collision-freedom
under hostile `_N` name mixes) and FastSS fuzzy-pair recall (exact
equality with a brute-force Levenshtein model)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from filesystemagent_spark.operators.dedup import fuzzy_pairs_edit1
from filesystemagent_spark.plans import migration as M
from filesystemagent_spark.sources.listing import list_files


def test_rename_allocation_is_globally_collision_free(spark, tmp_path):
    """Hostile mix: incoming names that look like rename outputs
    (a_1, a_2, a_1_1), families that already have gaps and high
    counters on disk, dotfiles, and double extensions. Invariants:
    every planned dest is unique, none equals an existing path, and
    every incoming file gets exactly one row."""
    # NOTE: no dotfiles as SOURCES — Spark's file index skips ._-prefixed
    # files as hidden/metadata, so they never enter a listing-driven plan.
    incoming = [
        "a.txt", "a_1.txt", "a_2.txt", "a_1_1.txt",
        "b", "b_1", "a_10.txt", "e_0.txt",
        "c.tar.gz", "c_7.tar.gz", "d.txt",
    ]
    existing = ["a.txt", "a_3.txt", "b", "c.tar.gz", "e.txt", "d_9.txt"]
    src = tmp_path / "src"
    dest = tmp_path / "dst"
    for n in incoming:
        (src / n).parent.mkdir(parents=True, exist_ok=True)
        (src / n).write_bytes(b"x" + n.encode())
    for n in existing:
        (dest / n).parent.mkdir(parents=True, exist_ok=True)
        (dest / n).write_bytes(b"old")

    plan = M.plan_migration(
        list_files(spark, str(src)), str(dest), preserve_structure=False,
        conflict="rename", existing=list_files(spark, str(dest)),
    ).collect()

    dests = [r.dest for r in plan]
    assert len(plan) == len(incoming)
    assert len(dests) == len(set(dests)), f"duplicate dests: {sorted(dests)}"
    existing_paths = {str(dest / n) for n in existing}
    assert not (set(dests) & existing_paths), set(dests) & existing_paths
    assert all(r.action == "copy" for r in plan)

    # executing must place every byte where the plan said, losslessly
    M.execute_migration(spark.createDataFrame(plan, M.PLAN_SCHEMA)).count()
    for r in plan:
        with open(r.dest, "rb") as f:
            assert f.read() == b"x" + os.path.basename(r.src).encode()


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fuzzy_pairs_equal_bruteforce_model(spark):
    """FastSS output must equal the brute-force all-pairs model on a
    corpus packed with boundary cases: empty string, single chars,
    substitutions/insertions/deletions at every position, repeated
    chars, distance-2 decoys, and multibyte codepoints."""
    corpus = [
        "", "a", "b", "ab", "ba", "abc", "abd", "abcd", "bbcd", "acbc",
        "aaaa", "aaab", "aaba", "xyz", "xy", "yz", "xz",
        "résumé", "resume", "résumés",
        "small bolt", "small bol", "smal bolt", "small bolts", "smell bolt",
    ]
    df = spark.createDataFrame([(s,) for s in corpus], "name string").distinct()
    got = {
        (r.name_a, r.name_b, r.dist)
        for r in fuzzy_pairs_edit1(df, "name").collect()
    }
    uniq = sorted(set(corpus))
    expected = {
        (a, b, _lev(a, b))
        for i, a in enumerate(uniq)
        for b in uniq[i + 1:]
        if _lev(a, b) <= 1
    }
    assert got == expected


def test_fuzzy_pairs_model_on_random_corpus(spark):
    """Deterministic pseudo-random corpus (seeded) — broad coverage of
    the recall proof without hypothesis-per-example Spark jobs."""
    import random

    rng = random.Random(7)
    alpha = "abc"
    corpus = {
        "".join(rng.choice(alpha) for _ in range(rng.randint(0, 5)))
        for _ in range(80)
    }
    df = spark.createDataFrame([(s,) for s in corpus], "name string")
    got = {(r.name_a, r.name_b) for r in fuzzy_pairs_edit1(df, "name").collect()}
    uniq = sorted(corpus)
    expected = {
        (a, b)
        for i, a in enumerate(uniq)
        for b in uniq[i + 1:]
        if _lev(a, b) <= 1
    }
    assert got == expected
