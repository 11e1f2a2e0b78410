"""Hashing primitives: content hashes, MinHash permutations, SimHash.

The reference's dedup keys are chunked file-content SHA-256
(/root/reference/src/file_indexing_system.py:100-118) and 64-bit
perceptual hashes compared by Hamming distance
(/root/reference/src/media_fingerprinting.py:228-276). Here the same
roles are played by JVM-side hash expressions:

- exact keys:    md5/sha2 builtins over the content column;
- MinHash:       universal-hash permutations over xxhash64 shingle
                 hashes (same construction as Spark ML's MinHashLSH,
                 re-expressed as column expressions so it composes with
                 any DataFrame without VectorUDT ceremony);
- SimHash:       bitwise majority vote over token hashes, compared with
                 `bit_count(a ^ b)` — O(1) per pair, no arrays at
                 compare time.

Everything here is a pure Column expression: codegen-friendly, no
Python per row, safe at 100 TB.
"""

from __future__ import annotations

import random
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Largest prime below 2^31 (the one Spark ML's MinHashLSH uses).
# Products a*h stay below 2^62, so 64-bit arithmetic never overflows.
MINHASH_PRIME = 2038074743


def perm_params(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) universal-hash parameters."""
    rng = random.Random(seed)
    return [
        (rng.randint(1, MINHASH_PRIME - 1), rng.randint(0, MINHASH_PRIME - 1))
        for _ in range(num_hashes)
    ]


def _col_sql(c: Column | str) -> str:
    """SQL text of a column for expression-string assembly.

    The MinHash builders below generate their expression trees as ONE
    SQL string parsed JVM-side by `F.expr` instead of composing
    hundreds of Column objects: each Python-built higher-order
    function costs ~10–16 ms of py4j round-trips (measured: the
    64-permutation signature alone was ~0.3 s of DRIVER time per
    construction, ~2 s per minhash query plan), while parsing one
    string is a single round trip. The parsed tree is semantically
    identical — same functions, literals and types — so results are
    bit-identical (pinned by test_dedup's oracle replays and the
    sql-vs-column equality test).

    Only simple references are accepted: Spark 4's `node().sql()` is
    display text, not guaranteed-parseable SQL (operators print in
    prefix form), so anything beyond a bare column ref raises rather
    than risking silently different SQL. Callers with a computed
    column materialize it in a projection first — which is also the
    performant shape (see minhash_signature_from_hashes's note on CSE).
    """
    if isinstance(c, str):
        return f"`{c}`"
    sql = c._jc.node().sql()
    if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", sql):
        return f"`{sql}`"
    raise TypeError(
        f"expression-string builder needs a column name or simple reference, "
        f"got {sql!r}; alias the expression in a projection and pass its name"
    )


def _shingle_hashes_sql(shingles_sql: str) -> str:
    return (
        f"transform({shingles_sql}, "
        f"__mh_s -> pmod(xxhash64(__mh_s), {MINHASH_PRIME}))"
    )


def _shingle_hashes_md5_sql(shingles_sql: str) -> str:
    return (
        f"transform({shingles_sql}, "
        f"__mh_s -> pmod(CAST(conv(substring(md5(__mh_s), 1, 15), 16, 10)"
        f" AS BIGINT), {MINHASH_PRIME}))"
    )


def shingle_hashes(shingles: Column | str) -> Column:
    """Map string shingles to non-negative ints below the prime."""
    return F.expr(_shingle_hashes_sql(_col_sql(shingles)))


def shingle_hashes_md5(shingles: Column | str) -> Column:
    """Cross-engine-reproducible base hash: 60 bits of md5, mod prime.
    Slower than xxhash64 (the production base) but computable in any
    engine with md5 — the hook that lets a DuckDB oracle replay the
    entire MinHash pipeline bit-for-bit."""
    return F.expr(_shingle_hashes_md5_sql(_col_sql(shingles)))


def minhash_signature(
    shingles: Column | str, num_hashes: int = 64, seed: int = 42, base: str = "xxhash64"
) -> Column:
    """MinHash signature as array<bigint> of length ``num_hashes``.

    One pass over the shingle set per permutation, all inside codegen.
    Empty shingle sets yield a sentinel signature of PRIME values so
    they never collide with real docs in a band join. ``base`` picks
    the shingle base hash: xxhash64 (fast, JVM-only) or md5
    (cross-engine, see shingle_hashes_md5). The hash subtree is inlined
    into every permutation (textually here, as Column substitution did
    before) — callers on a hot path should materialize the base hashes
    and use minhash_signature_from_hashes.
    """
    hashes_sql = (_shingle_hashes_md5_sql if base == "md5" else _shingle_hashes_sql)(
        _col_sql(shingles)
    )
    return F.expr(_signature_sql(hashes_sql, num_hashes, seed))


def _signature_sql(hashes_sql: str, num_hashes: int, seed: int) -> str:
    mins = ", ".join(
        f"array_min(transform({hashes_sql}, "
        f"__mh_h -> pmod({a} * __mh_h + {b}, {MINHASH_PRIME})))"
        for a, b in perm_params(num_hashes, seed)
    )
    sentinel = ", ".join([f"CAST({MINHASH_PRIME} AS BIGINT)"] * num_hashes)
    return (
        f"coalesce(CASE WHEN size({hashes_sql}) > 0 THEN array({mins}) END, "
        f"array({sentinel}))"
    )


def minhash_signature_from_hashes(
    hashes: Column | str, num_hashes: int = 64, seed: int = 42
) -> Column:
    """MinHash signature over an already-computed base-hash array.

    Callers that can afford a column should materialize the base
    hashes in their own projection and pass the column ref here: the
    `hashes` expression is referenced num_hashes+1 times below, and
    higher-order functions sit outside whole-stage codegen, so a
    non-trivial subtree (md5/xxhash per shingle) gets re-evaluated per
    permutation instead of CSE'd (~20% of the LSH pipeline at sf0.1).

    Built as one SQL string (see _col_sql): the 64 permutations are
    64 transform+array_min trees — composed as Column objects they
    cost ~0.3 s of py4j round-trips per plan construction.
    """
    return F.expr(_signature_sql(_col_sql(hashes), num_hashes, seed))


def band_keys(signature: Column | str, bands: int, rows_per_band: int) -> Column:
    """Split a signature into ``bands`` hashed band keys:
    array of (band_index, band_hash) structs ready to explode.
    Two docs land in the same LSH bucket iff some band matches fully.
    One SQL string (see _col_sql) — 16 struct/hash/slice trees.
    """
    x = _col_sql(signature)
    parts = ", ".join(
        f"struct({i} AS band, "
        f"hash({i}, slice({x}, {i * rows_per_band + 1}, {rows_per_band}))"
        f" AS band_hash)"
        for i in range(bands)
    )
    return F.expr(f"array({parts})")


def simhash(tokens: Column, bits: int = 32, base: str = "xxhash64") -> Column:
    """SimHash fingerprint of a token array as a BIGINT.

    Per-bit majority vote over token hashes; near-dup test is
    then ``bit_count(simhash(a) ^ simhash(b)) <= t`` — constant-time
    per candidate pair. ``base``: xxhash64 (fast, JVM-only) or md5
    (cross-engine-reproducible, same 60-bit derivation as
    shingle_hashes_md5 — lets an external engine replay the vote).

    ``bits`` must be <= 52: bit weights are built with pow() in double
    space, exact only for powers of two below 2^53 (the shift builtins
    demand literal shift amounts, so they can't consume the lambda's
    position variable).
    """
    assert bits <= 52, "simhash bits limited to 52 (double-exact pow)"
    if base == "md5":
        hashes = F.transform(
            tokens,
            lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"),
        )
    else:
        hashes = F.transform(tokens, lambda t: F.xxhash64(t))
    positions = F.sequence(F.lit(0), F.lit(bits - 1))
    zeros = F.transform(positions, lambda i: F.lit(0).cast("long"))
    votes = F.aggregate(
        hashes,
        zeros,
        lambda acc, h: F.zip_with(
            acc,
            positions,
            lambda a, i: a + F.when(F.getbit(h, i) == 1, 1).otherwise(-1),
        ),
    )
    return F.aggregate(
        F.zip_with(
            votes,
            positions,
            lambda v, i: F.when(v > 0, F.pow(F.lit(2.0), i).cast("long")).otherwise(
                F.lit(0).cast("long")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )


def hamming(a: Column, b: Column) -> Column:
    """Hamming distance between two integer fingerprints."""
    return F.bit_count(a.bitwiseXOR(b))
