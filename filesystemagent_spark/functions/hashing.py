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


def shingle_hashes(shingles: Column) -> Column:
    """Map string shingles to non-negative ints below the prime."""
    return F.transform(shingles, lambda s: F.pmod(F.xxhash64(s), F.lit(MINHASH_PRIME)))


def shingle_hashes_md5(shingles: Column) -> Column:
    """Cross-engine-reproducible base hash: 60 bits of md5, mod prime.
    Slower than xxhash64 (the production base) but computable in any
    engine with md5 — the hook that lets a DuckDB oracle replay the
    entire MinHash pipeline bit-for-bit."""
    return F.transform(
        shingles,
        lambda s: F.pmod(
            F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
            F.lit(MINHASH_PRIME),
        ),
    )


def minhash_signature(
    shingles: Column, num_hashes: int = 64, seed: int = 42, base: str = "xxhash64"
) -> Column:
    """MinHash signature as array<bigint> of length ``num_hashes``.

    One pass over the shingle set per permutation, all inside codegen.
    Empty shingle sets yield a sentinel signature of PRIME values so
    they never collide with real docs in a band join. ``base`` picks
    the shingle base hash: xxhash64 (fast, JVM-only) or md5
    (cross-engine, see shingle_hashes_md5).
    """
    hashes = (shingle_hashes_md5 if base == "md5" else shingle_hashes)(shingles)
    return minhash_signature_from_hashes(hashes, num_hashes, seed)


def minhash_signature_from_hashes(
    hashes: Column, num_hashes: int = 64, seed: int = 42
) -> Column:
    """MinHash signature over an already-computed base-hash array.

    Callers that can afford a column should materialize the base
    hashes in their own projection and pass the column ref here: the
    `hashes` expression is referenced num_hashes+1 times below, and
    higher-order functions sit outside whole-stage codegen, so a
    non-trivial subtree (md5/xxhash per shingle) gets re-evaluated per
    permutation instead of CSE'd (~20% of the LSH pipeline at sf0.1).
    """

    # Factory keeps the lambda unary — PySpark derives HOF arity from
    # the Python signature, so default-arg capture would break it.
    def perm(a: int, b: int):
        return lambda h: F.pmod(a * h + b, F.lit(MINHASH_PRIME))

    mins = [
        F.array_min(F.transform(hashes, perm(a, b)))
        for a, b in perm_params(num_hashes, seed)
    ]
    return F.coalesce(
        F.when(F.size(hashes) > 0, F.array(*mins)),
        F.array(*[F.lit(MINHASH_PRIME).cast("long")] * num_hashes),
    )


def band_keys(signature: Column, bands: int, rows_per_band: int) -> Column:
    """Split a signature into ``bands`` hashed band keys:
    array of (band_index, band_hash) structs ready to explode.
    Two docs land in the same LSH bucket iff some band matches fully.
    """
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.hash(F.lit(i), F.slice(signature, i * rows_per_band + 1, rows_per_band)).alias(
                    "band_hash"
                ),
            )
            for i in range(bands)
        ]
    )


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
