"""Deterministic, engine-portable hashing.

Every sketch in this engine (MinHash, SimHash, fingerprints) is built on a
single word-hash primitive that is *bit-identical* in Spark and in ANSI SQL
engines (the DuckDB correctness oracle): the first 15 hex chars of
``md5(word)`` parsed as a base-16 integer.  That yields a uniform 60-bit
value with no dependence on Spark's (murmur3/xxhash) or DuckDB's internal
hash functions, so sketch outputs are exactly reproducible and
hash-checkable across engines.

All derived hash arithmetic stays in signed 64-bit range by reducing mod
the Mersenne prime 2^31-1 first (operands < 2^31 => products < 2^62), so no
engine-specific overflow behavior can leak into results.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from flink_bm25_spark.config import HASH_PRIME

# Multipliers for the universal-hash family h_i(x) = (a_i * x + b_i) mod p.
# Fixed literals (Knuth multiplicative constant; arbitrary odd offset) so the
# same seeds regenerate in SQL: a_i = (2654435761*(i+1) + 1) % p,
# b_i = (40503*(i+1) + 7) % p.
_SEED_A_MULT = 2_654_435_761
_SEED_B_MULT = 40_503


def h60(word: Column) -> Column:
    """60-bit deterministic hash of a string: ``conv(md5[:15], 16, 10)``.

    Portable SQL twin: ``CAST('0x' || substring(md5(w),1,15) AS BIGINT)``.
    """
    return F.conv(F.substring(F.md5(word.cast("binary")), 1, 15), 16, 10).cast("long")


def h_mod_p(word: Column) -> Column:
    """Word hash reduced into [0, p): the operand for universal hashing."""
    return h60(word) % F.lit(HASH_PRIME)


def minhash_seed_a(i: Column) -> Column:
    """a_i for the i-th universal hash (i is 0-based)."""
    return (F.lit(_SEED_A_MULT) * (i + 1) + 1) % F.lit(HASH_PRIME)


def minhash_seed_b(i: Column) -> Column:
    """b_i for the i-th universal hash (i is 0-based)."""
    return (F.lit(_SEED_B_MULT) * (i + 1) + 7) % F.lit(HASH_PRIME)


def rolling_fingerprint(words: Column) -> Column:
    """Polynomial rolling hash of a token sequence (document fingerprint).

    ``acc := (acc*31 + h(w)) mod p`` folded left-to-right over the token
    array — order-sensitive, so permuted documents get distinct
    fingerprints.  Expressed with ``F.aggregate`` (JVM-side lambda, no UDF);
    the SQL twin is ``list_reduce(list_transform(...), ...)``.
    """
    hashes = F.transform(words, lambda w: h_mod_p(w))
    return F.aggregate(
        hashes,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * F.lit(31) + h) % F.lit(HASH_PRIME),
    )
