"""Portable HyperLogLog — an approximate-distinct sketch that is
*hash-checkable across engines*, unlike any engine-native HLL.

``approx_count_distinct`` (Spark) and ``approx_count_distinct`` (DuckDB)
use different internal hashes, so their estimates can never be compared
value-for-value — the driver's oracle gate degrades to a rows-only check
(see ``q_approx_distinct``).  This module implements Flajolet's HLL from
first principles on the engine's portable 60-bit md5 hash
(:mod:`flink_bm25_spark.functions.hashing`), with two determinism rules:

1. **No float log/exp in the per-row path.**  The leading-zero rank comes
   from the *bit length* of the hash remainder, computed as the string
   length of its base-2 representation (``conv(w,10,2)`` / ``bin(w)``) —
   integer-exact in both engines, immune to libm ``log2`` boundary
   behavior.
2. **The bucket sum is an integer.**  ``sum(2^-M)`` is order-dependent in
   doubles; scaled by ``2^55`` it is ``sum(1 << (55 - M))`` — exact int64
   arithmetic (64 buckets × 2^55 < 2^63), identical under any
   aggregation order.  Doubles appear only in the final 2-operand
   estimate formula, rounded to 6 dp.

Scale shape: one ``groupBy(bucket)`` over the hashed relation — m=64
groups regardless of input size, pure map-side partial max before the
shuffle.  This is THE sketch pattern for 100 TB distinct counts: constant
state, one narrow shuffle, mergeable partials.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_bm25_spark.functions.hashing import h60

HLL_BUCKETS = 64  # m; rse ≈ 1.04/sqrt(m) ≈ 13%
_ALPHA_64 = 0.709  # Flajolet's bias constant for m=64


def _hll_rank(w: Column) -> Column:
    """ρ(w): position of the first 1-bit in the 54-bit remainder (1-based
    from the MSB side), via integer bit length — no float log2."""
    bitlen = F.length(F.conv(w.cast("string"), 10, 2))
    return F.when(w == 0, F.lit(55)).otherwise(F.lit(55) - bitlen)


def hll_distinct(values: DataFrame, col: str) -> DataFrame:
    """One-row ``(n_distinct_est)`` — portable-HLL estimate of the number
    of distinct values of ``values[col]``.

    Every intermediate is reproducible bit-for-bit in ANSI SQL (see the
    ``q_hll_distinct`` oracle), so the *estimate itself* is part of the
    correctness contract, not just "roughly right".
    """
    spark = values.sparkSession
    m = HLL_BUCKETS
    h = h60(F.col(col))
    # m = 64 = 2^6: bucket/remainder via bit ops — exact on the full
    # 60-bit hash (a double division would round above 2^53)
    hashed = values.select(
        h.bitwiseAND(F.lit(m - 1)).alias("bucket"),
        F.shiftright(h, 6).alias("w"),
    )
    ranks = hashed.groupBy("bucket").agg(F.max(_hll_rank(F.col("w"))).alias("mx"))
    buckets = spark.range(m).select(F.col("id").cast("long").alias("bucket"))
    full = buckets.join(ranks, "bucket", "left").select(
        "bucket", F.coalesce(F.col("mx"), F.lit(0)).alias("mx")
    )
    agg = full.agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 55 - mx)")).alias("isum"),
        F.sum(F.when(F.col("mx") == 0, 1).otherwise(0)).alias("v_zero"),
    )
    raw = (
        F.lit(_ALPHA_64 * m * m)
        * F.lit(float(1 << 55))
        / F.col("isum").cast("double")
    )
    est = F.when(
        (raw <= 2.5 * m) & (F.col("v_zero") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("v_zero").cast("double")),
    ).otherwise(raw)
    return agg.select(F.round(est, 6).alias("n_distinct_est"))
