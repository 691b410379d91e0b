"""Skew-breaking joins — the explicit companion to AQE's runtime skew
handling.

AQE (`spark.sql.adaptive.skewJoin`, on by default in
:func:`flink_bm25_spark.session.get_spark`) splits oversized shuffle
partitions at runtime, which covers most skew.  The explicit salted join
here is for the cases AQE can't fix: a single join KEY so hot that one
key's rows exceed an executor (AQE can split the partition but every
split still holds the same key when the other side must be replicated
anyway), or deterministic-plan requirements where runtime re-planning is
disabled.

The reference never joins (SURVEY.md §2.6), but its de-facto hot key is
exactly this shape: a stopword-like term whose posting list spans the
corpus.  ``tokens ⋈ idf`` on such a term is the motivating case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    buckets: int = 16,
    how: str = "inner",
    salt_by: Column | None = None,
) -> DataFrame:
    """Equi-join where the BIG side's hot keys are spread over
    ``buckets`` reducers and the small side is replicated ``buckets``×.

    - ``big`` rows get ``salt = hash(entire row) mod buckets`` (any
      per-row spreading works — correctness never depends on the salt,
      because every small-side key exists in every bucket).  Pass
      ``salt_by`` to salt on a cheaper column set.
    - ``small`` is crossed with ``range(buckets)`` — its shuffle volume
      grows ``buckets``×, which is the price of bounding the big side's
      largest reducer at ``hot_key_rows / buckets``.  Only worth it when
      ``|small| × buckets`` ≪ the hot key's row count; otherwise use the
      broadcast join (no shuffle at all) or trust AQE.

    Result equals ``big.join(small, key, how)`` exactly (pinned by
    ``tests/test_scale_ops.py``).  Supported ``how``: inner / left /
    left_semi / left_anti — right/full would need the SMALL side salted
    too, which contradicts the premise.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(f"salted_join does not support how={how!r}")
    if salt_by is None:
        salt_by = F.xxhash64(F.struct(*[F.col(c) for c in big.columns]))
    b = big.withColumn(SALT_COL, F.pmod(salt_by, F.lit(buckets)).cast("int"))
    spark = small.sparkSession
    replicas = spark.range(buckets).select(F.col("id").cast("int").alias(SALT_COL))
    s = small.crossJoin(F.broadcast(replicas))
    out = b.join(s, [key, SALT_COL], how)
    return out.drop(SALT_COL)


def split_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    hot_threshold: int = 100_000,
    buckets: int = 16,
    how: str = "inner",
    hot_keys: DataFrame | None = None,
) -> DataFrame:
    """Hot/cold SPLIT join — the production form of skew handling:
    keys above ``hot_threshold`` rows on the big side take the salted
    path (bounded reducers, small side replicated only for those keys),
    everything else takes the plain shuffled join untouched.  A blanket
    :func:`salted_join` replicates the small side ``buckets``× for ALL
    keys; splitting pays that price only where skew actually is.

    ``hot_keys`` (a 1-column relation of hot key values) can be passed
    from a prior profile (``profiling.key_skew``) or a previous batch;
    otherwise it is measured with one aggregation over ``big``.  Either
    way it is broadcast — by construction it holds at most
    ``|big| / hot_threshold`` keys, so it is always broadcastable.

    Result equals ``big.join(small, key, how)`` exactly for every
    supported ``how`` (inner / left / left_semi / left_anti — the
    :func:`salted_join` constraint; pinned by test): the hot/cold key
    sets partition the big side, and each branch joins against exactly
    the small rows its keys can match.
    """
    if hot_keys is None:
        hot_keys = (
            big.groupBy(key)
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") > F.lit(hot_threshold))
            .select(key)
        )
    hot = F.broadcast(hot_keys.select(key))
    big_hot = big.join(hot, key, "left_semi")
    big_cold = big.join(hot, key, "left_anti")
    small_hot = small.join(hot, key, "left_semi")
    cold_part = big_cold.join(small, key, how)
    hot_part = salted_join(big_hot, small_hot, key, buckets, how)
    return cold_part.unionByName(hot_part)
