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
