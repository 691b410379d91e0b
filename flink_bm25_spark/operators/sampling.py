"""Deterministic sampling and dataset splitting — training-data-pipeline
operators (north-star extension; the reference's only sampling is a
driver-side ``subList`` worklist cap, ``BatchBM25PreMain.java:153-159``).

A 100 TB corpus cannot be split with ``rand()``: resampling must be
reproducible across runs, engines, and partitionings, or train/val leakage
silently invalidates every downstream eval.  Both operators here key the
decision on the md5-derived 60-bit hash of a stable id
(:func:`flink_bm25_spark.functions.hashing.h60`), so

- assignment is a pure map-side projection (no shuffle, no state),
- re-running on re-partitioned / incrementally-grown data never moves an
  existing document between splits, and
- the DuckDB oracle reproduces the assignment bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_bm25_spark.functions.hashing import h60

DEFAULT_SPLITS: tuple[tuple[str, int], ...] = (("train", 80), ("val", 90), ("test", 100))


def _bucket(key: Column, buckets: int) -> Column:
    # h60 of the *decimal string* form of the key — the only cross-engine
    # canonical byte representation of an integer id.
    return h60(key.cast("string")) % F.lit(buckets)


def hash_split(
    df: DataFrame,
    key_col: str = "doc_id",
    splits: Sequence[tuple[str, int]] = DEFAULT_SPLITS,
    buckets: int = 100,
    out_col: str = "split",
) -> DataFrame:
    """Assign every row a deterministic split label (train/val/test …).

    ``splits`` is ``[(label, upper_bound_bucket_exclusive), …]`` with the
    last bound equal to ``buckets``; a row lands in the first split whose
    bound exceeds ``h60(key) % buckets``.
    """
    if splits[-1][1] != buckets:
        raise ValueError(f"last split bound must equal buckets={buckets}: {splits}")
    b = _bucket(F.col(key_col), buckets)
    expr = None
    for label, bound in splits[:-1]:
        clause = b < F.lit(bound)
        expr = F.when(clause, label) if expr is None else expr.when(clause, label)
    expr = expr.otherwise(splits[-1][0]) if expr is not None else F.lit(splits[-1][0])
    return df.withColumn(out_col, expr)


def hash_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    buckets: int = 10_000,
) -> DataFrame:
    """Deterministic ~``fraction`` sample: keep rows whose key-hash bucket
    falls below ``fraction * buckets``.  Unlike ``df.sample`` this is stable
    under re-partitioning and across engines, and composable: a 1% sample
    is a strict subset of the 10% sample of the same data."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1]: {fraction}")
    return df.where(_bucket(F.col(key_col), buckets) < F.lit(int(fraction * buckets)))


def stratified_hash_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    buckets: int = 10_000,
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling — the language/source quota
    step of a pretraining mix (e.g. keep 100% of low-resource languages,
    10% of English).

    Same hash-bucket construction as :func:`hash_sample`, with the
    threshold chosen per stratum — so each stratum's sample is stable
    under repartitioning, reproducible across engines, and nested
    (raising a rate strictly grows that stratum's sample).  Pure map-side
    filter: no shuffle, no per-stratum scan."""
    thr = None
    for value, rate in sorted(rates.items()):
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate must be in [0,1]: {value}={rate}")
        t = F.when(
            F.col(stratum_col) == value, F.lit(int(rate * buckets))
        )
        thr = t if thr is None else thr.when(
            F.col(stratum_col) == value, F.lit(int(rate * buckets))
        )
    thr = thr.otherwise(F.lit(int(default_rate * buckets)))
    return df.where(_bucket(F.col(key_col), buckets) < thr)
