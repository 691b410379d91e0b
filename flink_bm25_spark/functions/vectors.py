"""Vector math over ``array<float>`` embedding columns.

Built on ``F.zip_with`` / ``F.aggregate`` (JVM higher-order functions) —
no UDF, no Python serialization, vectorizable by codegen.  Accumulation is
in double precision in strict index order, matching the SQL oracle's fold
semantics so rounded results agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    products = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(products, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """NULL for zero vectors rather than an error: Spark 4 is ANSI mode,
    where an unguarded x/0 throws — a single all-zeros embedding in a
    100 TB corpus must not kill the job.  NULL drops out of every
    ``cos >= threshold`` filter and top-k ordering downstream (the
    DuckDB oracles agree because the fixtures contain no zero vectors)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0.0, dot(a, b) / denom)


def cosine_from_parts(ea: Column, eb: Column, na: Column, nb: Column) -> Column:
    """Cosine from precomputed per-vector norms (the pair-join fast path:
    one O(d) dot per pair).  Same zero-vector NULL guard as
    :func:`cosine_similarity` — ANSI mode would otherwise throw."""
    denom = na * nb
    return F.when(denom != 0.0, dot(ea, eb) / denom)


def l2_normalize(df, vec_col: str = "embedding", out_col: str = "unit"):
    """Add ``out_col`` = unit-norm copy of ``df[vec_col]``; zero vectors
    pass through unchanged (ANSI-safe: no division by zero).

    DataFrame-level on purpose: the norm must be bound as its OWN
    projection column before the per-element divide — a norm expression
    referenced inside a ``transform`` lambda is re-evaluated per element,
    turning O(d) into O(d²) per row (same trap as
    ``operators/dedup.py::shingles``).
    """
    a = F.col(vec_col)
    n = F.col("_l2n")
    return (
        df.withColumn("_l2n", l2_norm(a))
        .withColumn(
            out_col,
            F.when(n == 0.0, F.transform(a, lambda x: x.cast("double"))).otherwise(
                F.transform(a, lambda x: x.cast("double") / n)
            ),
        )
        .drop("_l2n")
    )


def quantize_int8(a: Column) -> tuple[Column, Column]:
    """Symmetric int8 quantization: returns ``(qvec, scale)`` where
    ``qvec[i] = floor(a[i] * scale)`` with ``scale = 127 / max|a|``.

    ``floor`` (not round) so the expression is bit-identical across SQL
    engines — round-half-even vs half-away-from-zero never enters.  At
    100 TB this is the storage/bandwidth lever for ANN: 4× smaller
    vectors, int arithmetic in the scan, exact rescoring only for the
    top candidates.
    """
    absmax = F.array_max(F.transform(a, lambda x: F.abs(x.cast("double"))))
    scale = F.when(absmax == 0.0, F.lit(0.0)).otherwise(F.lit(127.0) / absmax)
    qvec = F.transform(a, lambda x: F.floor(x.cast("double") * scale).cast("int"))
    return qvec, scale


def with_int8_quantization(
    df, vec_col: str = "embedding", qvec_col: str = "qvec", scale_col: str = "scale"
):
    """Add ``qvec_col``/``scale_col`` int8 quantization columns to ``df``.

    Preferred over :func:`quantize_int8` in plans: the scale is bound as
    its own projection column FIRST, so the per-element multiply reads a
    slot instead of re-reducing ``max|a|`` for every element (O(d) per
    row, not O(d²))."""
    a = F.col(vec_col)
    absmax = F.array_max(F.transform(a, lambda x: F.abs(x.cast("double"))))
    return (
        df.withColumn(
            scale_col,
            F.when(absmax == 0.0, F.lit(0.0)).otherwise(F.lit(127.0) / absmax),
        )
        .withColumn(
            qvec_col,
            F.transform(
                a,
                lambda x: F.floor(x.cast("double") * F.col(scale_col)).cast("int"),
            ),
        )
    )
