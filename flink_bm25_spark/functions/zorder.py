"""Z-order (Morton) keys — multi-dimensional data layout.

A sort on ``(a, b)`` clusters perfectly on ``a`` and not at all on
``b``; interleaving the BITS of both columns into one key makes rows
close in key-space close in BOTH dimensions, so parquet row-group
min/max stats prune selective predicates on either column.  This is the
layout trick behind Delta/Iceberg ``OPTIMIZE ZORDER BY`` — here as a
plain column expression over non-negative integers plus a range-
partitioned sorted writer, nothing engine-private.

Pure bit arithmetic on the JVM (shifts, masks, adds) — whole-stage
codegen, no UDFs — and reproducible in any SQL engine (the
``q_zorder_key`` oracle rebuilds it from integer division/modulo).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Bits taken per column (keys stay well inside int64: bits × n_cols ≤ 62).
DEFAULT_BITS = 16


def zorder_key(cols: Sequence[Column], bits: int = DEFAULT_BITS) -> Column:
    """Morton interleave of ``len(cols)`` non-negative int columns, low
    ``bits`` bits each: bit ``b`` of column ``i`` lands at position
    ``b * n + i`` of the key.  Values are masked to ``bits`` (callers
    rank/bucket wider domains first — a rank is the right input anyway,
    since interleaving assumes comparable ranges).
    """
    n = len(cols)
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits overflows int64")
    key = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        v = c.cast("long")
        for b in range(bits):
            bit = F.shiftright(v, b).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, b * n + i)
    return key


def with_zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = DEFAULT_BITS,
    out_col: str = "zkey",
) -> DataFrame:
    return df.withColumn(out_col, zorder_key([F.col(c) for c in cols], bits))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = DEFAULT_BITS,
    num_files: int = 8,
) -> None:
    """Write parquet laid out by z-key: range-partitioned (file order ==
    key-range order, no single reducer) and sorted within each file, so
    every file and every row group covers a tight hyper-rectangle of the
    z-ordered columns — min/max stats then prune reads on ANY of them.
    """
    keyed = with_zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(num_files, "zkey")
        .sortWithinPartitions("zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
