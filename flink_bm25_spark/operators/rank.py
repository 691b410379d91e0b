"""Distributed exact global rank — the two-phase block-cumsum pattern.

The naive exact percentile is ``percent_rank() OVER (ORDER BY key)``: an
unpartitioned window, i.e. a single-reducer sort of the whole relation.
Fine at sf0.1; a scale-killer at 100 TB even when the relation is one
row per document (1e11 docs through one task).

This module computes the IDENTICAL rank in two phases, the same shape
``sampling.token_budget_sample`` uses for its budget cumsum:

1. every row is assigned a *value block* — a monotone function of the
   ordering value (fixed-width buckets over a known or measured value
   range), so ``blockA < blockB`` implies every row of A orders before
   every row of B, and equal values always share a block;
2. per-block row counts (one hash aggregation) are cumsummed over the
   tiny blocks relation (≤ ``blocks`` rows) to give each block its
   global rank offset, broadcast back;
3. each block independently ranks its own rows with a window
   PARTITIONED by block — parallelism = number of populated blocks —
   and the global rank is ``block_offset + in_block_rank``.

Because rank arithmetic is exact integer math and the in-block ordering
equals the global ordering restricted to the block, the result is
bit-identical to the single-window form (and to any other engine's,
e.g. the DuckDB oracle's) — only the physical plan changes.

Skew caveat: ties must share a block, so a value atom (e.g. a score
constant like 0.0 assigned to a whole document class) is an irreducibly
hot block; its rows still rank on one task.  Tiebreak columns spread
*distinct* values only.  The cumsum window over the counts relation is
unpartitioned but touches ≤ ``blocks`` aggregate rows — the blessed
aggregate-sized-frame shape, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _block_offsets(base: DataFrame) -> DataFrame:
    """Per-block ``(_blk, _before, _n)``: rows ranking strictly before the
    block, and the total row count — ONE aggregation plus one window over
    the ≤ ``blocks``-row counts relation."""
    cum = (
        Window.orderBy("_blk").rowsBetween(Window.unboundedPreceding, -1)
    )
    tot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        base.groupBy("_blk")
        .agg(F.count(F.lit(1)).alias("_c"))
        .select(
            "_blk",
            F.coalesce(F.sum("_c").over(cum), F.lit(0)).alias("_before"),
            F.sum("_c").over(tot).alias("_n"),
        )
    )


def block_ranked(
    base: DataFrame,
    order_cols: list[str],
    *,
    dense_ties: bool,
) -> DataFrame:
    """``base`` (already carrying an ``_blk`` block column monotone in
    ``order_cols``) plus ``_rank`` (1-based global rank, min-rank on ties
    when ``dense_ties`` — matching SQL ``rank()``/``percent_rank()``
    semantics — else unique ``row_number`` order) and ``_n`` (total rows).
    """
    offs = _block_offsets(base)
    iw = Window.partitionBy("_blk").orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    in_rank = F.rank().over(iw) if dense_ties else F.row_number().over(iw)
    return (
        base.join(F.broadcast(offs), "_blk")
        .withColumn("_rank", F.col("_before") + in_rank)
        .drop("_before")
    )


def value_block(
    value: Column, lo: Column | float, hi: Column | float, blocks: int
) -> Column:
    """Fixed-width block id for ``value`` over ``[lo, hi]`` — monotone in
    the value (equal values share a block), clamped into
    ``[0, blocks)``; degenerate ranges collapse to block 0."""
    lo_c = lo if isinstance(lo, Column) else F.lit(float(lo))
    hi_c = hi if isinstance(hi, Column) else F.lit(float(hi))
    width = hi_c - lo_c
    raw = F.floor((value - lo_c) / width * blocks)
    return (
        F.when(width <= F.lit(0.0), F.lit(0))
        .otherwise(F.least(F.lit(blocks - 1), F.greatest(F.lit(0), raw)))
        .cast("int")
    )


def with_measured_blocks(
    scored: DataFrame, value_col: str, blocks: int
) -> DataFrame:
    """Attach ``_blk`` when the value range is not statically known: one
    min/max tree aggregation over the (checkpointed) score relation,
    broadcast back as two scalars.  The input should already be
    localCheckpointed by the caller so the range pass and the rank pass
    share one materialization."""
    rng = scored.agg(
        F.min(value_col).alias("_lo"), F.max(value_col).alias("_hi")
    )
    return scored.join(F.broadcast(rng)).select(
        *scored.columns,
        value_block(
            F.col(value_col), F.col("_lo"), F.col("_hi"), blocks
        ).alias("_blk"),
    )
