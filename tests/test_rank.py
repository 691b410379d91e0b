"""Differential tests for the two-phase distributed rank
(`operators/rank.py`): identical results to the naive unpartitioned
percent_rank window on adversarial inputs — ties, value atoms, single
row, empty, degenerate (all-equal) ranges — at several block counts."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from flink_bm25_spark.operators.rank import (
    block_ranked,
    value_block,
    with_measured_blocks,
)


def _naive(df, order_cols, dense_ties):
    w = Window.orderBy(*[F.col(c).asc() for c in order_cols])
    fn = F.rank() if dense_ties else F.row_number()
    return {
        tuple(r[c] for c in order_cols): r.r
        for r in df.withColumn("r", fn.over(w)).collect()
    }


def _two_phase(df, order_cols, dense_ties):
    return {
        tuple(r[c] for c in order_cols): r._rank
        for r in block_ranked(df, order_cols, dense_ties=dense_ties).collect()
    }


@pytest.mark.parametrize("blocks", [1, 3, 64])
def test_unique_tiebreak_matches_row_number(spark, blocks):
    rows = [(i, ((i * 37) % 19) / 19.0) for i in range(200)]
    # value atoms: a big tie class at 0.0 and one at 0.5
    rows += [(1000 + i, 0.0) for i in range(25)]
    rows += [(2000 + i, 0.5) for i in range(25)]
    df = spark.createDataFrame(rows, "doc_id long, score double")
    base = df.withColumn("_blk", value_block(F.col("score"), 0.0, 1.0, blocks))
    assert _two_phase(base, ["score", "doc_id"], False) == _naive(
        df, ["score", "doc_id"], False
    )


@pytest.mark.parametrize("blocks", [1, 5, 64])
def test_dense_ties_match_rank_with_measured_range(spark, blocks):
    rows = [(i, float((i * 13) % 7)) for i in range(150)]
    rows += [(500 + i, 3.0) for i in range(40)]  # heavy tie atom
    df = spark.createDataFrame(rows, "doc_id long, score double")
    base = with_measured_blocks(df, "score", blocks)
    got = {
        r.doc_id: (r._rank, r._n)
        for r in block_ranked(base, ["score"], dense_ties=True).collect()
    }
    w = Window.orderBy(F.col("score").asc())
    want = {
        r.doc_id: (r.r, r.n)
        for r in df.withColumn("r", F.rank().over(w))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy()))
        .collect()
    }
    assert got == want


def test_degenerate_and_tiny_inputs(spark):
    # all rows share one value -> single block, rank() all 1
    same = spark.createDataFrame(
        [(i, 2.5) for i in range(10)], "doc_id long, score double"
    )
    base = with_measured_blocks(same, "score", 16)
    out = block_ranked(base, ["score"], dense_ties=True).collect()
    assert {r._rank for r in out} == {1} and all(r._n == 10 for r in out)

    one = spark.createDataFrame([(1, 0.3)], "doc_id long, score double")
    r = block_ranked(
        with_measured_blocks(one, "score", 16), ["score"], dense_ties=False
    ).collect()
    assert len(r) == 1 and r[0]._rank == 1 and r[0]._n == 1

    empty = spark.createDataFrame([], "doc_id long, score double")
    assert (
        block_ranked(
            with_measured_blocks(empty, "score", 16),
            ["score"],
            dense_ties=True,
        ).count()
        == 0
    )


def test_value_block_monotone_and_clamped(spark):
    df = spark.createDataFrame(
        [(i, i / 10.0) for i in range(11)], "i long, v double"
    )
    out = (
        df.select("i", value_block(F.col("v"), 0.0, 1.0, 4).alias("b"))
        .orderBy("i")
        .collect()
    )
    blocks = [r.b for r in out]
    assert blocks == sorted(blocks)  # monotone in the value
    assert blocks[0] == 0 and blocks[-1] == 3  # v=1.0 clamped into [0, 4)
