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


def _naive_rn(df, value_col, tiebreak_col):
    w = Window.orderBy(value_col, tiebreak_col)
    return {
        r[tiebreak_col]: r.r
        for r in df.withColumn("r", F.row_number().over(w)).collect()
    }


@pytest.mark.parametrize("hot_threshold,sub_blocks", [(100, 8), (10_000, 4)])
def test_block_ranked_spread_matches_naive_on_atoms(
    spark, hot_threshold, sub_blocks
):
    """The atom-spread decomposition (rank = strictly-before count +
    in-tie rank) must be bit-identical to the naive unpartitioned
    row_number on an atom-dominated distribution — both when the atoms
    cross hot_threshold (sub-blocked tie path) and when they stay cold
    (value-partitioned window path)."""
    import random

    from flink_bm25_spark.operators.rank import block_ranked_spread

    rng = random.Random(7)
    rows = []
    for i in range(4000):
        u = rng.random()
        s = 0.0 if u < 0.6 else (0.2 if u < 0.8 else round(rng.random(), 6))
        rows.append((i, s))
    df = spark.createDataFrame(
        rows, "doc_id long, score double"
    ).localCheckpoint(eager=True)
    got_df = block_ranked_spread(
        df,
        "score",
        "doc_id",
        lo=0.0,
        hi=1.0,
        hot_threshold=hot_threshold,
        sub_blocks=sub_blocks,
    )
    got = {r.doc_id: r._rank for r in got_df.collect()}
    assert got == _naive_rn(df, "score", "doc_id")
    assert {r._n for r in got_df.collect()} == {4000}


def test_block_ranked_spread_single_atom_and_measured_range(spark):
    # one giant atom (every row ties) with the range MEASURED, the
    # whole relation through the sub-blocked hot path
    from flink_bm25_spark.operators.rank import block_ranked_spread

    df = spark.createDataFrame(
        [(i, 0.5) for i in range(3000)], "doc_id long, score double"
    ).localCheckpoint(eager=True)
    got = {
        r.doc_id: r._rank
        for r in block_ranked_spread(
            df, "score", "doc_id", hot_threshold=100, sub_blocks=16
        ).collect()
    }
    assert got == _naive_rn(df, "score", "doc_id")


def test_block_ranked_spread_empty(spark):
    from flink_bm25_spark.operators.rank import block_ranked_spread

    df = spark.createDataFrame([], "doc_id long, score double")
    assert block_ranked_spread(df, "score", "doc_id").count() == 0


def test_min_ranked_by_value_matches_naive_rank(spark):
    """min_ranked_by_value == SQL rank() (min-rank ties) with no window
    over the row relation: rank is |strictly smaller| + 1 via the
    distinct-value join."""
    import random

    from flink_bm25_spark.operators.rank import min_ranked_by_value

    rng = random.Random(11)
    rows = [
        (i, rng.choice([1.5, 2.5, 2.5, 2.5, round(rng.random() * 10, 3)]))
        for i in range(2000)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, nll double"
    ).localCheckpoint(eager=True)
    w = Window.orderBy("nll")
    want = {
        r.doc_id: r.r
        for r in df.withColumn("r", F.rank().over(w)).collect()
    }
    ranked = min_ranked_by_value(df, "nll")
    got = {r.doc_id: r._rank for r in ranked.collect()}
    assert got == want
    # and truly window-free over the row relation
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    assert "row_number()" not in plan


def test_block_ranked_spread_grouped_matches_naive(spark):
    """group_cols: per-group row_number identical to the naive
    PARTITION BY group window, with atoms inside each group and groups
    of very different sizes (the real per-language shape)."""
    import random

    from flink_bm25_spark.operators.rank import block_ranked_spread

    rng = random.Random(3)
    rows = []
    for i in range(3000):
        grp = rng.choices(["en", "de", "fr"], weights=[8, 3, 1])[0]
        u = rng.random()
        s = 0.0 if u < 0.5 else round(rng.random(), 6)
        rows.append((i, grp, s))
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, score double"
    ).localCheckpoint(eager=True)
    w = Window.partitionBy("lang").orderBy("score", "doc_id")
    want = {
        r.doc_id: (r.r, r.n)
        for r in df.withColumn("r", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("lang")))
        .collect()
    }
    got = {
        r.doc_id: (r._rank, r._n)
        for r in block_ranked_spread(
            df,
            "score",
            "doc_id",
            lo=0.0,
            hi=1.0,
            hot_threshold=100,
            sub_blocks=8,
            group_cols=["lang"],
        ).collect()
    }
    assert got == want


def test_min_ranked_by_value_grouped_matches_naive(spark):
    import random

    from flink_bm25_spark.operators.rank import min_ranked_by_value

    rng = random.Random(5)
    rows = [
        (i, rng.choice(["a", "b"]), rng.choice([1.0, 2.0, 3.0]))
        for i in range(1000)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, grp string, v double"
    ).localCheckpoint(eager=True)
    w = Window.partitionBy("grp").orderBy("v")
    want = {
        r.doc_id: r.r
        for r in df.withColumn("r", F.rank().over(w)).collect()
    }
    got = {
        r.doc_id: r._rank
        for r in min_ranked_by_value(df, "v", group_cols=["grp"]).collect()
    }
    assert got == want


def test_grouped_rank_keeps_null_group_keys(spark):
    """A NULL group key is a group, not a discard: SQL's PARTITION BY
    keeps a NULL partition, so the grouped ranks must too (plain
    equi-joins on the group column silently dropped these rows)."""
    from flink_bm25_spark.operators.rank import (
        block_ranked_spread,
        min_ranked_by_value,
    )

    df = spark.createDataFrame(
        [
            (1, "a", 1.0),
            (2, "a", 2.0),
            (3, None, 5.0),
            (4, None, 3.0),
            (5, None, 3.0),
        ],
        "doc_id long, grp string, v double",
    ).localCheckpoint(eager=True)
    got = {
        r.doc_id: (r._rank, r._n)
        for r in min_ranked_by_value(df, "v", group_cols=["grp"]).collect()
    }
    assert got == {1: (1, 2), 2: (2, 2), 3: (3, 3), 4: (1, 3), 5: (1, 3)}
    got2 = {
        r.doc_id: (r._rank, r._n)
        for r in block_ranked_spread(
            df, "v", "doc_id", group_cols=["grp"], hot_threshold=1, sub_blocks=4
        ).collect()
    }
    assert got2 == {1: (1, 2), 2: (2, 2), 3: (3, 3), 4: (1, 3), 5: (2, 3)}


def test_rank_plan_construction_is_lazy(spark):
    """Building the ranked plan must not run driver-side jobs: ranges
    join in as broadcast 1-row aggregates, never .collect() at
    construction time."""
    from flink_bm25_spark.operators.rank import (
        block_ranked_spread,
        min_ranked_by_value,
    )

    sc = spark.sparkContext
    df = spark.createDataFrame(
        [(i, float(i % 7)) for i in range(100)], "doc_id long, v double"
    ).localCheckpoint(eager=True)
    before = sc.statusTracker().getJobIdsForGroup(None)
    _ = min_ranked_by_value(df, "v")
    _ = block_ranked_spread(df, "v", "doc_id")
    after = sc.statusTracker().getJobIdsForGroup(None)
    assert before == after  # no jobs ran while building the plans


def test_block_ranked_spread_many_distinct_hot_atoms(spark):
    """Pathological distribution for the sub-offsets relation: hundreds
    of DISTINCT values all above hot_threshold, so sub_offs grows to
    |hot values| x sub_blocks rows — the data-dependent case that must
    not be force-broadcast (r4 verdict item 2: AQE decides).  Ranks stay
    bit-identical to the naive window."""
    from flink_bm25_spark.operators.rank import block_ranked_spread

    # 400 distinct values, each an atom of 6 rows (hot_threshold=2)
    rows = [
        (v * 10 + j, float(v) / 400.0)
        for v in range(400)
        for j in range(6)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, score double"
    ).localCheckpoint(eager=True)
    ranked = block_ranked_spread(
        df, "score", "doc_id", lo=0.0, hi=1.0, hot_threshold=2, sub_blocks=4
    )
    got = {r.doc_id: r._rank for r in ranked.collect()}
    assert got == _naive_rn(df, "score", "doc_id")
    # the only forced-broadcast joins are the 1-row range aggregates
    # (condition-free cross joins) and the <=blocks-row block-offsets
    # relation (keyed on _blk).  The sub_offs join — the one keyed on
    # _tsub, whose size is data-dependent — must carry NO hint: AQE
    # decides it at runtime.
    opt = ranked._jdf.queryExecution().optimizedPlan().toString()
    hinted = [
        ln for ln in opt.splitlines() if "strategy=broadcast" in ln
    ]
    assert hinted, "expected the bounded hints to survive"
    assert not any("_tsub" in ln for ln in hinted), hinted
