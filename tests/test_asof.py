"""Unit semantics of the as-of join operator (operators/asof.py) beyond the
oracle parity check: left-outer behavior, tie resolution, exact-ts matches."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from flink_bm25_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(10)), (2, 10, _ts(5)), (3, 10, _ts(20)), (4, 99, _ts(30))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, _ts(10), 1.0),   # exactly at left ts=10 -> matches (<=)
            (101, 10, _ts(15), 2.0),
            (102, 10, _ts(15), 3.0),   # same (key, ts) as 101 -> tiebreak max id
        ],
        "rid long, user_id long, ts timestamp, v double",
    )
    return left, right


def test_asof_inner_backward(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on="user_id", value_cols=("rid", "v"), tiebreak="rid"
    )
    got = {r["event_id"]: (r["asof_rid"], r["asof_v"]) for r in out.collect()}
    # event 2 (ts=5) has no prior purchase; event 4 is another key
    assert got == {1: (100, 1.0), 3: (102, 3.0)}


def test_asof_left_outer_keeps_unmatched(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on="user_id", value_cols=("rid",), tiebreak="rid", how="left"
    )
    got = {r["event_id"]: r["asof_rid"] for r in out.collect()}
    assert got == {1: 100, 2: None, 3: 102, 4: None}


def test_asof_preserves_left_columns(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="user_id", value_cols=("v",))
    assert out.columns == ["event_id", "user_id", "ts", "asof_v"]


def test_asof_plan_has_single_shuffle(spark):
    # The scalable property: ONE exchange (hash on the key), no join node —
    # a naive range-join formulation would show BroadcastNestedLoop/cartesian.
    left, right = _frames(spark)
    out = asof_join(
        left, right, on="user_id", value_cols=("v",), tiebreak="rid"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # hashpartitioning on user_id for the window; the tiebreak pre-agg
    # reuses the same partitioning
    assert plan.count("hashpartitioning(user_id") >= 1


def test_approx_distinct_accuracy(spark):
    # approx sketches are not oracle-matchable (engine-specific), so pin
    # accuracy against the exact values instead.
    import __spark_entry__ as entrymod
    from tests.conftest import SF_DIR

    row = entrymod.queries()["q_approx_distinct"](spark, SF_DIR).first()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    exact_n = orders.select("o_custkey").distinct().count()
    exact_p50 = orders.agg(F.expr("percentile(o_totalprice, 0.5)")).first()[0]
    assert abs(row["approx_customers"] - exact_n) <= 0.05 * exact_n
    assert abs(row["approx_p50"] - exact_p50) <= 0.02 * exact_p50


def test_asof_tolerance_bounds_match_age(spark):
    """merge_asof(tolerance=...) semantics: a prior right row older than
    the bound is NO match — dropped under inner, nulled under left."""
    from flink_bm25_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 100), (1, 200), (2, 50)], "k long, ts long"
    )
    right = spark.createDataFrame(
        [(1, 95, 9.5), (1, 120, 12.0), (2, 10, 1.0)],
        "k long, ts long, value double",
    )
    # unbounded: every left row matches its latest prior right row
    base = {
        (r.k, r.ts): r.asof_value
        for r in asof_join(left, right, "k").collect()
    }
    assert base == {(1, 100): 9.5, (1, 200): 12.0, (2, 50): 1.0}
    # tolerance 30: (1,100) matches at age 5; (1,200)'s latest match is
    # 80 old and (2,50)'s is 40 old -> both dropped under inner
    tight = {
        (r.k, r.ts): r.asof_value
        for r in asof_join(left, right, "k", tolerance=30).collect()
    }
    assert tight == {(1, 100): 9.5}
    # left keeps the stale rows with null values instead
    kept = {
        (r.k, r.ts): r.asof_value
        for r in asof_join(left, right, "k", how="left", tolerance=30).collect()
    }
    assert kept[(2, 50)] is None and kept[(1, 200)] is None
    assert kept[(1, 100)] == 9.5


def test_asof_forward_direction(spark):
    """direction='forward': earliest right row at-or-after the left ts;
    ties match; tolerance bounds the forward gap."""
    from flink_bm25_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 100), (1, 200), (2, 300)], "k long, ts long"
    )
    right = spark.createDataFrame(
        [(1, 100, 1.0), (1, 150, 1.5), (1, 260, 2.6), (2, 10, 0.1)],
        "k long, ts long, value double",
    )
    fwd = {
        (r.k, r.ts): r.asof_value
        for r in asof_join(left, right, "k", direction="forward").collect()
    }
    # (1,100) ties with right@100; (1,200)'s next is 260; (2,300) has
    # no future right row -> absent under inner
    assert fwd == {(1, 100): 1.0, (1, 200): 2.6}
    bounded = {
        (r.k, r.ts): r.asof_value
        for r in asof_join(
            left, right, "k", direction="forward", tolerance=50
        ).collect()
    }
    assert bounded == {(1, 100): 1.0}  # 260-200=60 > 50
    import pytest

    with pytest.raises(ValueError):
        asof_join(left, right, "k", direction="sideways")


def test_asof_nearest_direction(spark):
    """direction='nearest': closer of the backward/forward matches wins,
    backward on ties; tolerance bounds the chosen gap; one exchange."""
    from flink_bm25_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 100), (1, 207), (1, 300), (2, 40)], "k long, ts long"
    )
    right = spark.createDataFrame(
        [(1, 90, 0.9), (1, 110, 1.1), (1, 210, 2.1), (2, 400, 4.0)],
        "k long, ts long, value double",
    )
    near = {
        (r.k, r.ts): r.asof_value
        for r in asof_join(left, right, "k", direction="nearest").collect()
    }
    # (1,100): back@90 age 10 == fwd@110 age 10 -> tie, backward wins
    # (1,207): back@110 age 97 vs fwd@210 age 3 -> forward
    # (1,300): only backward exists (210)
    # (2,40): only forward exists (400)
    assert near == {
        (1, 100): 0.9,
        (1, 207): 2.1,
        (1, 300): 2.1,
        (2, 40): 4.0,
    }
    bounded = {
        (r.k, r.ts): r.asof_value
        for r in asof_join(
            left, right, "k", direction="nearest", tolerance=50
        ).collect()
    }
    # (1,300)'s only match is 90 old; (2,40)'s is 360 ahead -> dropped
    assert bounded == {(1, 100): 0.9, (1, 207): 2.1}
    # plan: still a single hash exchange on the key (both window sorts
    # share it), never a join node
    df = asof_join(left, right, "k", direction="nearest")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
