"""Data-quality audit suite (operators/dq.py): single-pass null profile,
uniqueness / referential / domain / range / invariant checks, and the
one-plan audit summary."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_bm25_spark.operators.dq import (
    accepted_values_violations,
    dq_summary,
    expression_violations,
    fk_orphans,
    null_profile,
    range_violations,
    uniqueness_violations,
)


def _df(spark):
    rows = [
        (1, "a", 10.0),
        (2, None, 25.0),
        (2, "b", -3.0),
        (3, "zz", None),
    ]
    return spark.createDataFrame(rows, "id bigint, tag string, v double")


def test_null_profile_counts_and_single_pass(spark):
    df = _df(spark)
    prof = {r.col_name: r for r in null_profile(df).collect()}
    assert set(prof) == {"id", "tag", "v"}
    assert all(r.n_rows == 4 for r in prof.values())
    assert prof["id"].n_null == 0
    assert prof["tag"].n_null == 1
    assert prof["v"].n_null == 1
    assert prof["tag"].null_frac == 0.25
    # ONE aggregate pass: a single pair of exchanges (partial -> final),
    # not one scan/agg per column
    plan = null_profile(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") <= 1


def test_uniqueness_and_fk_and_domain_and_range(spark):
    df = _df(spark)
    dups = uniqueness_violations(df, ["id"]).collect()
    assert [(r.id, r.n_dup) for r in dups] == [(2, 2)]

    parent = spark.createDataFrame([(1,), (2,)], "pid bigint")
    orphans = fk_orphans(df, parent, "id", "pid")
    assert {r.id for r in orphans.collect()} == {3}

    bad_tag = accepted_values_violations(df, "tag", ["a", "b"])
    # NULL is a violation, as is the out-of-domain value
    assert sorted(r.id for r in bad_tag.collect()) == [2, 3]

    oor = range_violations(df, "v", 0.0, 20.0)
    # NULL, negative, and >hi all violate
    assert sorted(r.id for r in oor.collect()) == [2, 2, 3]

    inv = expression_violations(df, F.col("v") > F.lit(0.0))
    assert sorted(r.id for r in inv.collect()) == [2, 3]


def test_dq_summary_one_row_per_check(spark):
    df = _df(spark)
    parent = spark.createDataFrame([(1,), (2,)], "pid bigint")
    out = dq_summary(
        [
            ("unique_id", uniqueness_violations(df, ["id"])),
            ("fk_id", fk_orphans(df, parent, "id", "pid")),
            ("tag_domain", accepted_values_violations(df, "tag", ["a", "b"])),
            ("v_range", range_violations(df, "v", 0.0, 20.0)),
        ]
    )
    got = {r.dq_check: r.violations for r in out.collect()}
    assert got == {"unique_id": 1, "fk_id": 1, "tag_domain": 2, "v_range": 3}


def test_dq_summary_fused_single_scan_equals_composed(spark):
    from pyspark.sql import functions as F

    from flink_bm25_spark.operators.dq import (
        accepted_values_violations,
        dq_summary,
        dq_summary_fused,
        expression_violations,
    )

    df = _df(spark)
    fused = dq_summary_fused(
        df,
        [
            ("tag_domain", F.col("tag").isin("a", "b")),
            ("v_positive", F.col("v") > 0.0),
        ],
    )
    got = {r.dq_check: r.violations for r in fused.collect()}
    composed = dq_summary(
        [
            ("tag_domain", accepted_values_violations(df, "tag", ["a", "b"])),
            ("v_positive", expression_violations(df, F.col("v") > 0.0)),
        ]
    )
    want = {r.dq_check: r.violations for r in composed.collect()}
    assert got == want == {"tag_domain": 2, "v_positive": 2}
    # both checks ride ONE aggregation (logical plan has a single
    # Aggregate node), not one scan/agg pair per check
    plan = fused._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate") == 1


def test_dataset_diff_labels_and_null_handling(spark):
    from flink_bm25_spark.operators.dq import dataset_diff

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, "c", 3.0), (4, "d", 4.0)],
        "id bigint, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, None, 3.0), (5, "e", 5.0)],
        "id bigint, s string, v double",
    )
    got = {r.id: r.change for r in dataset_diff(old, new, ["id"]).collect()}
    # 1 unchanged (omitted); NULL->value and value->NULL are 'changed'
    assert got == {2: "changed", 3: "changed", 4: "removed", 5: "added"}
    # digest-only join: the plan carries no payload columns past the hash
    plan = (
        dataset_diff(old, new, ["id"])
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "FullOuter" in plan
