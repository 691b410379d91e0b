"""Unit semantics of deterministic sampling/splitting (operators/sampling.py)
and gap sessionization (operators/sessions.py) beyond the oracle parity check:
stability, composability, boundary behavior."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from flink_bm25_spark.operators.sampling import hash_sample, hash_split
from flink_bm25_spark.operators.sessions import session_stats, sessionize
from tests.conftest import SF_DIR


def test_hash_split_is_exhaustive_and_stable(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = hash_split(docs, key_col="doc_id")
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) <= {"train", "val", "test"}
    assert sum(counts.values()) == docs.count()
    # ~80/10/10 within loose tolerance on a small fixture
    total = sum(counts.values())
    assert counts["train"] / total == pytest.approx(0.8, abs=0.12)
    # deterministic: re-partitioned input yields the identical assignment
    again = hash_split(docs.repartition(7), key_col="doc_id")
    assert out.select("doc_id", "split").exceptAll(again.select("doc_id", "split")).count() == 0


def test_hash_sample_nested_subsets(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    small = hash_sample(docs, 0.1, key_col="doc_id").select("doc_id")
    large = hash_sample(docs, 0.5, key_col="doc_id").select("doc_id")
    # composability: the 10% sample is a strict subset of the 50% sample
    assert small.exceptAll(large).count() == 0
    assert 0 < small.count() < large.count() < docs.count()


def test_hash_split_rejects_bad_bounds(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    with pytest.raises(ValueError):
        hash_split(docs, splits=(("a", 50), ("b", 90)), buckets=100)


def _events(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: two sessions — 3 events within 30 min, then a 2h gap
        (1, 1, base, 1.0),
        (2, 1, base + dt.timedelta(minutes=10), 2.0),
        (3, 1, base + dt.timedelta(minutes=40), 3.0),  # 30-min gap exactly -> same session
        (4, 1, base + dt.timedelta(hours=3), 4.0),
        # user 2: single event
        (5, 2, base, 5.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )


def test_sessionize_gap_boundary_inclusive(spark):
    # a gap of exactly gap_s does NOT start a new session (strict >)
    out = sessionize(_events(spark), gap_s=1800)
    got = {r["event_id"]: r["session_id"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 1}


def test_session_stats_rollup(spark):
    out = session_stats(_events(spark), gap_s=1800)
    rows = {(r["user_id"], r["session_id"]): r for r in out.collect()}
    s1 = rows[(1, 1)]
    assert s1["n_events"] == 3
    assert s1["end_us"] - s1["start_us"] == 40 * 60 * 1_000_000
    assert s1["sum_value"] == 6.0
    assert rows[(1, 2)]["n_events"] == 1
    assert rows[(2, 1)]["n_events"] == 1


def test_sessionize_single_shuffle(spark):
    # lag + running-sum windows must share ONE exchange on the session key
    out = sessionize(_events(spark))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning(user_id") == 1


def test_stratified_sample_nested_and_quota_shaped(spark):
    from flink_bm25_spark.operators.sampling import stratified_hash_sample
    from flink_bm25_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF_DIR)
    low = stratified_hash_sample(docs, {"en": 0.2, "zh": 1.0}, default_rate=0.0)
    high = stratified_hash_sample(docs, {"en": 0.6, "zh": 1.0}, default_rate=0.0)
    low_ids = {r.doc_id for r in low.collect()}
    high_ids = {r.doc_id for r in high.collect()}
    assert low_ids <= high_ids  # nested: raising a rate only grows the sample
    # zh kept whole, others (default 0) dropped entirely
    langs = {r.lang for r in high.select("lang").distinct().collect()}
    assert langs == {"en", "zh"}
    n_zh_all = docs.where("lang = 'zh'").count()
    assert high.where("lang = 'zh'").count() == n_zh_all


def test_temperature_resample_copy_counts(spark):
    from flink_bm25_spark.operators.sampling import temperature_resample

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang"
    )
    out = temperature_resample(
        docs, weights={"en": 0.5, "de": 2.3}, default_weight=1.0
    ).cache()
    base = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # expected copy totals ~ weight * stratum size (hash slice is ~exact
    # in expectation; tolerance covers small-fixture hash variance)
    for lang, n in base.items():
        w = {"en": 0.5, "de": 2.3}.get(lang, 1.0)
        assert got.get(lang, 0) == pytest.approx(w * n, rel=0.35)
    # every emitted copy index is dense from 0: dropping rep>0 recovers
    # exactly the weight>=~1 slice of the corpus, with no duplicates
    rep0 = out.where(F.col("rep") == 0).select("doc_id")
    assert rep0.count() == rep0.distinct().count()
    # determinism
    again = temperature_resample(
        docs, weights={"en": 0.5, "de": 2.3}, default_weight=1.0
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))
    out.unpersist()


def test_pack_sequences_layout(spark):
    from flink_bm25_spark.operators.sampling import pack_sequences
    from flink_bm25_spark.operators.text_analysis import token_stats

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    lens = token_stats(docs).select("doc_id", "n_tokens")
    budget = 256
    packed = pack_sequences(lens, budget=budget, shards=4).collect()

    by_shard = {}
    for r in packed:
        by_shard.setdefault(r["shard"], []).append(r)
    assert len(by_shard) == 4
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["doc_id"])
        run = 0
        for r in rows:
            # offsets are the contiguous running layout in key order
            assert r["offset"] == run
            assert r["seq_id"] == r["offset"] // budget
            run += r["n_tokens"]
    # every doc appears exactly once across shards
    assert len(packed) == lens.count()


def test_training_shuffle_is_reproducible_permutation(spark):
    from flink_bm25_spark.operators.sampling import training_shuffle
    from flink_bm25_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, "documents", SF_DIR).select("doc_id")
    a = training_shuffle(docs, n_shards=8, seed="shuffle:0").collect()
    b = training_shuffle(docs, n_shards=8, seed="shuffle:0").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # reproducible
    # valid layout: every doc exactly once; (shard, pos) is a dense key
    assert len({r["doc_id"] for r in a}) == len(a) == docs.count()
    keys = {(r["shard"], r["pos"]) for r in a}
    assert len(keys) == len(a)
    from collections import Counter
    sizes = Counter(r["shard"] for r in a)
    for sh, n in sizes.items():
        assert {p for s, p in keys if s == sh} == set(range(n))  # dense 0..n-1


def test_training_shuffle_seed_changes_order_not_membership(spark):
    from flink_bm25_spark.operators.sampling import training_shuffle
    from flink_bm25_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, "documents", SF_DIR).select("doc_id")
    e0 = {(r["doc_id"]): (r["shard"], r["pos"])
          for r in training_shuffle(docs, n_shards=8, seed="epoch:0").collect()}
    e1 = {(r["doc_id"]): (r["shard"], r["pos"])
          for r in training_shuffle(docs, n_shards=8, seed="epoch:1").collect()}
    assert set(e0) == set(e1)
    moved = sum(1 for d in e0 if e0[d] != e1[d])
    assert moved > 0.9 * len(e0)  # a fresh epoch reorders nearly everything


def test_leakage_safe_split_pins_clusters_to_one_split(spark):
    from flink_bm25_spark.operators.sampling import (
        hash_split,
        leakage_safe_split,
    )

    base = " ".join(f"w{i:02d}" for i in range(30))
    rows = [(i, base + f" tail{i}") for i in range(100, 110)]  # one cluster
    rows += [(i, " ".join(f"u{i}x{j}" for j in range(20))) for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    got = {r.doc_id: r.split for r in leakage_safe_split(docs).collect()}
    assert len(got) == len(rows)
    cluster_splits = {got[i] for i in range(100, 110)}
    assert len(cluster_splits) == 1  # whole cluster in ONE split
    # plain hash_split scatters the same cluster (the hole being closed)
    plain = {r.doc_id: r.split for r in hash_split(docs).collect()}
    assert len({plain[i] for i in range(100, 110)}) > 1
    # unclustered docs keep their plain hash_split assignment
    for i in range(5):
        assert got[i] == plain[i]


def test_token_budget_sample_equals_naive_window(spark):
    """The two-phase block cumsum must give EXACTLY the naive
    one-window-per-group cutoff, and the crossing document is kept."""
    import random

    from flink_bm25_spark.functions.hashing import h60
    from flink_bm25_spark.operators.sampling import token_budget_sample
    from pyspark.sql import functions as F

    rng = random.Random(7)
    rows = []
    for g in ("aa", "bb"):
        for i in range(60):
            n = rng.randint(1, 30)
            rows.append((len(rows), " ".join("t" * 3 for _ in range(n)), g))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")

    budget = 300
    got = sorted(
        (r.doc_id, r.lang, r.n_tokens)
        for r in token_budget_sample(docs, budget).collect()
    )

    # naive reference: order by (h % 16, h, doc_id), exclusive cumsum
    ordered = docs.select(
        "doc_id",
        "lang",
        F.size(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != F.lit(""))
        ).cast("long").alias("n_tokens"),
        h60(F.col("doc_id").cast("string")).alias("h"),
    ).collect()
    want = []
    for g in ("aa", "bb"):
        grp = sorted(
            (r for r in ordered if r.lang == g),
            key=lambda r: (r.h % 16, r.h, r.doc_id),
        )
        cum = 0
        for r in grp:
            if cum < budget:
                want.append((r.doc_id, r.lang, r.n_tokens))
            cum += r.n_tokens
    assert got == sorted(want)
    # the budget really truncates (non-vacuous) and every group survives
    assert 0 < len(got) < len(rows)
    assert {g for _, g, _ in got} == {"aa", "bb"}


def test_funnel_first_occurrence_ordering(spark):
    from datetime import datetime, timezone

    from flink_bm25_spark.operators.sessions import funnel_counts

    def ev(eid, u, t, typ):
        return (eid, datetime(2026, 1, 1, 0, 0, t, tzinfo=timezone.utc), u, typ)

    rows = [
        # u1: view(1) click(2) purchase(3) -> depth 3
        ev(1, 1, 1, "view"), ev(2, 1, 2, "click"), ev(3, 1, 3, "purchase"),
        # u2: click(1) view(2) click(4)... first click BEFORE first view
        # -> first-occurrence funnel stops at depth 1 (view only)
        ev(4, 2, 1, "click"), ev(5, 2, 2, "view"), ev(6, 2, 4, "click"),
        # u3: view only -> depth 1
        ev(7, 3, 5, "view"),
        # u4: purchase only -> depth 0
        ev(8, 4, 6, "purchase"),
    ]
    events = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )
    got = {r.step: r.n_users for r in funnel_counts(events).collect()}
    assert got == {"view": 3, "click": 1, "purchase": 1}


def test_cohort_retention_hand_example(spark):
    from datetime import datetime, timezone

    from flink_bm25_spark.operators.sessions import cohort_retention

    day = 86400
    def ev(eid, u, d):
        return (eid, datetime.fromtimestamp(d * day, tz=timezone.utc), u, "view")

    # weekly periods from epoch: days 0-6 = period 0, 7-13 = period 1...
    rows = [
        ev(1, 1, 0), ev(2, 1, 8),   # u1: cohort 0, active periods 0,1
        ev(3, 2, 1),                # u2: cohort 0, active period 0
        ev(4, 3, 7), ev(5, 3, 15),  # u3: cohort 1, active periods 1,2 -> offsets 0,1
    ]
    events = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )
    got = {
        (r.cohort, r.period): (r.n_active, r.retention)
        for r in cohort_retention(events).collect()
    }
    assert got == {
        (0, 0): (2, 1.0),
        (0, 1): (1, 0.5),
        (1, 0): (1, 1.0),
        (1, 1): (1, 1.0),
    }


def test_funnel_differential_fuzz(spark):
    """funnel_user_depths vs a brute-force python reference over random
    event logs (many users, shuffled arrival, missing steps, repeated
    steps, same-second ties resolved by event_id)."""
    import random
    from datetime import datetime, timezone

    from flink_bm25_spark.operators.sessions import funnel_user_depths

    rng = random.Random(42)
    steps = ("view", "click", "purchase")
    rows = []
    eid = 0
    for u in range(40):
        for _ in range(rng.randint(0, 8)):
            eid += 1
            t = rng.randint(0, 50)
            rows.append(
                (
                    eid,
                    datetime(2026, 2, 1, 0, 0, t, tzinfo=timezone.utc),
                    u,
                    rng.choice(steps + ("error", "signup")),
                )
            )
    rng.shuffle(rows)
    events = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )
    got = {r.user_id: r.depth for r in funnel_user_depths(events).collect()}

    # reference: first occurrence per step with (epoch_us*1000 + id%1000)
    # packing, then the strictly-increasing prefix
    first: dict[int, dict[str, int]] = {}
    for eid_, ts, u, typ in rows:
        if typ not in steps:
            continue
        key = int(ts.timestamp()) * 1_000_000 * 1000 + eid_ % 1000
        d = first.setdefault(u, {})
        if typ not in d or key < d[typ]:
            d[typ] = key
    want = {}
    for eid_, ts, u, typ in rows:
        want.setdefault(u, 0)
    for u in want:
        d = first.get(u, {})
        depth, prev = 0, None
        for s in steps:
            if s not in d or (prev is not None and d[s] <= prev):
                break
            depth += 1
            prev = d[s]
        want[u] = depth
    assert got == want


def test_stratified_topk_sample_stability(spark):
    """Exact k per group; growing ANOTHER group never changes a group's
    picks; growing the same group only swaps by hash rank."""
    from flink_bm25_spark.operators.sampling import stratified_topk_sample

    rows = [(i, "a" if i < 30 else "b") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    picks = {
        g: {r.doc_id for r in rs}
        for g, rs in (
            ("a", stratified_topk_sample(df, 5).where("lang='a'").collect()),
            ("b", stratified_topk_sample(df, 5).where("lang='b'").collect()),
        )
    }
    assert len(picks["a"]) == 5 and len(picks["b"]) == 5

    # add rows to group b only: group a's picks are untouched
    grown = df.union(
        spark.createDataFrame([(100 + i, "b") for i in range(20)], df.schema)
    )
    picks2 = {
        r.doc_id for r in stratified_topk_sample(grown, 5).where("lang='a'").collect()
    }
    assert picks2 == picks["a"]
    # a group smaller than k returns the whole group
    tiny = spark.createDataFrame([(1, "z"), (2, "z")], df.schema)
    assert stratified_topk_sample(tiny, 5).count() == 2


def test_weighted_sample_bias_determinism_and_exclusions(spark):
    from pyspark.sql import functions as F

    from flink_bm25_spark.operators.sampling import weighted_sample

    # 200 heavy (w=50) + 200 light (w=1) + zero/null-weight rows
    rows = (
        [(i, 50.0) for i in range(200)]
        + [(1000 + i, 1.0) for i in range(200)]
        + [(9001, 0.0), (9002, None)]
    )
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = weighted_sample(df, k=100, weight_col="w")
    ids = [r.doc_id for r in got.collect()]
    assert len(ids) == 100 and len(set(ids)) == 100
    assert 9001 not in ids and 9002 not in ids
    heavy = sum(1 for i in ids if i < 1000)
    # w=50 vs w=1 at 50/50 population: the heavy class must dominate
    assert heavy >= 80, heavy
    # reproducible; a different seed gives a different draw
    again = [r.doc_id for r in weighted_sample(df, k=100, weight_col="w").collect()]
    assert again == ids
    other = [
        r.doc_id
        for r in weighted_sample(df, k=100, weight_col="w", seed="ws:1").collect()
    ]
    assert other != ids
    # plan: distributed top-k, no global window
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    _ = F  # imported for symmetry with sibling tests
