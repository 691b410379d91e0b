"""CDC / SCD2 operator tests: interval tiling, the merge composition
identity, delete semantics, and the zero-shuffle-on-base plan shape."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from flink_bm25_spark.operators.cdc import (
    OPEN_INTERVAL_US,
    cdc_apply,
    scd2_history,
    snapshot_of,
)
from flink_bm25_spark.plans import explain_str
from flink_bm25_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def _ts(day: int, hour: int = 0):
    return dt.datetime(2024, 1, day, hour)


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, value double, op string, ts timestamp, event_id bigint"
    )


def test_scd2_intervals_tile_per_key(spark):
    hist = scd2_history(load_table(spark, "events", SF_DIR)).collect()
    by_key = {}
    for r in hist:
        by_key.setdefault(r.user_id, []).append(r)
    for rows in by_key.values():
        rows.sort(key=lambda r: r.version)
        # versions are 1..n contiguous
        assert [r.version for r in rows] == list(range(1, len(rows) + 1))
        # intervals are half-open, adjacent, gap-free; only the last is open
        for a, b in zip(rows, rows[1:]):
            assert a.valid_to_us == b.valid_from_us
            assert not a.is_current
        assert rows[-1].valid_to_us == OPEN_INTERVAL_US
        assert rows[-1].is_current


def test_cdc_apply_composition_identity(spark):
    # apply(fold(first half), second half) == fold(whole log)
    ev = load_table(spark, "events", SF_DIR)
    changes = ev.select(
        "user_id",
        "value",
        F.when(F.col("event_type") == "error", F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
        "ts",
        "event_id",
    )
    split = "2024-01-15"
    base = snapshot_of(changes.where(F.col("ts") < split)).select(
        "user_id", "value"
    )
    applied = cdc_apply(base, changes.where(F.col("ts") >= split))
    full = snapshot_of(changes).select("user_id", "value")
    assert sorted(map(tuple, applied.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_cdc_delete_upsert_semantics(spark):
    base = _changes(
        spark,
        [
            (1, 10.0, "upsert", _ts(1), 1),
            (2, 20.0, "upsert", _ts(1), 2),
            (3, 30.0, "upsert", _ts(1), 3),
        ],
    ).select("user_id", "value")
    batch = _changes(
        spark,
        [
            (2, 99.0, "upsert", _ts(2, 1), 4),   # overwritten below
            (2, 21.0, "upsert", _ts(2, 2), 5),   # latest for key 2 wins
            (3, 0.0, "delete", _ts(2), 6),       # key 3 removed
            (4, 40.0, "upsert", _ts(2), 7),      # brand-new key
            (5, 50.0, "upsert", _ts(2, 1), 8),
            (5, 0.0, "delete", _ts(2, 2), 9),    # inserted then deleted
        ],
    )
    got = sorted(map(tuple, cdc_apply(base, batch).collect()))
    assert got == [(1, 10.0), (2, 21.0), (4, 40.0)]


def test_cdc_apply_base_side_has_no_shuffle(spark):
    # The snapshot must cross the network zero times: its anti-join against
    # the touched-key set is broadcast, so the only exchange in the whole
    # plan belongs to the (small) change-batch dedup window.
    base = load_table(spark, "customer", SF_DIR).select(
        F.col("c_custkey").alias("user_id"), F.col("c_acctbal").alias("value")
    )
    batch = _changes(
        spark, [(1, 1.0, "upsert", _ts(2), 1), (2, 0.0, "delete", _ts(2), 2)]
    )
    plan = explain_str(cdc_apply(base, batch))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan
