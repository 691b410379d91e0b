"""Keyed upsert (the reference's Mongo findOneAndUpdate/$inc sink
semantics) and SCD2 history maintenance."""

from __future__ import annotations

import datetime

from flink_bm25_spark.operators.upsert import scd2_apply, upsert, upsert_additive


def test_upsert_last_write_wins(spark):
    base = spark.createDataFrame(
        [(1, "old"), (2, "keep")], "doc_id long, payload string"
    )
    updates = spark.createDataFrame(
        [(1, "new"), (3, "insert")], "doc_id long, payload string"
    )
    got = {r.doc_id: r.payload for r in upsert(base, updates, "doc_id").collect()}
    assert got == {1: "new", 2: "keep", 3: "insert"}


def test_upsert_additive_inc_semantics(spark):
    # the reference's DF counter: existing words increment, new words insert
    base = spark.createDataFrame([("spark", 10), ("join", 4)], "word string, df long")
    updates = spark.createDataFrame([("spark", 2), ("new", 1)], "word string, df long")
    got = {r.word: r.df for r in upsert_additive(base, updates, "word", "df").collect()}
    assert got == {"spark": 12, "join": 4, "new": 1}


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_scd2_closes_and_appends(spark):
    schema = (
        "c_custkey long, c_mktsegment string, valid_from timestamp, "
        "valid_to timestamp, is_current boolean"
    )
    dim = spark.createDataFrame(
        [
            (1, "BUILDING", _ts("2024-01-01"), None, True),
            (2, "MACHINERY", _ts("2024-01-01"), None, True),
        ],
        schema,
    )
    changes = spark.createDataFrame(
        [(1, "AUTOMOBILE", _ts("2024-06-01"))],
        "c_custkey long, c_mktsegment string, valid_from timestamp",
    )
    out = scd2_apply(dim, changes, "c_custkey")
    rows = {(r.c_custkey, r.c_mktsegment): r for r in out.collect()}
    assert len(rows) == 3
    old = rows[(1, "BUILDING")]
    assert old.valid_to == _ts("2024-06-01") and old.is_current is False
    new = rows[(1, "AUTOMOBILE")]
    assert new.valid_to is None and new.is_current is True
    untouched = rows[(2, "MACHINERY")]
    assert untouched.is_current is True and untouched.valid_to is None


def test_scd2_multiple_changes_same_key(spark):
    schema = (
        "k long, v string, valid_from timestamp, valid_to timestamp, "
        "is_current boolean"
    )
    dim = spark.createDataFrame([(1, "a", _ts("2024-01-01"), None, True)], schema)
    changes = spark.createDataFrame(
        [(1, "b", _ts("2024-02-01")), (1, "c", _ts("2024-03-01"))],
        "k long, v string, valid_from timestamp",
    )
    out = sorted(
        scd2_apply(dim, changes, "k").collect(), key=lambda r: r.valid_from
    )
    assert [(r.v, r.valid_to, r.is_current) for r in out] == [
        ("a", _ts("2024-02-01"), False),
        ("b", _ts("2024-03-01"), False),
        ("c", None, True),
    ]
