"""Gap-based sessionization (batch) — the event-stream operator family the
reference's streaming surface implies but never builds: its keyed running
aggregates (``backup/UnionTest.java:92-97``) never segment the unbounded
stream into sessions.  The streaming twin lives in
:mod:`flink_bm25_spark.streaming.windows` (``session_window``); this is the
batch form over the ``events`` table, expressed as two window functions —
one shuffle on the session key, no self-join, no state.

All time arithmetic is integer microseconds (``unix_micros``), never
float seconds — deterministic at any timestamp magnitude and identical to
the oracle's ``epoch_us``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    order_tiebreak: str = "event_id",
    gap_s: int = 1800,
) -> DataFrame:
    """Attach a per-key ``session_id`` (1-based, in time order): a new
    session starts when the gap to the previous event exceeds ``gap_s``.

    lag → boundary flag → running sum, all over ONE window partitioning:
    Catalyst plans a single exchange on ``key`` and two Window nodes that
    share its sort — the shape that holds at 100 TB (sessionizing is then
    exactly one shuffle of the event log).
    """
    us = F.unix_micros(F.col(ts))
    w = Window.partitionBy(key).orderBy(us.asc(), F.col(order_tiebreak).asc())
    prev = F.lag(us).over(w)
    boundary = F.when(
        prev.isNull() | ((us - prev) > gap_s * 1_000_000), 1
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.withColumn(
        "session_id", F.sum(boundary).over(run).cast("int")
    )


def session_stats(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    gap_s: int = 1800,
) -> DataFrame:
    """Per-session rollup: event count, span (first/last event in epoch µs)
    and value sum — the relation a funnel/engagement pipeline feeds from."""
    sess = sessionize(events, key=key, ts=ts, gap_s=gap_s)
    us = F.unix_micros(F.col(ts))
    return sess.groupBy(key, "session_id").agg(
        F.count("*").alias("n_events"),
        F.min(us).alias("start_us"),
        F.max(us).alias("end_us"),
        F.round(F.sum(value), 6).alias("sum_value"),
    )
