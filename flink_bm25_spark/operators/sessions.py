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


def cohort_retention(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    period_s: int = 7 * 86400,
) -> DataFrame:
    """``(cohort, period, n_active, retention)`` — classic cohort
    analysis: users grouped by the period of their FIRST event; for each
    (cohort, periods-since-cohort) the count of distinct active users and
    its ratio to the cohort's size.

    Periods are integer ``epoch_us // period_us`` buckets (no calendar
    arithmetic — identical in every engine and timezone-proof).

    Scale shape: first-event assignment is one groupBy on the user key;
    the event log joins the tiny (user, cohort) relation co-keyed on that
    same key (AQE broadcasts it when it fits); activity dedup + count is
    one aggregation.  Cohort sizes re-aggregate the per-cohort relation —
    nothing user-level is ever broadcast or collected.
    """
    us = F.unix_micros(F.col(ts))
    # integer division (div), never float: a double quotient truncated at
    # a period boundary can disagree with exact integer math
    per_us = period_s * 1_000_000
    ev = events.select(
        F.col(key).alias("_u"),
        F.expr(f"unix_micros({ts}) div {per_us}L").alias("_p"),
    )
    firsts = ev.groupBy("_u").agg(F.min("_p").alias("cohort"))
    active = (
        ev.join(firsts, "_u")
        .select("_u", "cohort", (F.col("_p") - F.col("cohort")).alias("period"))
        .distinct()
    )
    counts = active.groupBy("cohort", "period").agg(
        F.count(F.lit(1)).cast("long").alias("n_active")
    )
    sizes = firsts.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("long").alias("_size")
    )
    return (
        counts.join(sizes, "cohort")
        .select(
            "cohort",
            "period",
            "n_active",
            F.round(F.col("n_active") / F.col("_size"), 6).alias("retention"),
        )
    )


def funnel_user_depths(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    key: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """``(user_id, depth)`` — each user's reached funnel depth under
    first-occurrence ordering (depth *k* = the first occurrences of the
    step events strictly increase in time through step *k*).

    ONE aggregation of conditional minima per user plus a map-side fold
    — which also makes it STREAMING-LEGAL (a single stateful aggregate:
    run it on the event stream in update/complete mode and the per-user
    depths converge to the batch answer; equivalence pinned in
    ``test_streaming``).  Ties broken by event_id packed into the low
    digits, so same-timestamp chains resolve identically across engines.
    """
    us = F.unix_micros(F.col(ts))
    # deterministic tiebreak packed into the low 3 digits (us * 1e6 would
    # overflow BIGINT for modern epochs); a %1000 collision only merges
    # the tiebreak for same-microsecond events, identically in the
    # oracle, so cross-engine agreement is unaffected
    key_us = us * F.lit(1000).cast("long") + F.col("event_id") % F.lit(1000)
    aggs = [
        F.min(F.when(F.col(type_col) == s, key_us)).alias(f"_t{i}")
        for i, s in enumerate(steps)
    ]
    per_user = events.groupBy(F.col(key).alias(key)).agg(*aggs)
    # completion time of step i = first step-i occurrence, valid only if
    # strictly after step i-1's completion; folded left-to-right
    comp = per_user
    prev = None
    for i, _ in enumerate(steps):
        t = F.col(f"_t{i}")
        if prev is None:
            c = t
        else:
            c = F.when(prev.isNotNull() & t.isNotNull() & (t > prev), t)
        comp = comp.withColumn(f"_c{i}", c)
        prev = F.col(f"_c{i}")
    depth = sum(
        F.when(F.col(f"_c{i}").isNotNull(), 1).otherwise(0)
        for i in range(len(steps))
    )
    return comp.select(key, depth.cast("long").alias("depth"))


def funnel_counts(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    key: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """``(step, step_idx, n_users)`` — first-occurrence ordered funnel:
    per-user depths (:func:`funnel_user_depths` — one aggregation, no
    per-step self-joins) counted into per-step reach totals.
    """
    depths = funnel_user_depths(events, steps, key, ts, type_col)
    reached = depths.select(F.col("depth").alias("_d"))
    one = reached.agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("_d") > i, 1).otherwise(0)), F.lit(0)
            )
            .cast("long")
            .alias(f"_r{i}")
            for i in range(len(steps))
        ]
    )
    packed = F.array(
        *[
            F.struct(
                F.lit(s).alias("step"),
                F.lit(i).cast("long").alias("step_idx"),
                F.col(f"_r{i}").alias("n_users"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return one.select(F.explode(packed).alias("_p")).select(
        "_p.step", "_p.step_idx", "_p.n_users"
    )


def period_growth(
    events: DataFrame,
    period_s: int = 7 * 86400,
    type_col: str = "event_type",
    ts: str = "ts",
) -> DataFrame:
    """``(event_type, period, n, prev_n, growth)`` — period-over-period
    trend per event type: counts in integer epoch periods, the previous
    period's count (NULL for a type's first period) and the growth ratio
    ``n / prev_n`` (NULL when there is no previous period).

    Scale shape: one count aggregation over the fact table; the lag
    window runs on the aggregated (type, period) relation — types ×
    periods rows, never the event log.
    """
    per_us = period_s * 1_000_000
    counts = (
        events.select(
            F.col(type_col).alias("event_type"),
            F.expr(f"unix_micros({ts}) div {per_us}L").alias("period"),
        )
        .groupBy("event_type", "period")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    from pyspark.sql import Window  # noqa: PLC0415

    w = Window.partitionBy("event_type").orderBy("period")
    return counts.withColumn("prev_n", F.lag("n").over(w)).withColumn(
        "growth",
        F.round(F.col("n") / F.col("prev_n"), 6),
    )
