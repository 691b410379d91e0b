"""Stream-stream interval join — the streaming-join capability the
reference's streaming surface never reaches (its only stream combinator is
``union`` + keyed running aggregate, ``backup/UnionTest.java:92-97``).

Structured Streaming's watermarked interval join is the scalable form:
both sides co-partition on the equi-key, each side's state store retains
only rows inside the watermark horizon, and the time-range predicate
bounds state eviction — O(key × horizon) state regardless of stream
length.  The same function body runs unchanged on batch DataFrames
(T4 unified API), which is how correctness is tested (final-state
equivalence, SURVEY.md §5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def click_purchase_interval_join(
    clicks: DataFrame,
    purchases: DataFrame,
    key: str = "user_id",
    lookback_s: int = 600,
    watermark_s: int = 3600,
) -> DataFrame:
    """Each click paired with every purchase by the same user in the
    preceding ``lookback_s`` seconds (inclusive) — attribution-style join.

    ``(click_id, user_id, purchase_id, value)``; streaming inputs get a
    ``watermark_s`` event-time watermark on both sides (required for state
    cleanup in a stream-stream join; late rows beyond it are dropped).
    """
    c = clicks.select(
        F.col(key),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.select(
        F.col(key).alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
        "value",
    )
    if c.isStreaming:
        c = c.withWatermark("c_ts", f"{watermark_s} seconds")
    if p.isStreaming:
        p = p.withWatermark("p_ts", f"{watermark_s} seconds")
    cond = (
        (F.col(key) == F.col("p_user"))
        & (F.col("p_ts") <= F.col("c_ts"))
        & (F.col("p_ts") >= F.col("c_ts") - F.expr(f"INTERVAL {lookback_s} SECONDS"))
    )
    return c.join(p, cond).select(
        "click_id", F.col(key), "purchase_id", F.round("value", 6).alias("value")
    )
