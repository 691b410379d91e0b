"""Watermarked event-time windows — the T5 capability extension.

The reference has NO windows, watermarks, or event-time handling anywhere
(SURVEY.md §2.8 T5: the class named "SocketWindowWordCount" never opens a
window).  These operators complete the streaming surface with the standard
Structured Streaming forms; each has a batch-SQL twin over the ``events``
fixture for correctness (``q_window_tumbling`` et al.).

Late data: the watermark bounds state — events later than the horizon are
dropped from open windows, which is what makes unbounded streams runnable
in bounded memory at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(
    events: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling event-time windows: count + sum(value) per (window, type)."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window(F.col(ts_col), window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("total"))
        .select(
            F.col("w.start").cast("long").alias("win_start"),
            "event_type",
            "n",
            "total",
        )
    )


def sliding_window_agg(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding (hopping) windows — each event lands in window/slide panes."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(
            F.window(F.col(ts_col), window, slide).alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("total"))
        .select(
            F.col("w.start").cast("long").alias("win_start"),
            "event_type",
            "n",
            "total",
        )
    )


def session_window_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Session windows: activity bursts per user separated by ``gap``."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("total"))
        .select(
            F.col("w.start").cast("long").alias("sess_start"),
            F.col("w.end").cast("long").alias("sess_end"),
            "user_id",
            "n",
            "total",
        )
    )
