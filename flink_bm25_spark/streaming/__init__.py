"""Structured Streaming surface (SURVEY.md §2.8 T1–T5).

The reference's streaming jobs are processing-time running aggregates over
a socket (``backup/SocketWindowWordCount.java``, ``backup/UnionTest.java``)
— no windows or watermarks anywhere despite the class names.  This package
reproduces that surface (running word count, snapshot bootstrap) and adds
the T5 capability extension the reference lacks: watermarked event-time
windows.
"""

from flink_bm25_spark.streaming.wordcount import (
    running_word_count,
    socket_lines,
    with_bootstrap_counts,
)
from flink_bm25_spark.streaming.windows import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)

__all__ = [
    "running_word_count",
    "socket_lines",
    "with_bootstrap_counts",
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
]
