"""Streaming deduplication — exactly-once repair for at-least-once sources.

The reference's streaming surface re-counts duplicates (its running
aggregate sums whatever arrives, ``backup/UnionTest.java:92-97``); a
production ingest needs the opposite: drop retransmitted records.
Structured Streaming's ``dropDuplicatesWithinWatermark`` keeps state only
inside the watermark horizon — O(distinct keys × horizon) state, the only
shape that survives an unbounded stream.  The same call degrades to a
plain ``dropDuplicates`` on batch inputs (T4 unified API), which is how
equivalence is tested.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_keys(
    events: DataFrame,
    keys: Sequence[str] = ("user_id", "event_type"),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Distinct key tuples, streaming or batch.

    Streaming: first arrival per key within the watermark horizon wins;
    late re-arrivals beyond it are dropped by the watermark itself.
    Batch: plain ``dropDuplicates``.  Only the key columns are emitted so
    stream and batch agree exactly (which *non-key* columns a dedup keeps
    is arrival-order-dependent by definition).
    """
    cols = list(keys)
    if events.isStreaming:
        return (
            events.withWatermark(ts_col, watermark)
            .select(*cols, ts_col)
            .dropDuplicatesWithinWatermark(cols)
            .select(*cols)
        )
    return events.select(*cols).dropDuplicates(cols)
