"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference's richest streaming behavior is a keyed running aggregate
whose state lives in Flink's keyed reduce state
(``backup/UnionTest.java:92-97``, ``backup/SocketWindowWordCount.java:160-198``).
The built-in ``groupBy().agg()`` covers that (see
:mod:`flink_bm25_spark.streaming.wordcount`); this module shows the
*extension point* for state Spark's built-ins cannot express — arbitrary
per-key Python state with explicit timeout control — using
``applyInPandasWithState`` (Arrow-batched; state checkpointed like any
streaming aggregation).

Example operator: per-key running count + high-water mark, the canonical
shape for streaming dedup (`seen-set` state) or per-key top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n", LongType()),
        StructField("max_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("max_value", DoubleType())]
)


def running_stats_per_type(events: DataFrame) -> DataFrame:
    """Streaming: per-event_type running (count, max) with explicit state.

    Emits one updated row per key per micro-batch (update semantics).
    Works only on streaming DataFrames — for the batch twin use
    ``groupBy(event_type).agg(count, max)``.

    The update function is a *closure* on purpose: cloudpickle serializes
    nested functions by value, so workers never need this package on their
    PYTHONPATH (a module-level function would be pickled as an import
    reference and fail on executors launched outside the repo).
    """

    def update(key, pdf_iter, state: GroupState):
        import pandas as pd  # noqa: PLC0415 — worker-side import

        if state.exists:
            (n, max_value) = state.get
        else:
            n, max_value = 0, float("-inf")
        for pdf in pdf_iter:
            n += len(pdf)
            if len(pdf):
                max_value = max(max_value, float(pdf["value"].max()))
        state.update((n, max_value))
        yield pd.DataFrame(
            {"event_type": [key[0]], "n": [n], "max_value": [max_value]}
        )

    return events.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
