"""Custom stateful streaming via ``transformWithStateInPandas`` (Spark 4).

The successor API to ``applyInPandasWithState``
(:mod:`flink_bm25_spark.streaming.stateful`): state is declared as typed
handles (value/list/map state) on a ``StatefulProcessor`` object instead
of one opaque tuple, which is what lets the state store track and evict
per-field — the shape Spark recommends for new pipelines.  Same example
operator as the old-API module (per-key running count + max), so the two
APIs are directly comparable and share one equivalence test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import (  # noqa: E402
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# TWS's state-server protocol is protobuf-based; the API exists in any
# PySpark 4 install but only runs where google.protobuf is importable.
try:  # pragma: no cover - environment probe
    from google.protobuf import descriptor as _descriptor  # noqa: F401

    TWS_AVAILABLE = True
except ImportError:  # pragma: no cover
    TWS_AVAILABLE = False

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


def make_running_stats_processor(state_schema: StructType = STATE_SCHEMA):
    """Build the ``RunningStats`` StatefulProcessor CLASS (not instance).

    Factory shape for two reasons: the class is created inside a function
    so cloudpickle serializes it by value (the TWS driver worker never
    needs this package on its PYTHONPATH), and the processor LOGIC can be
    unit-tested by driving ``init``/``handleInputRows`` with stub state
    handles — which keeps this operator's behavior pinned even where the
    protobuf state server is absent (see
    ``test_tws_processor_logic_without_state_server``).
    """

    class RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("stats", state_schema)

        def handleInputRows(self, key, rows, timerValues):  # noqa: N802
            import pandas as pd  # noqa: PLC0415 — worker-side import

            if self._state.exists():
                n, max_value = self._state.get()
            else:
                n, max_value = 0, float("-inf")
            for pdf in rows:
                n += len(pdf)
                if len(pdf):
                    max_value = max(max_value, float(pdf["value"].max()))
            self._state.update((n, max_value))
            yield pd.DataFrame(
                {"event_type": [key[0]], "n": [n], "max_value": [max_value]}
            )

        def close(self) -> None:
            pass

    return RunningStats


def running_stats_per_type_tws(events: DataFrame) -> DataFrame:
    """``transformWithStateInPandas`` twin of
    :func:`flink_bm25_spark.streaming.stateful.running_stats_per_type` —
    one updated ``(event_type, n, max_value)`` row per key per micro-batch.

    Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass``) — the HDFS-backed
    default does not implement the typed-handle column families TWS uses —
    and a ``google.protobuf`` runtime for the state-server protocol
    (``TWS_AVAILABLE`` probes it; the processor logic itself is tested
    without it through :func:`make_running_stats_processor`).
    """
    return events.groupBy("event_type").transformWithStateInPandas(
        statefulProcessor=make_running_stats_processor()(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
