"""Continuous BM25 index maintenance — :func:`~flink_bm25_spark.
operators.serving.bm25_index_add` driven by a document stream.

The serving index's add contract (tokenize ONLY the new batch, write
its postings + statistics partials into the batch's own partition) is
exactly the ``foreachBatch`` contract, so streaming maintenance is the
same function fed micro-batches.  The index stays queryable THROUGHOUT
— :func:`~flink_bm25_spark.operators.serving.bm25_topk_from_index`
reads a consistent snapshot of whatever batches have committed, and
each new trigger's documents become searchable when their partitions
land (the reference's streaming flow — tokenize each arriving doc,
upsert its TF, ``$inc`` the global DF, ``BatchBM25PreMain.java:107-123``
— restated batch-at-a-time against parquet partitions instead of
row-at-a-time against MongoDB).

Effectively-once: the batch's partition id is ``STREAM_BATCH_BASE +
batch_id``, and Structured Streaming's checkpoint makes batch ids
stable across restarts, so a re-delivered micro-batch overwrites its
own partitions (dynamic partition overwrite inside ``bm25_index_add``)
instead of double-counting — same sink discipline as
``streaming/curation.py``.  ``STREAM_BATCH_BASE`` keeps stream
partitions disjoint from manually-added ones; while a stream owns an
index, manual ``bm25_index_add`` calls must not race it (caller
contract, as with every incremental screen).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from flink_bm25_spark.operators.serving import bm25_index_add

STREAM_BATCH_BASE = 1_000_000_000


def maintain_index_stream(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    tokenizer=None,
) -> None:
    """Drive a ``(doc_id, text, ...)`` document stream into a persisted
    BM25 index until exhausted (availableNow trigger).  The index must
    already exist (``bm25_index_save`` creates batch 0); every
    micro-batch lands as its own idempotent partition."""
    from flink_bm25_spark.operators.tokenize import tokenize  # noqa: PLC0415

    tok = tokenizer or tokenize

    def _add(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        bm25_index_add(
            batch_df, path, tokenizer=tok,
            batch_id=STREAM_BATCH_BASE + batch_id,
        )

    q = (
        stream.writeStream.foreachBatch(_add)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
