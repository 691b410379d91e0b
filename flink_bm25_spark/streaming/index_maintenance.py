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
partitions disjoint from manually-added ones (manual adds allocate
strictly below it); while a stream owns an index, manual
``bm25_index_add`` calls must not race it (caller contract, as with
every incremental screen).

Two id-space hazards are guarded, not just documented:

- A FRESH checkpoint over a used index would restart micro-batch ids
  at 0 and silently overwrite the earlier stream's partitions (data
  loss, not double-count).  The loop detects it — batch id 0 arriving
  while the index already holds stream partitions beyond
  ``STREAM_BATCH_BASE`` — and raises with the remedy (compact first:
  compaction folds every committed batch to id 0, after which a new
  checkpoint is safe).
- AUTO-COMPACTION (``compact_every``) folds committed batches from
  INSIDE the loop while excluding the micro-batch about to be
  (re-)added, so a crash between a compaction and the checkpoint
  commit still leaves the redelivered batch replacing its own
  partitions instead of double-counting a folded copy.  Every batch
  below the current id is checkpoint-committed, hence safe to fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from flink_bm25_spark.operators.serving import (
    BATCH_COL,
    STREAM_BATCH_BASE,
    bm25_index_add,
    bm25_index_compact,
)


def maintain_index_stream(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    tokenizer=None,
    compact_every: int | None = None,
    hot_df_cap: int | None = None,
) -> None:
    """Drive a ``(doc_id, text, ...)`` document stream into a persisted
    BM25 index until exhausted (availableNow trigger).  The index must
    already exist (``bm25_index_save`` creates batch 0); every
    micro-batch lands as its own idempotent partition.

    ``compact_every=N`` folds the accumulated batch partitions every N
    micro-batches from inside the loop — bounding per-query file-open
    cost on a long-lived stream (THROUGHPUT.md measured ~60% extra
    query wall after only 31 uncompacted batches) without a separate
    maintenance job.  The index stays queryable across the fold
    (staging + swap inside ``bm25_index_compact``).  ``hot_df_cap``
    forwards to both adds and compactions (per-batch salting, global
    re-salt at each fold)."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    from flink_bm25_spark.operators.tokenize import tokenize  # noqa: PLC0415

    tok = tokenizer or tokenize

    def _add(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_id == 0:
            import os as _os  # noqa: PLC0415

            from flink_bm25_spark.operators.serving import (  # noqa: PLC0415
                STREAM_OWNER_FILE,
                _fs_read_text,
                _fs_write_text,
                _read_stats,
            )

            marker = _os.path.join(path, STREAM_OWNER_FILE)
            owner = _fs_read_text(spark, marker)
            if owner is not None and owner != checkpoint:
                raise RuntimeError(
                    f"index is owned by streaming checkpoint {owner!r};"
                    f" attaching {checkpoint!r} at micro-batch 0 would"
                    " silently overwrite its partitions. Run a full"
                    " bm25_index_compact first (folds every committed"
                    " batch to id 0 and releases ownership)."
                )
            # belt-and-braces for pre-marker indexes: stream ids beyond
            # BASE+0 with a batch-0 delivery can only be a fresh
            # checkpoint
            seen = _read_stats(spark, path).agg(
                F.max(BATCH_COL).alias("m")
            ).first()["m"]
            if seen is not None and int(seen) > STREAM_BATCH_BASE:
                raise RuntimeError(
                    "fresh streaming checkpoint over an index that already"
                    " holds stream batches (max _batch_id ="
                    f" {int(seen)}): restarting ids at 0 would silently"
                    " overwrite them. Run bm25_index_compact on the index"
                    " first (folds every committed batch to id 0), then"
                    " attach the new checkpoint."
                )
            _fs_write_text(spark, marker, checkpoint)
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            bm25_index_compact(
                spark,
                path,
                exclude_batch_ids=(STREAM_BATCH_BASE + batch_id,),
                hot_df_cap=hot_df_cap,
            )
        if batch_df.isEmpty():
            return
        bm25_index_add(
            batch_df, path, tokenizer=tok,
            batch_id=STREAM_BATCH_BASE + batch_id,
            hot_df_cap=hot_df_cap,
        )

    q = (
        stream.writeStream.foreachBatch(_add)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def maintain_ivf_stream(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    compact_every: int | None = None,
) -> None:
    """Drive a ``(vec_id, embedding)`` stream into a persisted IVF index
    (availableNow trigger) — the dense-retrieval twin of
    :func:`maintain_index_stream`, same discipline throughout: each
    micro-batch lands under ``STREAM_BATCH_BASE + batch_id`` via dynamic
    partition overwrite (redelivery replaces itself), a fresh checkpoint
    over a used index is refused, and ``compact_every=N`` folds
    committed batches mid-stream while EXCLUDING the micro-batch about
    to be (re-)added — a redelivered uncommitted batch still replaces
    its own partition instead of double-counting a folded copy."""
    from flink_bm25_spark.operators.similarity import (  # noqa: PLC0415
        _ivf_batch_ids,
        ivf_add,
        ivf_compact,
    )

    def _add(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_id == 0:
            import os as _os  # noqa: PLC0415

            from flink_bm25_spark.operators.serving import (  # noqa: PLC0415
                STREAM_OWNER_FILE,
                _fs_read_text,
                _fs_write_text,
            )

            marker = _os.path.join(path, STREAM_OWNER_FILE)
            owner = _fs_read_text(spark, marker)
            if owner is not None and owner != checkpoint:
                raise RuntimeError(
                    f"IVF index is owned by streaming checkpoint"
                    f" {owner!r}; attaching {checkpoint!r} at micro-batch"
                    " 0 would silently overwrite its partitions. Run a"
                    " full ivf_compact first."
                )
            seen = _ivf_batch_ids(spark, path)
            if seen and max(seen) > STREAM_BATCH_BASE:
                raise RuntimeError(
                    "fresh streaming checkpoint over an IVF index that"
                    f" already holds stream batches (max _batch_id ="
                    f" {max(seen)}): run ivf_compact first, then attach"
                    " the new checkpoint."
                )
            _fs_write_text(spark, marker, checkpoint)
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            ivf_compact(
                spark, path,
                exclude_batch_ids=(STREAM_BATCH_BASE + batch_id,),
            )
        if batch_df.isEmpty():
            return
        ivf_add(
            spark, path, batch_df, batch_id=STREAM_BATCH_BASE + batch_id
        )

    q = (
        stream.writeStream.foreachBatch(_add)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
