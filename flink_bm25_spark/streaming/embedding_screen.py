"""Continuous-ingest screening — any screener with the
``screen_batch`` / ``checkpoint_state`` contract
(:class:`~flink_bm25_spark.api.EmbeddingDeduper` over vectors,
:class:`~flink_bm25_spark.api.WinnowScreen` over documents) driven by a
stream, mirroring :mod:`flink_bm25_spark.streaming.curation` exactly:
``screen_batch`` has the ``foreachBatch`` contract, state checkpoints to
parquet between triggers, and the survivor sink is effectively-once via
dynamic partition overwrite keyed by batch id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_bm25_spark.api import EmbeddingDeduper, WinnowScreen  # noqa: F401

BATCH_COL = "_batch_id"


def screen_stream(
    stream: DataFrame,
    deduper: "EmbeddingDeduper | WinnowScreen",
    out_path: str,
    checkpoint: str,
    state_path: str | None = None,
) -> None:
    """Drive a vector stream through ``deduper`` until exhausted
    (availableNow trigger): per micro-batch, survivors append to
    ``out_path``; with ``state_path`` the key store is checkpointed
    after every batch so a crash resumes with at most one batch
    re-screened, and a re-delivered batch overwrites its own partition
    (effectively-once output under at-least-once delivery)."""

    def _screen(batch_df: DataFrame, batch_id: int) -> None:
        survivors = deduper.screen_batch(batch_df)
        spark = batch_df.sparkSession
        # SCOPED dynamic overwrite (restores on exit): setting it bare on
        # the session leaks into every later full-rebuild overwrite in
        # the same session, which would then keep stale partitions
        from flink_bm25_spark.operators.serving import (  # noqa: PLC0415
            _overwrite_mode,
        )

        with _overwrite_mode(spark, "dynamic"):
            (
                survivors.withColumn(BATCH_COL, F.lit(batch_id).cast("long"))
                .write.mode("overwrite")
                .partitionBy(BATCH_COL)
                .parquet(out_path)
            )
        if state_path is not None:
            deduper.checkpoint_state(state_path)

    q = (
        stream.writeStream.foreachBatch(_screen)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_screened(spark, out_path: str) -> DataFrame:
    """The accumulated survivor vectors (all batches)."""
    df = spark.read.parquet(out_path)
    return df.drop(BATCH_COL) if BATCH_COL in df.columns else df
