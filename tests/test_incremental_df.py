"""Incremental (streaming) DF maintenance equals the batch DF — the
reference's $inc-upsert behavior (BatchBM25PreMain.java:107-123) restated
with exactly-once semantics."""

from __future__ import annotations

import shutil
import tempfile

from flink_bm25_spark.operators.pipeline import corpus_stats_for
from flink_bm25_spark.streaming.incremental_df import (
    run_incremental_df,
    streaming_document_frequencies,
)
from flink_bm25_spark.sources.tables import load_documents
from tests.conftest import SF_DIR


def test_streaming_df_operator_matches_batch(spark):
    # batch-mode run of the same operator == pipeline DF
    got = {
        r.word: r.df
        for r in streaming_document_frequencies(
            load_documents(spark, SF_DIR)
        ).collect()
    }
    want = {
        r.word: r.df for r in corpus_stats_for(spark, SF_DIR).df_stats.collect()
    }
    assert got == want


def test_incremental_snapshot_equals_batch(spark):
    src = tempfile.mkdtemp(prefix="inc_df_src_")
    snap = tempfile.mkdtemp(prefix="inc_df_snap_") + "/df"
    shutil.copy(f"{SF_DIR}/documents.parquet", src)
    schema = spark.read.parquet(f"{SF_DIR}/documents.parquet").schema
    stream = spark.readStream.schema(schema).format("parquet").load(src)
    q = run_incremental_df(stream, snap, "t_inc_df")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.word: r.df for r in spark.read.parquet(snap).collect()}
    want = {
        r.word: r.df for r in corpus_stats_for(spark, SF_DIR).df_stats.collect()
    }
    assert got == want
