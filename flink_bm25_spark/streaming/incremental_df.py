"""Incremental document-frequency maintenance — the streaming twin of the
reference's per-document Mongo ``$inc`` upsert
(``BatchBM25PreMain.java:107-123``: for each new document, bump the global
``{w, c}`` counter of every word it contains).

Spark restatement: documents arrive as a stream; the DF aggregate runs in
``update`` output mode (only changed words re-emit per micro-batch), and a
``foreachBatch`` sink merges the deltas into a durable snapshot — the
exactly-once replacement for the reference's row-at-a-time upserts.  State
is checkpointed; a crash resumes from the last committed batch instead of
double-counting (the reference's ``$inc`` has no such guarantee).

Note DF semantics: each word counts once per document containing it
(distinct-per-doc before the count), matching the textbook A2 — not the
reference's truncated-top-30 variant (SURVEY.md §5 quirk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_bm25_spark.config import STOPWORDS
from flink_bm25_spark.functions.text import tokenize_expr


def streaming_document_frequencies(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: tuple[str, ...] = STOPWORDS,
) -> DataFrame:
    """Update-mode DF aggregate over a stream of documents.

    ``array_distinct`` runs per document *before* the explode, so each
    (doc, word) contributes exactly once — the distinct is map-side and
    free, no extra shuffle.
    """
    words = F.array_distinct(
        F.filter(
            tokenize_expr(F.col(text_col)),
            lambda w: (w != F.lit("")) & ~w.isin(*stopwords),
        )
    )
    per_doc = documents.select(F.col(id_col), F.explode(words).alias("word"))
    return per_doc.groupBy("word").agg(F.count("*").cast("long").alias("df"))


def run_incremental_df(
    stream_df: DataFrame, snapshot_dir: str, query_name: str = "incremental_df"
):
    """Maintain a durable DF snapshot with exactly-once foreachBatch writes.

    Each micro-batch receives only the UPDATED (word, df) rows; the sink
    overwrites the snapshot's matching rows by re-writing the union of the
    previous snapshot and the deltas (parquet has no MERGE; with Delta this
    becomes a single ``MERGE INTO``).  Returns the StreamingQuery.
    """

    def merge(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        deltas = batch_df.cache()
        try:
            prev = spark.read.parquet(snapshot_dir)
            merged = (
                prev.join(deltas.select("word"), "word", "left_anti")
                .unionByName(deltas)
            )
        except Exception:  # first batch: no snapshot yet
            merged = deltas
        merged.write.mode("overwrite").parquet(snapshot_dir + "_next")
        spark.read.parquet(snapshot_dir + "_next").write.mode("overwrite").parquet(
            snapshot_dir
        )

    counts = streaming_document_frequencies(stream_df)
    return (
        counts.writeStream.outputMode("update")
        .foreachBatch(merge)
        .queryName(query_name)
        .start()
    )
