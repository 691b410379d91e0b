"""Streaming word count with running (update-mode) aggregation.

Reference: ``backup/SocketWindowWordCount.java:37-208`` — socket lines →
tokenize → keyed running sum, re-emitted on every update; and
``backup/UnionTest.java:44-103`` — an initial "state snapshot" stream
union'd with the live stream before the keyed sum (T3 bootstrap).

Spark restatement: the SAME column expressions as the batch tokenizer
(:mod:`flink_bm25_spark.operators.tokenize`) applied to a streaming
DataFrame, aggregated in ``update`` output mode — state lives in the
checkpoint (RocksDB/HDFS on a cluster), not in user code.  The reference's
static-ConcurrentHashMap state smuggling
(``backup/BatchBM25PrePrint.java:39,189-202``) has no analogue here by
design.

T4 (unified batch/stream API) holds structurally: these functions accept
either a batch or a streaming DataFrame — the expressions are identical;
only the sink call differs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_bm25_spark.config import STOPWORDS
from flink_bm25_spark.functions.text import tokenize_expr


def socket_lines(spark: SparkSession, host: str = "localhost", port: int = 9000) -> DataFrame:
    """T1 — unbounded socket line source
    (``backup/SocketWindowWordCount.java:48``)."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )


def running_word_count(
    lines: DataFrame, text_col: str = "value", stopwords: tuple[str, ...] = STOPWORDS
) -> DataFrame:
    """T2 — keyed running count over an unbounded stream of text lines.

    Works identically on batch or streaming input.  For streaming, write
    with ``outputMode("update")`` so every micro-batch re-emits only the
    changed (word, cnt) rows — the Spark form of the reference's
    emit-on-every-update behavior.
    """
    words = (
        lines.select(F.explode(tokenize_expr(F.col(text_col))).alias("word"))
        .where(F.col("word") != "")
        .where(~F.col("word").isin(*stopwords))
    )
    return words.groupBy("word").agg(F.count("*").cast("long").alias("cnt"))


def with_bootstrap_counts(live_counts: DataFrame, snapshot: DataFrame) -> DataFrame:
    """T3 — merge an initial state snapshot into the running aggregate.

    The reference unions a snapshot DataStream into the live stream before
    ``keyBy().sum()`` (``backup/UnionTest.java:92-97``).  Structured
    Streaming forbids a streaming∪static union, but the algebra commutes:
    summing the union equals joining the aggregated stream with the static
    snapshot and adding counts.  The snapshot side carries NO broadcast
    hint: a state dump is vocabulary-sized (data-dependent — a 10⁸-word
    vocabulary is multi-GB), so the planner picks broadcast only while it
    fits and a shuffled stream-static join otherwise.

    ``snapshot`` schema: (word, cnt).
    """
    snap = snapshot.select(
        F.col("word"), F.col("cnt").cast("long").alias("snap_cnt")
    )
    return (
        live_counts.join(snap, "word", "left_outer")
        .select(
            "word",
            (F.col("cnt") + F.coalesce(F.col("snap_cnt"), F.lit(0))).alias("cnt"),
        )
    )


def run_to_memory(counts: DataFrame, query_name: str) -> None:
    """Drive a bounded file-backed stream to completion into an in-memory
    table (test/smoke harness — K5 console-sink analogue)."""
    q = (
        counts.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
