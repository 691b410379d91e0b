"""Tokenization operators (P1/P2/P3/P5 in SURVEY.md §2.2).

Reference behavior: a Flink ``FlatMapFunction`` runs ansj segmentation per
document and fuses a POS + stopword predicate into the same operator
(``BatchBM25PreMain.java:183-196``, predicate ``:38-48,191``).

Spark restatement: ``explode(split(lower(text), '\\s+'))`` — a generator
expression that stays inside WholeStageCodegen — followed by a separate
``filter``.  Catalyst fuses the explode and the filter into one stage
anyway, so we keep them as two composable operators for clarity
(SURVEY.md §4 "filter fused into tokenizer").

For CJK corpora the regex tokenizer is swappable for a Pandas-UDF
segmenter (:func:`tokenize_with_udf`) — an Arrow-batched iterator UDF so a
heavyweight segmentation model loads once per executor, not once per row.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_bm25_spark.config import STOPWORDS
from flink_bm25_spark.functions.text import tokenize_expr


def tokenize(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Explode documents into a ``(doc_id, word)`` token stream (P1).

    1→N generator, no shuffle: tokenization is embarrassingly parallel and
    runs entirely map-side regardless of corpus size.
    """
    return (
        documents.select(
            F.col(id_col), F.explode(tokenize_expr(F.col(text_col))).alias("word")
        )
        .where(F.col("word") != "")
    )


def filter_stopwords(
    tokens: DataFrame, stopwords: tuple[str, ...] = STOPWORDS
) -> DataFrame:
    """Drop stopwords (P2/P3 — reference predicate ``BatchBM25PreMain.java:46-48``).

    A plain ``isin`` filter: for lists of this size Catalyst compiles it to
    an in-predicate; for very large stopword dictionaries use a broadcast
    anti-join instead (see :func:`filter_stopwords_broadcast`).
    """
    return tokens.where(~F.col("word").isin(*stopwords))


def filter_stopwords_broadcast(tokens: DataFrame, stopwords_df: DataFrame) -> DataFrame:
    """Stopword removal as a broadcast anti-join — the 100 TB-scale form
    when the dictionary is too large for an isin literal."""
    out = tokens.join(
        F.broadcast(stopwords_df.select(F.col("word"))), on="word", how="left_anti"
    )
    # the join puts the key column first; restore the input column order
    return out.select(*tokens.columns)


def tokenize_with_udf(
    documents: DataFrame,
    segment: Callable[[str], list[str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pluggable tokenizer slot for model-backed segmenters (ansj/jieba
    analogue of ``BatchBM25PreMain.java:186``).

    Implemented with ``mapInPandas`` so Arrow moves batches (not rows) and
    the segmenter is constructed once per partition — the Spark equivalent
    of Flink's RichFunction ``open()`` lifecycle.

    The input is spread across the cluster first (no-op when the scan
    already has enough splits): a single small parquet file arrives as ONE
    partition, which would serialize the entire Python segmentation stage
    onto one core — the worst place to lose parallelism, since this is the
    engine's only Python hot path.
    """
    import pandas as pd  # noqa: PLC0415 — worker-side import

    from flink_bm25_spark.operators.pipeline import (  # noqa: PLC0415
        _parallelize_scan,
    )

    documents = _parallelize_scan(documents)
    out_schema = f"{id_col} long, word string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, words = [], []
            for i, txt in zip(pdf[id_col], pdf[text_col]):
                for w in segment(txt or ""):
                    ids.append(i)
                    words.append(w)
            yield pd.DataFrame({id_col: ids, "word": words})

    return documents.select(id_col, text_col).mapInPandas(run, schema=out_schema)
