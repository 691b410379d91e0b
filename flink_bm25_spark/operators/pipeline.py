"""The corpus-at-once BM25 statistics pipeline — the engine's flagship DAG.

One lazy DataFrame chain replaces the reference's 2-jobs-per-document loop
(``BatchBM25PreMain.java:162-248``):

    documents ──tokenize──▶ tokens ──stopword filter──▶ filtered
        filtered ──groupBy(doc,word)──▶ tf   [the ONE big shuffle]
        tf ──groupBy(doc)──▶ dlen
        tf ──groupBy(word)──▶ df ──▶ idf     [tiny, broadcastable]
        tf ⋈ idf ⋈ dlen ──▶ tfidf / bm25

``tf`` is cached when the caller will run multiple downstream branches
(TF sink + DF + doc length) — the reference instead re-executes the DAG per
``collect()`` (SURVEY.md §4 "caching/reuse: none").
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from flink_bm25_spark.operators.df_idf import corpus_size, document_frequencies, idf
from flink_bm25_spark.operators.tf import doc_lengths, term_frequencies
from flink_bm25_spark.operators.tokenize import filter_stopwords, tokenize
from flink_bm25_spark.sources.tables import load_documents


@dataclass
class CorpusStats:
    """All BM25 sufficient statistics as lazy DataFrames."""

    documents: DataFrame
    tokens: DataFrame
    tf: DataFrame
    dlen: DataFrame
    df_stats: DataFrame
    idf_stats: DataFrame
    n_docs: int


def _parallelize_scan(documents: DataFrame) -> DataFrame:
    """Spread a narrow scan across the cluster before the CPU-heavy
    tokenize stage.

    A single small parquet file arrives as ONE input partition, which would
    serialize tokenization onto one core.  At real scale the scan already
    has thousands of splits and this is a no-op — the repartition only
    fires when the source is under-partitioned relative to the cluster.
    """
    spark = documents.sparkSession
    target = spark.sparkContext.defaultParallelism
    if documents.rdd.getNumPartitions() < max(2, target // 2):
        return documents.repartition(target)
    return documents


def build_corpus_stats(
    documents: DataFrame, cache_tf: bool = False
) -> CorpusStats:
    tokens = filter_stopwords(tokenize(_parallelize_scan(documents)))
    tf = term_frequencies(tokens)
    if cache_tf:
        tf = tf.cache()
    n_docs = corpus_size(documents)
    df_stats = document_frequencies(tf)
    return CorpusStats(
        documents=documents,
        tokens=tokens,
        tf=tf,
        dlen=doc_lengths(tf),
        df_stats=df_stats,
        idf_stats=idf(df_stats, n_docs),
        n_docs=n_docs,
    )


def corpus_stats_for(
    spark: SparkSession, sf_dir: str, cache_tf: bool = False
) -> CorpusStats:
    return build_corpus_stats(load_documents(spark, sf_dir), cache_tf=cache_tf)
