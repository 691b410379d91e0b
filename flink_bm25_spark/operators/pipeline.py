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

from functools import cached_property

from pyspark.sql import DataFrame, SparkSession

from flink_bm25_spark.operators.df_idf import corpus_size, document_frequencies, idf
from flink_bm25_spark.operators.tf import doc_lengths, term_frequencies
from flink_bm25_spark.operators.tokenize import filter_stopwords, tokenize
from flink_bm25_spark.sources.tables import load_documents


class CorpusStats:
    """All BM25 sufficient statistics as lazy DataFrames.

    ``n_docs``/``idf_stats`` are cached properties: the corpus count is a
    real Spark job, so consumers that only need TF/DF/doc-length never pay
    for it.
    """

    def __init__(
        self,
        documents: DataFrame,
        tokens: DataFrame,
        tf: DataFrame,
        dlen: DataFrame,
        df_stats: DataFrame,
    ):
        self.documents = documents
        self.tokens = tokens
        self.tf = tf
        self.dlen = dlen
        self.df_stats = df_stats

    @cached_property
    def n_docs(self) -> int:
        return corpus_size(self.documents)

    @cached_property
    def idf_stats(self) -> DataFrame:
        return idf(self.df_stats, self.n_docs)


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
    documents: DataFrame, cache_tf: bool = False, tokenizer=tokenize
) -> CorpusStats:
    """``tokenizer`` is any ``documents -> (doc_id, word)`` transform — the
    default regex tokenizer, or a model-backed slot like
    ``partial(tokenize_with_udf, segment=cjk_segment)``; every downstream
    statistic (TF/DF/IDF/BM25) is tokenizer-agnostic."""
    tokens = filter_stopwords(tokenizer(_parallelize_scan(documents)))
    tf = term_frequencies(tokens)
    if cache_tf:
        tf = tf.cache()
    return CorpusStats(
        documents=documents,
        tokens=tokens,
        tf=tf,
        dlen=doc_lengths(tf),
        df_stats=document_frequencies(tf),
    )


def corpus_stats_for(
    spark: SparkSession, sf_dir: str, cache_tf: bool = False
) -> CorpusStats:
    return build_corpus_stats(load_documents(spark, sf_dir), cache_tf=cache_tf)
