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
from pyspark.sql import functions as F

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
        # r9: N joins in as a broadcast 1-row aggregate — touching
        # idf_stats no longer runs a corpus-count job at construction
        # time (one full corpus pass per BM25-family query at scale).
        # A pre-seeded n_docs (merge_corpus_stats' additive count, or a
        # consumer that already paid the count job) keeps the literal
        # form — otherwise merged stats would recount the ENTIRE
        # old∪new archive in-plan per action, defeating the merge
        # path's O(append) contract.
        if self.documents is None or "n_docs" in self.__dict__:
            return idf(self.df_stats, self.n_docs)
        from flink_bm25_spark.operators.df_idf import idf_relational  # noqa: PLC0415

        return idf_relational(self.df_stats, self.documents)


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
    documents: DataFrame,
    cache_tf: bool = False,
    tokenizer=tokenize,
    pos_filter: bool = False,
) -> CorpusStats:
    """``tokenizer`` is any ``documents -> (doc_id, word)`` transform — the
    default regex tokenizer, or a model-backed slot like
    ``partial(tokenize_with_udf, segment=cjk_segment)``; every downstream
    statistic (TF/DF/IDF/BM25) is tokenizer-agnostic.

    ``pos_filter=True`` reproduces the reference's FULL fused predicate —
    keep only noun-family tokens AND drop stopwords
    (``BatchBM25PreMain.java:38-48,191``) — so every downstream statistic
    is computed over exactly the token population the reference used.
    The tag + filter are scalar CASE expressions fused into the tokenize
    stage (no extra shuffle, no Python).
    """
    tokens = filter_stopwords(tokenizer(_parallelize_scan(documents)))
    if pos_filter:
        from flink_bm25_spark.functions.pos import (  # noqa: PLC0415
            filter_nature,
            pos_tag,
        )

        tokens = filter_nature(pos_tag(tokens)).drop("nature")
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


def merge_corpus_stats(
    old: CorpusStats, new_documents: DataFrame, tokenizer=tokenize
) -> CorpusStats:
    """Batch-incremental update: fold a batch of NEW documents into
    existing statistics without re-tokenizing the old corpus.

    This is the reference's incremental flow (tokenize each new doc, write
    its TF, ``$inc`` the global DF — ``BatchBM25PreMain.java:107-123``)
    restated corpus-at-once: tokenize ONLY the new batch, then

    - ``tf``/``dlen``: plain union (doc-level relations, new doc_ids are
      the caller's contract — re-ingesting an existing id would double it,
      same as the reference's sink),
    - ``df``: additive merge — union of the two (word, df) relations,
      summed per word.  O(new batch) work; the old corpus never rescans.

    At 100 TB this is the difference between an append being proportional
    to the APPEND and proportional to the archive.
    """
    new = build_corpus_stats(new_documents, tokenizer=tokenizer)
    docs = (
        old.documents.unionByName(new_documents)
        if old.documents is not None
        else None
    )
    merged = CorpusStats(
        documents=docs,
        tokens=None,
        tf=old.tf.unionByName(new.tf),
        dlen=old.dlen.unionByName(new.dlen),
        df_stats=old.df_stats.unionByName(new.df_stats)
        .groupBy("word")
        .agg(F.sum("df").cast("long").alias("df")),
    )
    # n_docs is additive — pre-seed so no consumer pays a recount job.
    merged.n_docs = old.n_docs + corpus_size(new_documents)
    return merged
