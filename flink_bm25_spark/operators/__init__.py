"""Operator inventory (SURVEY.md §2) plus large-scale-pipeline extensions."""

from flink_bm25_spark.operators.tokenize import filter_stopwords, tokenize
from flink_bm25_spark.operators.tf import doc_lengths, term_frequencies, topk_terms
from flink_bm25_spark.operators.df_idf import corpus_size, document_frequencies, idf
from flink_bm25_spark.operators.bm25 import bm25_rank, tfidf
from flink_bm25_spark.operators.sinks import tf_vectors

__all__ = [
    "tokenize",
    "filter_stopwords",
    "term_frequencies",
    "doc_lengths",
    "topk_terms",
    "document_frequencies",
    "corpus_size",
    "idf",
    "tfidf",
    "bm25_rank",
    "tf_vectors",
]
