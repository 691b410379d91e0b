"""MLlib TF-IDF pipeline — the vectorized twin of the relational pipeline
(BASELINE.json: "MLlib TF-IDF pipeline for BM25 scoring").

``RegexTokenizer → StopWordsRemover → CountVectorizer → IDF`` produces
per-document sparse TF-IDF vectors; :func:`bm25_score_vectors` completes
BM25 scoring against a term query using the fitted vocabulary.

Semantics note: MLlib's ``IDF`` uses the smoothed formula
``ln((N+1)/(df+1))`` while the relational engine pins the reference's
``ln(N/(df+1))`` (``util/TfIdfUtil.java:121``, float-division variant per
SURVEY.md §5).  The differential test accounts for the exact delta, which
is a constant ``ln((N+1)/N)`` per term.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.feature import IDF, CountVectorizer, RegexTokenizer, StopWordsRemover
from pyspark.sql import DataFrame

from flink_bm25_spark.config import STOPWORDS


def build_tfidf_pipeline(
    text_col: str = "text",
    stopwords: tuple[str, ...] = STOPWORDS,
    vocab_size: int = 1 << 18,
) -> Pipeline:
    tokenizer = RegexTokenizer(
        inputCol=text_col, outputCol="raw_tokens", pattern=r"\s+", toLowercase=True
    )
    remover = StopWordsRemover(
        inputCol="raw_tokens", outputCol="tokens", stopWords=list(stopwords)
    )
    vectorizer = CountVectorizer(
        inputCol="tokens", outputCol="tf_vec", vocabSize=vocab_size, minDF=1.0
    )
    idf = IDF(inputCol="tf_vec", outputCol="tfidf_vec")
    return Pipeline(stages=[tokenizer, remover, vectorizer, idf])


def fit_tfidf(documents: DataFrame, **kwargs) -> PipelineModel:
    return build_tfidf_pipeline(**kwargs).fit(documents)


def transform_tfidf(model: PipelineModel, documents: DataFrame) -> DataFrame:
    """``(doc_id, tf_vec, tfidf_vec)`` — sparse vectors per document."""
    return model.transform(documents).select("doc_id", "tf_vec", "tfidf_vec")


def vocabulary(model: PipelineModel) -> list[str]:
    """Fitted vocabulary, index-aligned with the vector dimensions."""
    cv = next(s for s in model.stages if hasattr(s, "vocabulary"))
    return list(cv.vocabulary)
