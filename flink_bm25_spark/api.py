"""High-level engine facade — the migration surface for a reference user.

The reference's workflow is: run the jar → TF/DF land in Mongo → a
downstream consumer scores BM25 from those collections.  Here the same
lifecycle is three calls:

    engine = BM25Engine.fit(spark, documents)     # corpus statistics
    engine.search("spark streaming join", k=10)   # ranked DataFrame
    engine.save("/path/stats")                    # durable statistics
    engine = BM25Engine.load(spark, "/path/stats")

``fit`` caches the TF relation (it feeds every downstream surface);
``save``/``load`` persist exactly the statistics the reference
materializes (TF, DF, doc lengths + corpus size), so scoring can run
without re-tokenizing — the Mongo-collections role, on parquet.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_bm25_spark.config import BM25_B, BM25_K1, STOPWORDS
from flink_bm25_spark.operators.bm25 import bm25_rank
from flink_bm25_spark.operators.df_idf import idf
from flink_bm25_spark.operators.pipeline import CorpusStats, build_corpus_stats
from flink_bm25_spark.operators.sinks import tf_vectors


def _tokenize_query(query: str, stopwords: tuple[str, ...] = STOPWORDS) -> tuple[str, ...]:
    terms = tuple(
        w for w in query.lower().split() if w and w not in stopwords
    )
    if not terms:
        raise ValueError(f"query {query!r} has no searchable terms")
    return terms


class BM25Engine:
    """Fitted BM25 statistics + search over them."""

    def __init__(self, stats: CorpusStats, k1: float = BM25_K1, b: float = BM25_B):
        self.stats = stats
        self.k1 = k1
        self.b = b

    # -- lifecycle ---------------------------------------------------------

    @classmethod
    def fit(cls, documents: DataFrame, k1: float = BM25_K1, b: float = BM25_B) -> "BM25Engine":
        return cls(build_corpus_stats(documents, cache_tf=True), k1=k1, b=b)

    def save(self, path: str) -> None:
        """Persist the sufficient statistics (the reference's tf5/idf4
        collections, as parquet)."""
        self.stats.tf.write.mode("overwrite").parquet(os.path.join(path, "tf"))
        self.stats.df_stats.write.mode("overwrite").parquet(os.path.join(path, "df"))
        self.stats.dlen.write.mode("overwrite").parquet(os.path.join(path, "dlen"))
        meta = {"n_docs": self.stats.n_docs, "k1": self.k1, "b": self.b}
        spark = self.stats.tf.sparkSession
        spark.createDataFrame([meta]).coalesce(1).write.mode("overwrite").json(
            os.path.join(path, "meta")
        )

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "BM25Engine":
        meta = json.loads(
            spark.read.text(os.path.join(path, "meta")).first()["value"]
        )
        tf = spark.read.parquet(os.path.join(path, "tf"))
        stats = CorpusStats(
            documents=None,
            tokens=None,
            tf=tf,
            dlen=spark.read.parquet(os.path.join(path, "dlen")),
            df_stats=spark.read.parquet(os.path.join(path, "df")),
        )
        stats.n_docs = int(meta["n_docs"])  # pre-seed the cached property
        eng = cls(stats, k1=float(meta["k1"]), b=float(meta["b"]))
        return eng

    def update(self, new_documents: DataFrame) -> "BM25Engine":
        """Fold a batch of NEW documents into the fitted statistics —
        O(batch) work, the old corpus is never re-tokenized (the
        reference's incremental ``$inc`` flow, corpus-at-once).  Returns a
        new engine; the caller's contract is that ``new_documents`` carries
        previously-unseen ``doc_id``\\s."""
        from flink_bm25_spark.operators.pipeline import merge_corpus_stats  # noqa: PLC0415

        return BM25Engine(
            merge_corpus_stats(self.stats, new_documents), k1=self.k1, b=self.b
        )

    # -- query surface -----------------------------------------------------

    def search(self, query: str, k: int = 10) -> DataFrame:
        """``(doc_id, score, rk)`` — BM25 top-k for a free-text query."""
        terms = _tokenize_query(query)
        return bm25_rank(
            self.stats.tf,
            self.stats.idf_stats,
            self.stats.dlen,
            terms,
            k=k,
            k1=self.k1,
            b=self.b,
        )

    def term_stats(self, *words: str) -> DataFrame:
        """``(word, df, idf)`` for given terms (broadcastable dictionary)."""
        out = self.stats.idf_stats
        if words:
            out = out.where(F.col("word").isin(*words))
        return out

    def doc_vectors(self, k: int | None = 30) -> DataFrame:
        """The reference's nested sink shape: ``(doc_id, tf:[{w,c}])``."""
        return tf_vectors(self.stats.tf, k=k)
