"""flink_bm25_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference ``ysyyhhh/flink-BM25``
(a Flink 1.12 BM25/TF-IDF text-search preprocessing engine), re-expressed
Spark-first: DataFrame/SQL + Catalyst + Structured Streaming.

Layout
------
- :mod:`flink_bm25_spark.session`    — tuned SparkSession builder
- :mod:`flink_bm25_spark.sources`    — parquet table loaders (reference: Mongo scans)
- :mod:`flink_bm25_spark.functions`  — scalar/column expression library
  (deterministic hashing, text stats, vector math)
- :mod:`flink_bm25_spark.operators`  — the operator inventory from SURVEY.md §2:
  tokenize/TF/DF/IDF/TF-IDF/BM25/top-k/union/sink-shapes, plus the
  large-scale-pipeline extensions (dedup, similarity search, text analysis,
  multimodal plumbing)
- :mod:`flink_bm25_spark.streaming`  — Structured Streaming surface
  (running word-count, stream-static union bootstrap, watermarked windows)
- :mod:`flink_bm25_spark.plans`      — plan inspection / scale-hygiene helpers

Design stance (vs the reference)
--------------------------------
The reference runs *two Flink jobs per document*
(``BatchBM25PreMain.java:210,247``). This engine is corpus-at-once: one lazy
DataFrame DAG, O(1) jobs, with the tokenized/TF relation reused by the TF,
DF and doc-length branches, so the whole TF+DF+BM25 pipeline costs two
shuffles. All statistics stay relational (exploded) until the sink boundary,
where the reference's nested ``{_id: pid, tf: [{w, c}]}`` document shape
(``model/TF.java:66-74``) is reconstructed with ``collect_list(struct(...))``.
"""

from flink_bm25_spark.config import (
    BM25_B,
    BM25_K1,
    DEFAULT_QUERY_TERMS,
    HASH_PRIME,
    STOPWORDS,
    TOP_K_TERMS,
)


def __getattr__(name):
    # lazy: importing the facade pulls in pyspark; keep bare package import light
    if name == "BM25Engine":
        from flink_bm25_spark.api import BM25Engine

        return BM25Engine
    raise AttributeError(name)


__all__ = [
    "BM25Engine",
    "BM25_B",
    "BM25_K1",
    "DEFAULT_QUERY_TERMS",
    "HASH_PRIME",
    "STOPWORDS",
    "TOP_K_TERMS",
]

__version__ = "0.1.0"
