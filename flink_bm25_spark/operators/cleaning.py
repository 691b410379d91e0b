"""End-to-end corpus cleaning — the composed training-data pipeline.

The reference stops at per-operator outputs; a 100 TB pretraining pipeline
composes them: quality-score every document, detect near-duplicate
clusters, elect one canonical document per cluster, and emit the kept
set.  This module is that composition — one declarative plan, so Catalyst
shares the scan and prunes columns across all three stages.

Scale shape: quality scoring is pure map-side codegen (no shuffle);
near-dup detection is the LSH pipeline (shuffles bounded by band-bucket
collisions, :mod:`flink_bm25_spark.operators.dedup`); cluster election is
O(log d) label propagation (:mod:`flink_bm25_spark.operators.graph`); the
final filter is a **left-anti join against the loser set**, which is tiny
relative to the corpus (duplicate fraction × corpus) and broadcastable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_bm25_spark.operators.dedup import minhash_dedup_pairs
from flink_bm25_spark.operators.graph import dedup_clusters
from flink_bm25_spark.operators.text_analysis import quality_scores


def clean_corpus(
    documents: DataFrame,
    min_keep_score: float = 0.2,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """``(doc_id, keep_score)`` for every document that survives cleaning:
    ``keep_score >= min_keep_score`` AND not a non-canonical member of a
    near-duplicate cluster (cluster-min doc id survives for each cluster).
    """
    scored = quality_scores(documents).select("doc_id", "keep_score")
    pairs = minhash_dedup_pairs(documents, jaccard_threshold)
    losers = (
        dedup_clusters(pairs)
        .where(F.col("doc_id") != F.col("canonical_id"))
        .select("doc_id")
    )
    return scored.where(F.col("keep_score") >= min_keep_score).join(
        F.broadcast(losers), "doc_id", "left_anti"
    )
