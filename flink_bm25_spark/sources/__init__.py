"""Sources — parquet scans standing in for the reference's MongoDB reads."""

from flink_bm25_spark.sources.tables import (
    TABLES,
    load_documents,
    load_embeddings,
    load_events,
    load_table,
    register_views,
)

__all__ = [
    "TABLES",
    "load_documents",
    "load_embeddings",
    "load_events",
    "load_table",
    "register_views",
]
