"""Keyed upsert / slowly-changing-dimension operators.

The reference's sinks are keyed upserts: ``findOneAndUpdate({_id: pid},
$set, upsert=true)`` per TF document (``MongoTFSink.java:43-58``,
``backup/BatchBM25PrePrint.java:79-89``) and ``$inc`` per DF word
(``BatchBM25PreMain.java:115-121``).  Parquet has no row-level MERGE (that
is Delta/Iceberg territory — jars absent from this image, SURVEY.md §7),
so the engine provides the standard emulations:

- :func:`upsert` — last-write-wins keyed merge (anti-join + union): the
  exact batch semantics of the reference's ``$set`` upsert.
- :func:`upsert_additive` — ``$inc`` semantics: merge by key, summing a
  measure (the reference's incremental DF counter).
- :func:`scd2_apply` — type-2 history: closes the current version and
  appends the new one with validity intervals.

All are shuffle-on-key joins; with both sides bucketed on the key
(:func:`flink_bm25_spark.operators.sinks.write_bucketed_table`) the merge
runs shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert(base: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Last-write-wins keyed merge — rows of ``updates`` replace matching
    ``base`` rows, unmatched updates are inserts (``$set, upsert=true``)."""
    return base.join(updates.select(key), key, "left_anti").unionByName(updates)


def upsert_additive(
    base: DataFrame, updates: DataFrame, key: str, measure: str
) -> DataFrame:
    """``$inc`` semantics: measures of matching keys add, new keys insert
    (the reference's DF accumulation, ``BatchBM25PreMain.java:115-121``)."""
    return (
        base.unionByName(updates)
        .groupBy(key)
        .agg(F.sum(measure).cast("long").alias(measure))
    )


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key: str,
    ts_col: str = "valid_from",
    end_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Type-2 slowly-changing dimension: for each changed key, close the
    open version (``valid_to`` = the change's ``valid_from``) and append
    the change as the new current version.

    ``dim`` rows carry (key, attrs…, valid_from, valid_to, is_current);
    ``changes`` carry (key, attrs…, valid_from).  One window per key —
    partitioned by the key, so fully parallel.
    """
    changed_keys = changes.select(key).distinct()
    untouched = dim.join(changed_keys, key, "left_anti")

    new_rows = changes.withColumn(end_col, F.lit(None).cast("timestamp")).withColumn(
        current_col, F.lit(True)
    )
    affected = dim.join(changed_keys, key, "left_semi").unionByName(new_rows)

    w = Window.partitionBy(key).orderBy(F.col(ts_col))
    closed = (
        affected.withColumn("_next_from", F.lead(ts_col).over(w))
        .withColumn(end_col, F.coalesce(F.col("_next_from"), F.col(end_col)))
        .withColumn(current_col, F.col("_next_from").isNull())
        .drop("_next_from")
    )
    return untouched.unionByName(closed)
