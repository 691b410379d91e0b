"""Upsert batch-size scaling — evidence for the r8 fix of the r7 weak
(`bm25_index_upsert` used to collect the batch's distinct doc_ids to the
driver; re-crawl refresh makes that batch corpus-shaped).

Builds one index from sf0.1 documents replicated ×20 (100k docs with a
forward section), then times `bm25_index_upsert` at growing batch sizes
(1k / 10k / 100k docs).  The id set stays IN-PLAN at every size (above
`ISIN_TERM_CAP` the victim scan semi-joins the id relation; tombstones
derive from the batch by lineage) — the expected curve is ~linear in the
BATCH (the batch's own tokenize+TF shuffle dominates, the same work an
add pays), independent of driver memory.

Run: python scripts/upsert_scaling.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flink_bm25_spark.operators.serving import (
    bm25_index_save,
    bm25_index_save_forward,
    bm25_index_upsert,
    bm25_topk_from_index,
)
from flink_bm25_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TMP = os.environ.get("SPARK_GRAFT_TMP", "/tmp/spark_graft_upsert_scaling")


def main() -> None:
    spark = get_spark(app_name="upsert_scaling")
    base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    reps = spark.range(20).select(F.col("id").alias("rep"))
    docs = base.crossJoin(reps).select(
        (F.col("doc_id") + F.col("rep") * F.lit(10_000_000)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" rep"), F.col("rep")).alias("text"),
    )
    corpus = os.path.join(TMP, "corpus.parquet")
    docs.write.mode("overwrite").parquet(corpus)
    mat = spark.read.parquet(corpus)
    n = mat.count()

    idx = os.path.join(TMP, "idx")
    t0 = time.perf_counter()
    bm25_index_save(mat, idx, n_buckets=64)
    bm25_index_save_forward(mat, idx)
    print(f"index built: {n} docs in {time.perf_counter() - t0:.1f}s", flush=True)

    for batch_n in (1_000, 10_000, 100_000):
        repl = mat.where(F.pmod(F.col("doc_id"), F.lit((n // batch_n) or 1)) == 0).select(
            "doc_id",
            F.concat(F.lit("refreshed crawl "), F.col("text")).alias("text"),
        )
        got = repl.count()
        t0 = time.perf_counter()
        bm25_index_upsert(repl, idx)
        dt = time.perf_counter() - t0
        t0 = time.perf_counter()
        bm25_topk_from_index(spark, idx, ("spark", "stream", "join")).count()
        serve = time.perf_counter() - t0
        print(
            f"upsert {got} docs: {dt:.1f}s ({1000 * dt / max(got, 1):.2f} ms/doc);"
            f" serve with pending tombstones: {serve:.2f}s",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
