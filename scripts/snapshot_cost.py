"""Snapshot cost + pinned-read-parity evidence (r9): at growing corpus
multipliers, measure (a) `bm25_index_snapshot` wall (its cost IS a
compaction — pin files are zero-byte), (b) live serve vs pinned serve
wall on the same queries (expected: identical — the pinned plan is the
live plan rooted at the frozen tree, PLANS.md q_bm25_serve_snapshot),
and (c) the retained-copy disk cost.  Exponent
``log(t_big/t_small) / log(m_big/m_small)`` ≈ 1 for snapshot creation
(it folds the corpus), ≈ 0 for serve (bounded by query buckets).

Run: python scripts/snapshot_cost.py [mults]    # default "1,4,8"
Writes a markdown table to stdout; paste into THROUGHPUT.md.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flink_bm25_spark.operators.serving import (
    bm25_index_save,
    bm25_index_save_forward,
    bm25_index_snapshot,
    bm25_topk_from_index,
)
from flink_bm25_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TMP = os.environ.get("SPARK_GRAFT_TMP", "/tmp/spark_graft_snapshot_cost")
TERMS = ("spark", "stream", "join")


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def main() -> None:
    mults = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "1,4,8").split(",")]
    spark = get_spark(app_name="snapshot_cost")
    base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    rows = []
    for m in mults:
        reps = spark.range(m).select(F.col("id").alias("rep"))
        docs = base.crossJoin(reps).select(
            (F.col("doc_id") + F.col("rep") * F.lit(10_000_000)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" rep"), F.col("rep")).alias("text"),
        )
        idx = os.path.join(TMP, f"idx_x{m}")
        bm25_index_save(docs, idx, n_buckets=16)
        bm25_index_save_forward(docs, idx)
        n = docs.count()

        t0 = time.perf_counter()
        v = bm25_index_snapshot(spark, idx)
        snap_s = time.perf_counter() - t0
        disk = _du(idx)

        # warm both paths once, then time the min of 3
        def _t(version=None):
            best = float("inf")
            for _ in range(3):
                t = time.perf_counter()
                bm25_topk_from_index(
                    spark, idx, TERMS, version=version
                ).count()
                best = min(best, time.perf_counter() - t)
            return best

        live_s, pin_s = _t(None), _t(v)
        rows.append((m, n, snap_s, live_s, pin_s, disk / 1e6))
        print(
            f"x{m}: {n} docs  snapshot {snap_s:.2f}s  serve live/pinned "
            f"{live_s:.3f}/{pin_s:.3f}s  disk {disk/1e6:.1f} MB",
            flush=True,
        )

    def expo(a, b, ma, mb):
        return math.log(b / a) / math.log(mb / ma)

    print("\n| mult | docs | snapshot s | serve live s | serve pinned s | disk MB |")
    print("|---|---|---|---|---|---|")
    for m, n, s, ls, ps, d in rows:
        print(f"| {m}× | {n} | {s:.2f} | {ls:.3f} | {ps:.3f} | {d:.1f} |")
    if len(rows) >= 2:
        a, b = rows[0], rows[-1]
        print(
            f"\nexponents {a[0]}×→{b[0]}×: snapshot "
            f"{expo(a[2], b[2], a[0], b[0]):.2f}, serve live "
            f"{expo(a[3], b[3], a[0], b[0]):.2f}, serve pinned "
            f"{expo(a[4], b[4], a[0], b[0]):.2f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
