"""Scale-up smoke: self-multiply the corpus N× in-plan and run the heavy
pipelines, checking that runtime grows ~linearly and nothing driver-side
blows up — the local proxy for "would this survive a 100× scale-up".

The multiplication is a crossJoin with a replica-id range, giving each
copy a distinct doc_id — so TF/DF/minhash see a genuinely larger corpus
(more docs), not just duplicated rows.

Run: python scripts/scale_smoke.py [multiplier]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from flink_bm25_spark.config import DEFAULT_QUERY_TERMS
    from flink_bm25_spark.operators.bm25 import bm25_rank
    from flink_bm25_spark.operators.dedup import minhash_dedup_pairs
    from flink_bm25_spark.operators.pipeline import build_corpus_stats
    from flink_bm25_spark.session import get_spark
    from flink_bm25_spark.sources.tables import load_documents

    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="scale_smoke")
    base = load_documents(spark, sf_dir)
    n_base = base.count()

    replicas = spark.range(mult).select(F.col("id").alias("rep"))
    big = (
        base.crossJoin(replicas)
        .select(
            (F.col("doc_id") + F.col("rep") * F.lit(10_000_000)).alias("doc_id"),
            "text",
            "lang",
            "source",
            "n_chars",
        )
    )

    # NOTE: near-dup *pair* pipelines are excluded on purpose — replicating
    # every document N times makes each doc N-1 true duplicates, so the
    # correct OUTPUT grows quadratically in N regardless of engine.  The
    # signature stages (linear output) are what a scale smoke can assert.
    from flink_bm25_spark.operators.dedup import minhash_signatures_wide, shingles

    results = {}
    for label, docs in [("base", base), (f"x{mult}", big)]:
        t0 = time.perf_counter()
        stats = build_corpus_stats(docs, cache_tf=True)
        ranked = bm25_rank(
            stats.tf, stats.idf_stats, stats.dlen, DEFAULT_QUERY_TERMS, k=10
        ).collect()
        bm25_sec = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_sigs = minhash_signatures_wide(shingles(docs)).count()
        sig_sec = time.perf_counter() - t0
        stats.tf.unpersist()
        results[label] = (bm25_sec, sig_sec)
        print(
            f"{label}: docs={docs.count()} bm25={bm25_sec:.1f}s "
            f"minhash_sigs={sig_sec:.1f}s ({n_sigs} signatures, "
            f"top1={ranked[0].doc_id if ranked else None})"
        )

    b, m = results["base"], results[f"x{mult}"]
    print(
        f"scale factor {mult}x -> bm25 time ratio {m[0] / b[0]:.1f}x, "
        f"minhash-signature ratio {m[1] / b[1]:.1f}x (linear would be "
        f"{mult}.0x; sub-linear = fixed overhead amortized, "
        f"super-linear = red flag)"
    )

    # Connected components: scale the number of chains at fixed chain
    # length, so the iteration count (log of diameter) stays constant and
    # runtime should grow ~linearly with edges.
    from flink_bm25_spark.operators.graph import connected_components

    chain = 64
    cc = {}
    for label, n_nodes in [("base", 64_000), (f"x{mult}", 64_000 * mult)]:
        edges = (
            spark.range(n_nodes)
            .where((F.col("id") % chain) != chain - 1)
            .select(F.col("id").alias("d1"), (F.col("id") + 1).alias("d2"))
        )
        t0 = time.perf_counter()
        n_comp = (
            connected_components(edges).select("component").distinct().count()
        )
        cc[label] = time.perf_counter() - t0
        assert n_comp == n_nodes // chain, (n_comp, n_nodes // chain)
        print(f"cc {label}: {n_nodes} nodes, {n_comp} components, {cc[label]:.1f}s")
    print(
        f"cc scale {mult}x -> time ratio {cc[f'x{mult}'] / cc['base']:.1f}x "
        f"(constant iterations; linear would be {mult}.0x)"
    )

    # Relational suite: replicate lineitem+orders with shifted orderkeys
    # (join fan-out preserved: each replica joins only its own replica's
    # orders) and run the heaviest TPC-H shapes.  Near-linear growth means
    # the shuffle joins scale with data, not with pair-space.
    from flink_bm25_spark.plans.tpch import (
        q5_local_supplier_volume,
        q18_large_volume_customers,
    )
    from flink_bm25_spark.sources.tables import load_table

    key_shift = 1_000_000_000
    rel = {}
    li_base = load_table(spark, "lineitem", sf_dir)
    ord_base = load_table(spark, "orders", sf_dir)
    tmp = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       "spark-warehouse", "scale_smoke_rel")
    for label, m_ in [("base", 1), (f"x{mult}", mult)]:
        reps = spark.range(m_).select(F.col("id").alias("rep"))
        li = li_base.crossJoin(reps).withColumn(
            "l_orderkey", F.col("l_orderkey") + F.col("rep") * key_shift
        ).drop("rep")
        od = ord_base.crossJoin(reps).withColumn(
            "o_orderkey", F.col("o_orderkey") + F.col("rep") * key_shift
        ).drop("rep")
        # materialize the scaled tables so the timed join reads parquet,
        # not the crossJoin generator
        d = f"{tmp}_{label}"
        li.write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
        od.write.mode("overwrite").parquet(f"{d}/orders.parquet")
        for t in ("region", "nation", "customer", "supplier", "part"):
            load_table(spark, t, sf_dir).write.mode("overwrite").parquet(
                f"{d}/{t}.parquet"
            )
        t0 = time.perf_counter()
        n5 = q5_local_supplier_volume(spark, d).count()
        n18 = q18_large_volume_customers(spark, d).count()
        rel[label] = time.perf_counter() - t0
        print(
            f"tpch {label}: lineitem x{m_} -> q5 rows={n5} "
            f"q18 rows={n18} in {rel[label]:.1f}s"
        )
    print(
        f"tpch scale {mult}x -> time ratio {rel[f'x{mult}'] / rel['base']:.1f}x "
        f"(linear would be {mult}.0x)"
    )

    # Decontamination: fixed benchmark set, train side multiplied N× —
    # the broadcast probe's cost should track the TRAIN side linearly
    # (per-doc output, no pair-space term).
    from flink_bm25_spark.operators.decontam import contamination

    bench = base.limit(25)
    dc = {}
    for label, docs in [("base", base), (f"x{mult}", big)]:
        t0 = time.perf_counter()
        n_flagged = contamination(docs, bench, n=3, min_overlap=3).count()
        dc[label] = time.perf_counter() - t0
        print(f"decontam {label}: {n_flagged} overlapping docs, {dc[label]:.1f}s")
    print(
        f"decontam scale {mult}x -> time ratio {dc[f'x{mult}'] / dc['base']:.1f}x "
        f"(linear would be {mult}.0x)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
