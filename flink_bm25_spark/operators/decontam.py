"""Benchmark decontamination — n-gram overlap of a training corpus
against a held-out evaluation set (north-star training-data-pipeline
extension; the reference has no notion of held-out data — its whole
corpus flows into one TF/DF store, ``BatchBM25PreMain.java:162-248``).

A pretraining corpus must not contain the benchmarks it will be judged
on.  The standard check (GPT-3 appendix C, PaLM §7) flags a training
document when it shares at least ``min_overlap`` word n-grams with any
eval document.  Relationally that is:

    train_shingles ⋉ eval_shingles  →  per-doc overlap counts

Scale posture: eval sets are minuscule next to the corpus (thousands of
docs vs billions), so the distinct eval-gram relation is **broadcast** —
the 100 TB train side is never shuffled for the probe.  The only
exchange on the train side is the per-doc aggregation of its matched
grams, whose input is already tiny (matched grams only).  The expensive
relation (all train shingles) is a pure map-side generator
(:func:`flink_bm25_spark.operators.dedup.shingles`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_bm25_spark.operators.dedup import shingles

#: Overlapping n-grams before a training doc is flagged as contaminated.
DEFAULT_MIN_OVERLAP = 3
#: Shingle width for the overlap test (real pipelines use 8-13; the
#: synthetic fixture docs are ~50-300 words so 5 keeps the test sharp).
DEFAULT_NGRAM = 5


def overlap_counts(
    docs: DataFrame,
    eval_grams: DataFrame,
    n: int = DEFAULT_NGRAM,
    shingles_rel: DataFrame | None = None,
) -> DataFrame:
    """``(doc_id, n_overlap)`` — per-doc count of shingles present in the
    eval gram set.  The streaming-legal core of the contamination check:
    shingling is pure map-side (per-doc ``array_distinct``), the probe is
    a broadcast stream-static join, and the ONE aggregation budget of an
    update-mode stream pays for the per-doc count — so the same plan
    screens a live ingest feed against the benchmark set
    (``test_streaming_overlap_equals_batch``).

    ``shingles_rel`` optionally supplies a pre-built (cached) shingle
    relation of ``docs`` at width ``n`` (r10): batch composites that
    already shingled the same corpus pass it so the train side is not
    re-shingled — Spark's cache manager cannot substitute it
    automatically because HOF lambda variables defeat plan-equality.
    """
    sh = shingles_rel if shingles_rel is not None else shingles(docs, n=n)
    return (
        sh.join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap"))
    )


def contamination(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = DEFAULT_NGRAM,
    min_overlap: int = DEFAULT_MIN_OVERLAP,
) -> DataFrame:
    """Per-train-doc contamination stats against a benchmark corpus.

    Returns ``(doc_id, n_grams, n_overlap, contaminated)`` for every
    train document that overlaps the benchmark in at least one n-gram:
    ``n_grams`` is the doc's distinct-shingle count, ``n_overlap`` how
    many of those appear anywhere in the benchmark, ``contaminated``
    whether ``n_overlap >= min_overlap``.

    Both inputs need ``(doc_id, text)``.  The benchmark gram set is
    deduplicated to gram level and broadcast.

    The train shingle relation feeds BOTH the per-doc size aggregate
    and the overlap probe — it is cached so the corpus is shingled once
    per action, not twice (r10; batch composite, the streaming-legal
    path is :func:`overlap_counts` alone).
    """
    train_sh = shingles(train, n=n).cache()
    eval_grams = shingles(benchmark, n=n).select("gram").distinct()
    sizes = train_sh.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    overlap = overlap_counts(train, eval_grams, n=n, shingles_rel=train_sh)
    # `overlap` holds only docs that matched an eval gram — usually small
    # but DATA-dependent (template contamination can flag a large corpus
    # fraction), so no forced broadcast hint: AQE broadcasts when the
    # runtime size allows and falls back to a shuffled join when not.
    return (
        sizes.join(overlap, "doc_id")
        .select(
            "doc_id",
            "n_grams",
            "n_overlap",
            (F.col("n_overlap") >= F.lit(min_overlap)).alias("contaminated"),
        )
    )


def decontaminate(
    documents: DataFrame,
    benchmark: DataFrame,
    n: int = DEFAULT_NGRAM,
    min_overlap: int = DEFAULT_MIN_OVERLAP,
) -> DataFrame:
    """The corpus minus contaminated docs — an anti-join on the flagged
    id set.  The flagged set is contamination-fraction-sized and
    data-dependent, so the join strategy is left to AQE (broadcast when
    it fits, shuffled anti-join when it doesn't)."""
    flagged = (
        contamination(documents, benchmark, n=n, min_overlap=min_overlap)
        .where("contaminated")
        .select("doc_id")
    )
    return documents.join(flagged, "doc_id", "left_anti")


def contamination_bloom(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = DEFAULT_NGRAM,
    min_overlap: int = DEFAULT_MIN_OVERLAP,
    bits: int = 1024,
    k: int = 7,
) -> DataFrame:
    """Bloom-filter variant of :func:`contamination` for benchmark sets
    too large to broadcast as a gram relation.

    :func:`contamination` broadcasts the distinct eval grams — O(eval
    set) bytes.  Here the eval grams collapse into a **fixed-size** Bloom
    filter (``bits`` bits, built in one mergeable aggregation), and the
    train side probes it as a pure map-side expression: the broadcast
    cost is O(bits) — constant, no matter how many benchmarks are
    screened.  The filter is the portable md5-derived Bloom of
    :mod:`flink_bm25_spark.operators.sketches`, so the flag decision is
    deterministic and exactly reproducible in any engine (the oracle
    replays the same bits).

    One-sided error, in the SAFE direction for decontamination: false
    positives can only INFLATE ``n_overlap_bloom`` (never deflate), so a
    contaminated doc is never missed; a clean doc may occasionally be
    over-dropped (rate set by bits/k vs eval-gram count).

    Returns ``(doc_id, n_grams, n_overlap_bloom, contaminated)`` for
    docs with at least one probe hit.
    """
    from flink_bm25_spark.operators.sketches import (  # noqa: PLC0415
        bloom_build,
        bloom_might_contain,
    )

    eval_grams = shingles(benchmark, n=n).select("gram").distinct()
    # 16-row (bits/64) relation — collected driver-side like any sketch,
    # then shipped as literals inside the probe expression.
    filter_rows = bloom_build(eval_grams, "gram", bits=bits, k=k).collect()

    train_sh = shingles(train, n=n)
    sizes = train_sh.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    hits = (
        bloom_might_contain(train_sh, "gram", filter_rows, bits=bits, k=k)
        .where("bloom_hit")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap_bloom"))
    )
    return sizes.join(hits, "doc_id").select(
        "doc_id",
        "n_grams",
        "n_overlap_bloom",
        (F.col("n_overlap_bloom") >= F.lit(min_overlap)).alias("contaminated"),
    )
