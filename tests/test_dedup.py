"""Structural invariants of the dedup sketches (beyond oracle parity):
LSH candidate generation must be a superset of true pairs at high
similarity; simhash banding recall is guaranteed, not statistical."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_bm25_spark.operators.dedup import (
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    minhash_signatures_wide,
    shingles,
    simhash_pairs,
    simhash_signatures,
)
from flink_bm25_spark.operators.pipeline import corpus_stats_for
from flink_bm25_spark.sources.tables import load_documents
from tests.conftest import SF_DIR


def test_minhash_lsh_covers_true_pairs(spark):
    docs = load_documents(spark, SF_DIR)
    sh = shingles(docs).cache()
    true_pairs = {
        (r.d1, r.d2) for r in jaccard_pairs(sh, 0.8).collect()
    }
    cands = {
        (r.d1, r.d2)
        for r in lsh_candidate_pairs(minhash_signatures_wide(sh)).collect()
    }
    missed = true_pairs - cands
    assert not missed, f"LSH missed high-similarity pairs: {missed}"
    sh.unpersist()


def test_minhash_signature_bounds(spark):
    docs = load_documents(spark, SF_DIR)
    sigs = minhash_signatures(shingles(docs))
    row = sigs.agg(
        F.min("mh").alias("lo"), F.max("mh").alias("hi"), F.count("*").alias("n")
    ).first()
    assert 0 <= row.lo <= row.hi < 2_147_483_647
    n_docs = docs.count()
    assert row.n == n_docs * 64  # one row per (doc, hash index)


def test_simhash_banding_exact_recall(spark):
    # brute-force hamming<=3 pairs must equal the banded result — the 4x15
    # pigeonhole guarantee, checked end-to-end
    tf = corpus_stats_for(spark, SF_DIR).tf
    sigs = simhash_signatures(tf).cache()
    banded = {(r.d1, r.d2) for r in simhash_pairs(sigs).collect()}
    a = sigs.selectExpr("doc_id d1", "simhash s1")
    b = sigs.selectExpr("doc_id d2", "simhash s2")
    brute = {
        (r.d1, r.d2)
        for r in a.join(b, F.col("d1") < F.col("d2"))
        .where(F.bit_count(F.col("s1").bitwiseXOR(F.col("s2"))) <= 3)
        .collect()
    }
    assert banded == brute
    sigs.unpersist()


def test_simhash_from_tokens_equals_tf_variant(spark):
    from flink_bm25_spark.operators.dedup import (
        simhash_signatures,
        simhash_signatures_from_tokens,
    )
    from flink_bm25_spark.operators.pipeline import corpus_stats_for

    stats = corpus_stats_for(spark, SF_DIR)
    via_tf = sorted(tuple(r) for r in simhash_signatures(stats.tf).collect())
    via_tokens = sorted(
        tuple(r) for r in simhash_signatures_from_tokens(stats.tokens).collect()
    )
    assert via_tf == via_tokens
