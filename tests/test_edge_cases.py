"""Degenerate-input behavior: empty corpus, single doc, all-stopword docs.

At 100 TB these shapes appear constantly as *partitions* (an empty date
partition, a shard with one document) — operators must return empty/small
relations, never throw or emit NULL-poisoned rows (ANSI mode is on).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_bm25_spark.config import DEFAULT_QUERY_TERMS
from flink_bm25_spark.operators.bm25 import bm25_rank
from flink_bm25_spark.operators.dedup import exact_duplicates, minhash_dedup_pairs
from flink_bm25_spark.operators.pipeline import build_corpus_stats
from flink_bm25_spark.operators.text_analysis import quality_scores, token_stats

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOC_SCHEMA)


def _mk(doc_id, text):
    return (doc_id, text, "en", "t", len(text))


def test_empty_corpus_everything_empty(spark):
    docs = _docs(spark, [])
    stats = build_corpus_stats(docs)
    assert stats.tf.count() == 0
    assert stats.dlen.count() == 0
    assert stats.idf_stats.count() == 0
    assert bm25_rank(stats.tf, stats.idf_stats, stats.dlen, DEFAULT_QUERY_TERMS).count() == 0
    assert exact_duplicates(docs).count() == 0
    assert quality_scores(docs).count() == 0


def test_single_doc_corpus(spark):
    docs = _docs(spark, [_mk(1, "spark join spark")])
    stats = build_corpus_stats(docs)
    tf = {(r.doc_id, r.word): r.tf for r in stats.tf.collect()}
    assert tf == {(1, "spark"): 2, (1, "join"): 1}
    ranked = bm25_rank(stats.tf, stats.idf_stats, stats.dlen, ("spark",)).collect()
    # one doc, idf = ln(1/(1+1)) < 0 — still exactly one deterministic row
    assert [r.doc_id for r in ranked] == [1]
    assert minhash_dedup_pairs(docs, 0.8).count() == 0  # no pair with itself


def test_all_stopword_doc_drops_out(spark):
    # "the a" tokenizes entirely to stopwords -> no TF rows, doc length 0;
    # the doc must vanish from statistics, not divide-by-zero in scoring
    docs = _docs(spark, [_mk(1, "the a the"), _mk(2, "spark streaming")])
    stats = build_corpus_stats(docs)
    assert {r.doc_id for r in stats.tf.collect()} == {2}
    assert {r.doc_id for r in stats.dlen.collect()} == {2}
    ranked = bm25_rank(stats.tf, stats.idf_stats, stats.dlen, ("spark",)).collect()
    assert [r.doc_id for r in ranked] == [2]


def test_whitespace_only_and_empty_text(spark):
    docs = _docs(spark, [_mk(1, "   "), _mk(2, ""), _mk(3, "ok words here")])
    stats = build_corpus_stats(docs)
    assert {r.doc_id for r in stats.tf.collect()} == {3}
    ts = {r.doc_id: r.n_tokens for r in token_stats(docs).collect()}
    assert ts == {1: 0, 2: 0, 3: 3}


def test_quality_scores_no_nulls_on_degenerate_text(spark):
    docs = _docs(spark, [_mk(1, ""), _mk(2, "!!!"), _mk(3, "ok")])
    rows = quality_scores(docs).collect()
    assert len(rows) == 3
    for r in rows:
        assert r.keep_score is not None  # guarded CASE, not NULL poison


def test_new_ops_on_degenerate_corpora(spark):
    """Round-2 operators on empty / single-doc / whitespace-only inputs:
    empty or small relations, never a throw (ANSI mode is on)."""
    from flink_bm25_spark.operators.cleaning import (
        clean_corpus_keep_best,
        elect_cluster_representatives,
    )
    from flink_bm25_spark.operators.dedup import (
        winnowing_dedup_pairs,
        winnowing_fingerprints,
    )
    from flink_bm25_spark.operators.sampling import (
        leakage_safe_split,
        token_budget_sample,
    )
    from flink_bm25_spark.operators.text_analysis import textrank_keywords

    empty = _docs(spark, [])
    assert winnowing_fingerprints(empty).count() == 0
    assert winnowing_dedup_pairs(empty).count() == 0
    assert textrank_keywords(empty).count() == 0
    assert elect_cluster_representatives(empty).count() == 0
    assert clean_corpus_keep_best(empty).count() == 0
    assert leakage_safe_split(empty).count() == 0
    assert token_budget_sample(empty, 100).count() == 0

    degenerate = _docs(
        spark, [_mk(1, ""), _mk(2, "   "), _mk(3, "one"), _mk(4, "a b")]
    )
    # shorter than k tokens -> no grams -> no fingerprints, no pairs
    assert winnowing_fingerprints(degenerate).count() == 0
    assert winnowing_dedup_pairs(degenerate).count() == 0
    # single bigram "a b" -> one symmetric edge, two ranked words
    tr = {r.word: r.tr_rank for r in textrank_keywords(degenerate).collect()}
    assert set(tr) == {"a", "b"} and tr["a"] == tr["b"]
    # every doc gets a split; budget sampling keeps the short docs
    assert leakage_safe_split(degenerate).count() == 4
    kept = token_budget_sample(degenerate, 100, group_col="lang")
    assert kept.count() == 4  # all under budget (0+0+1+2 tokens)


def test_funnel_and_cohort_on_empty_events(spark):
    from flink_bm25_spark.operators.sessions import (
        cohort_retention,
        funnel_counts,
    )

    events = spark.createDataFrame(
        [], "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )
    assert cohort_retention(events).count() == 0
    got = {r.step: r.n_users for r in funnel_counts(events).collect()}
    assert got == {"view": 0, "click": 0, "purchase": 0}
