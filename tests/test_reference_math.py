"""Differential tests against a non-distributed Python reimplementation of
the reference's scoring math — the same role ``util/TfIdfUtil.java`` plays
in the reference repo (a local oracle for the distributed path), here
actually wired into the test suite (the reference never was — SURVEY.md §5).
"""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from flink_bm25_spark.config import BM25_B, BM25_K1, DEFAULT_QUERY_TERMS, STOPWORDS
from flink_bm25_spark.operators.bm25 import bm25_rank
from flink_bm25_spark.operators.mllib_pipeline import (
    fit_tfidf,
    transform_tfidf,
    vocabulary,
)
from flink_bm25_spark.operators.pipeline import corpus_stats_for
from flink_bm25_spark.sources.tables import load_documents
from tests.conftest import SF_DIR


def _local_corpus(spark):
    docs = load_documents(spark, SF_DIR).select("doc_id", "text").collect()
    toks = {
        r.doc_id: [
            w
            for w in re.split(r"\s+", r.text.lower())
            if w and w not in STOPWORDS
        ]
        for r in docs
    }
    return toks


@pytest.fixture(scope="module")
def local(spark):
    toks = _local_corpus(spark)
    tf = {d: Counter(ws) for d, ws in toks.items()}
    df = Counter()
    for c in tf.values():
        df.update(c.keys())
    n = len(toks)
    idf = {w: math.log(n / (d + 1)) for w, d in df.items()}
    dl = {d: sum(c.values()) for d, c in tf.items()}
    avgdl = sum(dl.values()) / n
    return {"tf": tf, "df": df, "idf": idf, "dl": dl, "avgdl": avgdl, "n": n}


def test_tf_df_idf_match_local(spark, local):
    s = corpus_stats_for(spark, SF_DIR)
    got_tf = {(r.doc_id, r.word): r.tf for r in s.tf.collect()}
    want_tf = {
        (d, w): c for d, cs in local["tf"].items() for w, c in cs.items()
    }
    assert got_tf == want_tf
    got_df = {r.word: r.df for r in s.df_stats.collect()}
    assert got_df == dict(local["df"])
    got_idf = {r.word: r.idf for r in s.idf_stats.collect()}
    for w, v in got_idf.items():
        assert abs(v - local["idf"][w]) < 1e-12, w


def test_bm25_matches_local(spark, local):
    s = corpus_stats_for(spark, SF_DIR)
    ranked = bm25_rank(s.tf, s.idf_stats, s.dlen, DEFAULT_QUERY_TERMS, k=10).collect()

    def score(d):
        total = 0.0
        for q in DEFAULT_QUERY_TERMS:
            tf = local["tf"][d].get(q, 0)
            if tf == 0:
                continue
            denom = tf + BM25_K1 * (
                1 - BM25_B + BM25_B * local["dl"][d] / local["avgdl"]
            )
            total += local["idf"][q] * tf * (BM25_K1 + 1) / denom
        return total

    want = sorted(
        ((round(score(d), 6), d) for d in local["tf"]),
        key=lambda t: (-t[0], t[1]),
    )[:10]
    got = [(r.score, r.doc_id) for r in ranked]
    assert got == [(s_, d) for s_, d in want]


def test_mllib_pipeline_idf_consistent(spark, local):
    docs = load_documents(spark, SF_DIR)
    model = fit_tfidf(docs)
    vocab = vocabulary(model)
    out = transform_tfidf(model, docs).limit(5).collect()
    n = local["n"]
    for row in out:
        tf_vec, tfidf_vec = row.tf_vec, row.tfidf_vec
        for idx, tf_val in zip(tf_vec.indices, tf_vec.values):
            w = vocab[idx]
            # MLlib idf = ln((N+1)/(df+1)); engine idf = ln(N/(df+1))
            mllib_idf = math.log((n + 1) / (local["df"][w] + 1))
            assert abs(tfidf_vec[int(idx)] - tf_val * mllib_idf) < 1e-9
            assert (
                abs((mllib_idf - local["idf"][w]) - math.log((n + 1) / n)) < 1e-12
            )


def test_mllib_tf_matches_relational_tf(spark, local):
    docs = load_documents(spark, SF_DIR)
    model = fit_tfidf(docs)
    vocab = vocabulary(model)
    row = transform_tfidf(model, docs).where("doc_id = 0").first()
    got = {vocab[i]: int(v) for i, v in zip(row.tf_vec.indices, row.tf_vec.values)}
    assert got == dict(local["tf"][0])
