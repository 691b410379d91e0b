"""BM25Engine facade: fit/search/save/load lifecycle."""

from __future__ import annotations

import tempfile

import pytest

from flink_bm25_spark.api import BM25Engine, _tokenize_query
from flink_bm25_spark.config import DEFAULT_QUERY_TERMS
from flink_bm25_spark.operators.bm25 import bm25_rank
from flink_bm25_spark.operators.pipeline import corpus_stats_for
from flink_bm25_spark.sources.tables import load_documents
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def engine(spark):
    return BM25Engine.fit(load_documents(spark, SF_DIR))


def test_search_matches_low_level_rank(spark, engine):
    s = corpus_stats_for(spark, SF_DIR)
    want = [
        (r.doc_id, r.score)
        for r in bm25_rank(s.tf, s.idf_stats, s.dlen, DEFAULT_QUERY_TERMS, 10).collect()
    ]
    got = [
        (r.doc_id, r.score)
        for r in engine.search(" ".join(DEFAULT_QUERY_TERMS), k=10).collect()
    ]
    assert got == want


def test_query_tokenization_drops_stopwords(spark):
    assert _tokenize_query("the spark A join") == ("spark", "join")
    with pytest.raises(ValueError):
        _tokenize_query("the a")


def test_save_load_roundtrip(spark, engine):
    with tempfile.TemporaryDirectory() as d:
        engine.save(d)
        loaded = BM25Engine.load(spark, d)
        assert loaded.stats.n_docs == engine.stats.n_docs
        want = [(r.doc_id, r.score) for r in engine.search("spark join", 5).collect()]
        got = [(r.doc_id, r.score) for r in loaded.search("spark join", 5).collect()]
        assert got == want


def test_term_stats_and_vectors(spark, engine):
    ts = {r.word: r.df for r in engine.term_stats("spark", "join").collect()}
    assert set(ts) == {"spark", "join"} and all(v > 0 for v in ts.values())
    vecs = engine.doc_vectors(k=5)
    row = vecs.first()
    assert len(row.tf) <= 5


def test_incremental_update_equals_full_fit(spark):
    from pyspark.sql import functions as F

    docs = load_documents(spark, SF_DIR)
    old = docs.where(F.col("doc_id") % 5 != 0)
    new = docs.where(F.col("doc_id") % 5 == 0)
    merged = BM25Engine.fit(old).update(new)
    full = BM25Engine.fit(docs)
    assert merged.stats.n_docs == full.stats.n_docs

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    assert rows(merged.stats.tf) == rows(full.stats.tf)
    assert rows(merged.stats.dlen) == rows(full.stats.dlen)
    assert rows(merged.stats.df_stats) == rows(full.stats.df_stats)
    q = " ".join(DEFAULT_QUERY_TERMS)
    assert rows(merged.search(q, 10)) == rows(full.search(q, 10))
