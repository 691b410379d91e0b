"""CJK tokenization path: the pluggable tokenizer slot filled with a real
(deterministic bigram) segmenter, composed through the full BM25 pipeline —
the ansj-shaped workload of the reference (``BatchBM25PreMain.java:183-196``)
without its model dependency."""

from __future__ import annotations

from functools import partial

from flink_bm25_spark.functions.text import cjk_segment
from flink_bm25_spark.operators.bm25 import bm25_rank
from flink_bm25_spark.operators.pipeline import build_corpus_stats
from flink_bm25_spark.operators.tokenize import tokenize_with_udf


def test_cjk_segment_bigrams():
    assert cjk_segment("被告人王某") == ["被告", "告人", "人王", "王某"]
    # lone ideograph between non-CJK emits itself; Latin lowercased
    assert cjk_segment("the 法 Court") == ["the", "法", "court"]
    # punctuation breaks runs (no bigram across the comma)
    assert cjk_segment("被告，上诉") == ["被告", "上诉"]
    assert cjk_segment("") == []
    # mixed alphanumerics stay one word
    assert cjk_segment("案号2024第12号") == ["案号", "2024", "第", "12", "号"]


def test_cjk_bm25_end_to_end(spark):
    # A court-document-shaped corpus: doc 1 is about 被告人 (defendant),
    # doc 3 about 原告 (plaintiff).  The bigram 被告 appears in both roles'
    # words, but doc 1 repeats it most.
    docs = spark.createDataFrame(
        [
            (1, "被告人王某犯罪 被告人认罪"),
            (2, "证人陈述了事实经过"),
            (3, "原告提出诉讼请求 原告胜诉"),
        ],
        "doc_id long, text string",
    )
    stats = build_corpus_stats(
        docs, tokenizer=partial(tokenize_with_udf, segment=cjk_segment)
    )
    # the tokenizer slot feeds the same TF relation the regex path does
    tf = {(r["doc_id"], r["word"]): r["tf"] for r in stats.tf.collect()}
    assert tf[(1, "被告")] == 2
    assert tf[(3, "原告")] == 2
    ranked = bm25_rank(
        stats.tf, stats.idf_stats, stats.dlen, query_terms=("被告",), k=3
    ).collect()
    assert ranked[0]["doc_id"] == 1
    assert all(r["doc_id"] != 2 for r in ranked)  # doc 2 never matches


# --- dictionary-based FMM segmentation ------------------------------------


def test_fmm_prefers_longest_dictionary_word():
    from flink_bm25_spark.functions.text import make_fmm_segmenter

    seg = make_fmm_segmenter({"被告人", "被告", "人民法院"})
    # longest match wins (被告人 over 被告); OOV 在 falls back to the
    # overlapping bigram 在人; then 人民法院 matches whole.
    assert seg("被告人在人民法院") == ["被告人", "在人", "人民法院"]


def test_fmm_oov_degrades_to_bigrams():
    from flink_bm25_spark.functions.text import cjk_segment, make_fmm_segmenter

    seg = make_fmm_segmenter(set())
    # empty dictionary → identical to the default overlapping-bigram path
    assert seg("被告人王某") == cjk_segment("被告人王某")


def test_fmm_mixed_script_delegates_non_cjk():
    from flink_bm25_spark.functions.text import make_fmm_segmenter

    seg = make_fmm_segmenter({"北京"})
    assert seg("北京 Spark 引擎") == ["北京", "spark", "引擎"]


def test_python_tokenizer_spreads_single_partition_scan(spark):
    """Regression: a single-file parquet scan arrives as ONE partition;
    the Arrow tokenizer slot must spread it before the Python stage or
    the whole segmentation serializes onto one core."""
    from flink_bm25_spark.operators.tokenize import tokenize_with_udf
    from flink_bm25_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, "documents", SF_DIR).coalesce(1)
    out = tokenize_with_udf(docs, segment=lambda t: (t or "").split())
    assert out.rdd.getNumPartitions() > 1
