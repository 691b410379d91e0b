"""POS (nature) tagging — the P2 POS half of the reference predicate
(``BatchBM25PreMain.java:38-43,191``: keep nature ∈ {n, ns, nt, nz} and
drop stopwords before TF/DF)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_bm25_spark.functions.pos import (
    ADJECTIVES,
    FUNCTION_WORDS,
    filter_nature,
    nature_expr,
    nature_sql,
    pos_tag,
)

CASES = {
    # numeral beats everything
    "1996": "m",
    "42": "m",
    # closed-class function words
    "the": "x",
    "of": "x",
    "being": "x",  # function word wins over -ing verb suffix
    # adjective lexicon (wins over the -ly adverb rule for 'early')
    "fast": "a",
    "slow": "a",
    "early": "a",
    # -ly adverb
    "quickly": "d",
    # verb suffixes (len > 4)
    "running": "v",
    "sorted": "v",
    "red": "n",  # too short for the -ed rule → noun default
    # adjective suffixes (len > 4; -able/-ible need len > 5)
    "famous": "a",
    "useful": "a",
    "mental": "a",
    "visible": "a",
    "stable": "a",
    # noun default — incl. short -able/-ible lookalikes
    "table": "n",
    "cable": "n",
    "bible": "n",
    "query": "n",
    "spark": "n",
}


def test_nature_expr_rule_table(spark):
    df = spark.createDataFrame([(w,) for w in CASES], "word string")
    got = {
        r["word"]: r["nature"]
        for r in df.withColumn("nature", nature_expr(F.col("word"))).collect()
    }
    assert got == CASES


def test_sql_twin_matches_spark(spark, duck):
    """The generated DuckDB CASE is semantically identical to the Spark
    Column chain — over the rule-table cases AND the live fixture vocab."""
    vocab = sorted(
        r["word"]
        for r in spark.read.parquet(f"{_sf_dir()}/documents.parquet")
        .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("word"))
        .where("word <> ''")
        .distinct()
        .collect()
    )
    words = sorted(set(vocab) | set(CASES))
    df = spark.createDataFrame([(w,) for w in words], "word string")
    spark_tags = {
        r["word"]: r["nature"]
        for r in df.withColumn("nature", nature_expr(F.col("word"))).collect()
    }
    values = ", ".join(f"('{w}')" for w in words)
    duck_tags = dict(
        duck.execute(
            f"SELECT word, {nature_sql('word')} AS nature "
            f"FROM (VALUES {values}) t(word)"
        ).fetchall()
    )
    assert spark_tags == duck_tags


def _sf_dir() -> str:
    import os

    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_filter_nature_keeps_noun_family_only(spark):
    df = spark.createDataFrame(
        [(1, w) for w in CASES], "doc_id long, word string"
    )
    kept = {r["word"] for r in filter_nature(pos_tag(df)).collect()}
    assert kept == {w for w, t in CASES.items() if t == "n"}


def test_pos_predicate_mirrors_reference_conjunction(spark):
    """Fused reference predicate: expectedNature.contains(nature) &&
    !stopWords.contains(word).  Function words (incl. the configured
    stopwords 'the'/'a') never survive — they tag 'x', not 'n'."""
    from flink_bm25_spark.operators.tokenize import filter_stopwords

    df = spark.createDataFrame(
        [(1, "the fast table sorted a query quickly 42")],
        "doc_id long, text string",
    )
    toks = df.select(
        "doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("word")
    )
    out = {
        r["word"] for r in filter_nature(pos_tag(filter_stopwords(toks))).collect()
    }
    assert out == {"table", "query"}


def test_stopwords_are_function_words():
    """The engine's configured stopwords are a subset of the closed-class
    lexicon, so the POS filter subsumes them (predicate conjunction stays
    consistent either way)."""
    from flink_bm25_spark.config import STOPWORDS

    assert set(STOPWORDS) <= set(FUNCTION_WORDS)
    assert not set(STOPWORDS) & set(ADJECTIVES)


def test_plan_stays_codegen(spark):
    """pos_tag + filter_nature is pure scalar CASE logic: no shuffle, no
    Python eval in the plan."""
    df = spark.createDataFrame([(1, "x")], "doc_id long, word string")
    plan = (
        filter_nature(pos_tag(df))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --- dictionary (lexicon) tagging — the ansj-shaped path ------------------


def test_lexicon_tagger_broadcast_join(spark):
    from flink_bm25_spark.functions.pos import pos_tag_with_lexicon

    toks = spark.createDataFrame(
        [(1, "北京"), (1, "大学"), (1, "unknown")], "doc_id long, word string"
    )
    lex = spark.createDataFrame(
        [("北京", "ns"), ("大学", "nt")], "word string, nature string"
    )
    out = pos_tag_with_lexicon(toks, lex)
    got = {r["word"]: r["nature"] for r in out.collect()}
    assert got == {"北京": "ns", "大学": "nt", "unknown": "n"}
    assert out.columns == ["doc_id", "word", "nature"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_reference_predicate_via_lexicon(spark):
    """End-to-end ansj-analogue: FMM dictionary segmentation →
    lexicon natures → keep {n, ns, nt, nz} minus stopwords — the exact
    reference predicate (BatchBM25PreMain.java:38-48,191)."""
    from flink_bm25_spark.functions.pos import filter_nature, pos_tag_with_lexicon
    from flink_bm25_spark.functions.text import make_fmm_segmenter
    from flink_bm25_spark.operators.tokenize import tokenize_with_udf

    dictionary = {
        "被告人": "n",
        "北京": "ns",
        "法院": "nt",
        "判决": "v",
        "的": "x",
    }
    seg = make_fmm_segmenter(dictionary)
    docs = spark.createDataFrame(
        [(1, "北京法院的判决被告人")], "doc_id long, text string"
    )
    toks = tokenize_with_udf(docs, seg)
    lex = spark.createDataFrame(
        list(dictionary.items()), "word string, nature string"
    )
    kept = filter_nature(
        pos_tag_with_lexicon(toks, lex), natures=("n", "ns", "nt", "nz")
    )
    assert {r["word"] for r in kept.collect()} == {"北京", "法院", "被告人"}


def test_pipeline_pos_filter_option_restricts_statistics(spark):
    """build_corpus_stats(pos_filter=True) computes TF/DF over exactly the
    reference's token population: noun-family, non-stopword."""
    from flink_bm25_spark.functions.pos import filter_nature, pos_tag
    from flink_bm25_spark.operators.pipeline import build_corpus_stats
    from flink_bm25_spark.operators.tokenize import filter_stopwords, tokenize
    from flink_bm25_spark.sources.tables import load_documents
    from tests.conftest import SF_DIR

    docs = load_documents(spark, SF_DIR)
    stats = build_corpus_stats(docs, pos_filter=True)
    got_words = {r["word"] for r in stats.df_stats.collect()}
    want_words = {
        r["word"]
        for r in filter_nature(pos_tag(filter_stopwords(tokenize(docs))))
        .select("word")
        .distinct()
        .collect()
    }
    assert got_words == want_words
    # default path unchanged: includes adjective-tagged vocab like 'fast'
    base_words = {
        r["word"] for r in build_corpus_stats(docs).df_stats.collect()
    }
    assert "fast" in base_words and "fast" not in got_words
    assert got_words < base_words
