"""Text-analysis operators — language ID, quality scoring, token counting,
document fingerprinting (BASELINE.json north-star extensions).

All pure built-in column expressions (whole-stage-codegen throughout);
each has an exact ANSI-SQL twin for the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_bm25_spark.functions.hashing import rolling_fingerprint
from flink_bm25_spark.functions.text import quality_columns, tokenize_expr

# Marker stopwords per language for the n-gram/marker LID heuristic.
# On real corpora these would be the top function words per language;
# the synthetic fixture shares one vocabulary, so the heuristic's value
# here is exercising the operator shape, not classifier accuracy.
LANG_MARKERS = {
    "en": ("the", "a", "of"),
    "de": ("der", "die", "das"),
    "es": ("el", "la", "los"),
    "fr": ("le", "la", "les"),
}


def token_stats(documents: DataFrame) -> DataFrame:
    """``(doc_id, n_tokens, n_uniq_tokens)`` — whitespace token counting."""
    words = F.filter(tokenize_expr(F.col("text")), lambda w: w != F.lit(""))
    return documents.select(
        "doc_id",
        F.size(words).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(words)).cast("long").alias("n_uniq_tokens"),
    )


# BPE-style pre-tokenization pattern (GPT-2-family simplified to a
# portable character-class form): letter runs, single digits, or single
# non-alphanumeric non-space symbols.
BPE_PATTERN = r"[a-z]+|[0-9]|[^a-z0-9\s]"


def bpe_token_counts(documents: DataFrame) -> DataFrame:
    """``(doc_id, n_ws_tokens, n_bpe_tokens)`` — whitespace vs BPE-ish
    regex token counting (LLM-pipeline cost estimation).  Pure regexp
    expressions; digits count one token each, as BPE pre-tokenizers do.
    """
    words = F.filter(tokenize_expr(F.col("text")), lambda w: w != F.lit(""))
    return documents.select(
        "doc_id",
        F.size(words).cast("long").alias("n_ws_tokens"),
        # idx=0 → whole-match extraction (the pattern has no capture groups)
        F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(BPE_PATTERN), 0))
        .cast("long")
        .alias("n_bpe_tokens"),
    )


def quality_scores(documents: DataFrame) -> DataFrame:
    """Per-document quality signals + a composite keep-score for pipeline
    filtering (length, stopword density, punctuation density)."""
    cols = quality_columns(F.col("text"))
    scored = documents.select("doc_id", *[v.alias(k) for k, v in cols.items()])
    keep = (
        F.when(F.col("n_tokens") < 5, 0.0)
        .when(F.col("stopword_ratio") > 0.5, 0.2)
        .otherwise(
            F.round(
                F.least(F.lit(1.0), F.col("n_tokens") / F.lit(100.0))
                * (1.0 - F.col("punct_ratio")),
                6,
            )
        )
    )
    return scored.withColumn("keep_score", keep)


def language_id(documents: DataFrame) -> DataFrame:
    """Marker-word language heuristic: count marker hits per language,
    pick argmax (ties by language code), 'und' when nothing matches."""
    words = F.filter(tokenize_expr(F.col("text")), lambda w: w != F.lit(""))
    scores = [
        (
            lang,
            F.size(F.filter(words, lambda w: w.isin(*markers))),
        )
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    # argmax via a sorted struct array: (-hits, lang) ascending → first.
    packed = F.array(
        *[
            F.struct((-hits).cast("long").alias("neg"), F.lit(lang).alias("lang"))
            for lang, hits in scores
        ]
    )
    best = F.element_at(F.array_sort(packed), 1)
    return documents.select(
        "doc_id",
        F.when(best["neg"] < 0, best["lang"]).otherwise(F.lit("und")).alias(
            "pred_lang"
        ),
    )


def doc_fingerprints(documents: DataFrame) -> DataFrame:
    """``(doc_id, fp)`` — order-sensitive polynomial rolling hash of the
    token stream, mod 2^31-1 (md5-derived word hashes; engine-portable)."""
    words = F.filter(tokenize_expr(F.col("text")), lambda w: w != F.lit(""))
    return documents.select(
        "doc_id",
        F.when(F.size(words) > 0, rolling_fingerprint(words))
        .otherwise(F.lit(0).cast("long"))
        .alias("fp"),
    )


def corpus_profile(documents: DataFrame) -> DataFrame:
    """Grouped corpus statistics by (lang, source) — the text-analysis
    rollup used for dataset curation dashboards."""
    return (
        documents.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )
    )
