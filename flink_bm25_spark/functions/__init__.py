"""Column-expression library (all JVM-side built-ins; no Python UDFs)."""

from flink_bm25_spark.functions.hashing import (
    h60,
    h_mod_p,
    minhash_seed_a,
    minhash_seed_b,
    rolling_fingerprint,
)
from flink_bm25_spark.functions.text import (
    load_reference_vocab,
    make_fmm_segmenter,
    quality_columns,
    reference_fmm_segmenter,
    strip_markup,
    tokenize_expr,
)
from flink_bm25_spark.functions.vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "h60",
    "h_mod_p",
    "minhash_seed_a",
    "minhash_seed_b",
    "rolling_fingerprint",
    "load_reference_vocab",
    "make_fmm_segmenter",
    "quality_columns",
    "reference_fmm_segmenter",
    "strip_markup",
    "tokenize_expr",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
