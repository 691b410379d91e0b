"""Positional tokens and phrase search.

The reference ranks bags of words only; a search engine also needs
phrase ("adjacent terms") matching, which requires token *positions*.
The positional relation is the per-term slice of a positional inverted
index, and a k-term phrase match is a (k−1)-way self-join on
``position + offset`` — each side pre-filtered to one term, so at 100 TB
the join touches only the phrase terms' postings (tiny), never the
corpus: filter-first, broadcast the rarer side, zero full-relation
shuffles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def positional_tokens(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """``(doc_id, pos, word)`` — 1-based whitespace-token positions.

    Positions are assigned BEFORE dropping empty tokens, so they are
    stable offsets into the original split — and identical to a SQL
    engine's 1-based list ordinality.
    """
    return (
        documents.select(
            "doc_id",
            F.posexplode(F.split(F.lower(F.col(text_col)), r"\s+")).alias(
                "pos0", "word"
            ),
        )
        .where(F.col("word") != "")
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "word")
    )


def phrase_search(
    documents: DataFrame, phrase: Sequence[str], text_col: str = "text"
) -> DataFrame:
    """``(doc_id, n_matches)`` — documents containing the exact adjacent
    token sequence ``phrase``, with the number of occurrences.
    """
    terms = [t.lower() for t in phrase]
    if not terms:
        raise ValueError("phrase must have at least one term")
    toks = positional_tokens(documents, text_col)
    base = toks.where(F.col("word") == terms[0]).select(
        "doc_id", F.col("pos").alias("p0")
    )
    for i, term in enumerate(terms[1:], start=1):
        nxt = toks.where(F.col("word") == term).select(
            F.col("doc_id").alias("d_i"), F.col("pos").alias(f"p{i}")
        )
        base = base.join(
            nxt,
            (F.col("doc_id") == F.col("d_i"))
            & (F.col(f"p{i}") == F.col("p0") + i),
        ).drop("d_i", f"p{i}")
    return base.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_matches"))
