"""Part-of-speech (nature) tagging — the P2 "POS predicate" dimension.

The reference attaches an ansj ``nature`` tag to every token and keeps
only the noun family ``{n, ns, nt, nz}`` before computing TF/DF
(``BatchBM25PreMain.java:38-43``, applied at ``:191``).  The ansj model
itself is a dictionary tagger that cannot ship here, so the engine's
stand-in is a deterministic **rule-based tagger** built from public
knowledge only: a compact function-word/adjective lexicon plus the
standard English suffix heuristics (``-ly`` adverb, ``-ing/-ed`` verb,
``-ous/-ful/...`` adjective), defaulting to noun — the same
noun-by-default convention ansj uses for out-of-vocabulary tokens.

Both execution twins are generated from ONE rule table below, so the
Spark ``Column`` chain and the DuckDB ``CASE`` fragment are semantically
identical by construction — the oracle can hash-match tag values, not
just row counts.

Tag set (single-letter projection of the ansj nature families):

=====  ==========================  ==========================
tag    meaning                     examples
=====  ==========================  ==========================
``m``  numeral                     ``42``, ``1996``
``x``  function word               ``the``, ``of``, ``and``
``d``  adverb                      ``quickly``
``v``  verb                        ``running``, ``sorted``
``a``  adjective                   ``fast``, ``famous``
``n``  noun (default)              ``table``, ``query``
=====  ==========================  ==========================
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Closed-class function words: articles, prepositions, conjunctions,
# pronouns, auxiliaries.  Closed classes are enumerable public knowledge;
# this list is intentionally compact (high-frequency members only).
FUNCTION_WORDS: tuple[str, ...] = (
    "the", "a", "an", "of", "to", "in", "on", "at", "by", "for", "with",
    "and", "or", "but", "nor", "so", "yet", "as", "if", "than", "that",
    "this", "these", "those", "it", "its", "he", "she", "they", "them",
    "his", "her", "their", "we", "us", "our", "you", "your", "i", "me",
    "my", "is", "are", "was", "were", "be", "been", "being", "am", "do",
    "does", "did", "have", "has", "had", "will", "would", "can", "could",
    "shall", "should", "may", "might", "must", "not", "no",
)

# Common gradable adjectives with no suffix signal (open-class head;
# suffix rules below catch the derived ones).
ADJECTIVES: tuple[str, ...] = (
    "fast", "slow", "big", "small", "large", "great", "good", "bad",
    "new", "old", "high", "low", "long", "short", "hot", "cold", "wide",
    "narrow", "deep", "shallow", "hard", "soft", "easy", "early", "late",
    "few", "many", "much", "more", "most", "less", "least", "same",
    "other", "full", "empty", "dense", "sparse",
)

VERB_SUFFIXES: tuple[str, ...] = ("ing", "ed")
ADJ_SUFFIXES: tuple[str, ...] = ("ous", "ful", "ive", "ic", "al")
# -able/-ible need a longer stem: 'table'/'cable'/'bible' are nouns, so
# the rule only fires from 6 letters up ('stable', 'visible', 'capable').
ADJ_LONG_SUFFIXES: tuple[str, ...] = ("able", "ible")

# Reference predicate: expectedNature = {n, ns, nt, nz}
# (BatchBM25PreMain.java:38-43).  This tagger emits the single-letter
# projection, so the whole family collapses to the prefix 'n'.
NOUN_FAMILY: tuple[str, ...] = ("n",)


def nature_expr(word: Column) -> Column:
    """Spark twin of the rule table (order = priority)."""
    expr = F.lit("n")  # default: noun
    for suf in ADJ_LONG_SUFFIXES:
        expr = F.when(
            (F.length(word) > 5) & word.endswith(suf), F.lit("a")
        ).otherwise(expr)
    for suf in ADJ_SUFFIXES:
        expr = F.when(
            (F.length(word) > 4) & word.endswith(suf), F.lit("a")
        ).otherwise(expr)
    for suf in VERB_SUFFIXES:
        expr = F.when(
            (F.length(word) > 4) & word.endswith(suf), F.lit("v")
        ).otherwise(expr)
    expr = F.when(
        (F.length(word) > 3) & word.endswith("ly"), F.lit("d")
    ).otherwise(expr)
    expr = F.when(word.isin(*ADJECTIVES), F.lit("a")).otherwise(expr)
    expr = F.when(word.isin(*FUNCTION_WORDS), F.lit("x")).otherwise(expr)
    return F.when(word.rlike("^[0-9]+$"), F.lit("m")).otherwise(expr)


def nature_sql(word: str = "word") -> str:
    """DuckDB twin: one CASE whose WHEN order mirrors ``nature_expr``'s
    priority (numeral > function word > adjective lexicon > -ly adverb >
    verb suffix > adjective suffix > noun default)."""

    def _in(vals: tuple[str, ...]) -> str:
        return ", ".join(f"'{v}'" for v in vals)

    verb = " OR ".join(f"{word} LIKE '%{s}'" for s in VERB_SUFFIXES)
    adj = " OR ".join(f"{word} LIKE '%{s}'" for s in ADJ_SUFFIXES)
    adj_long = " OR ".join(f"{word} LIKE '%{s}'" for s in ADJ_LONG_SUFFIXES)
    return (
        "CASE "
        f"WHEN regexp_full_match({word}, '[0-9]+') THEN 'm' "
        f"WHEN {word} IN ({_in(FUNCTION_WORDS)}) THEN 'x' "
        f"WHEN {word} IN ({_in(ADJECTIVES)}) THEN 'a' "
        f"WHEN length({word}) > 3 AND {word} LIKE '%ly' THEN 'd' "
        f"WHEN length({word}) > 4 AND ({verb}) THEN 'v' "
        f"WHEN length({word}) > 4 AND ({adj}) THEN 'a' "
        f"WHEN length({word}) > 5 AND ({adj_long}) THEN 'a' "
        "ELSE 'n' END"
    )


def pos_tag(tokens: DataFrame, word_col: str = "word") -> DataFrame:
    """Attach a ``nature`` column — the (word, natureStr) tuple shape the
    reference's segmentation flatMap emits (``BatchBM25PreMain.java:183-190``).

    Pure scalar expression: stays inside WholeStageCodegen, no shuffle,
    no Python — scale-free at any corpus size.
    """
    return tokens.withColumn("nature", nature_expr(F.col(word_col)))


def pos_tag_with_lexicon(
    tokens: DataFrame,
    lexicon: DataFrame,
    word_col: str = "word",
    default_nature: str = "n",
) -> DataFrame:
    """Dictionary POS tagging — the direct analogue of ansj's word →
    nature dictionary (the reference's tagger is lexicon-driven; natures
    like ``ns``/``nt``/``nz`` are dictionary facts, not derivable by
    suffix rules).

    ``lexicon`` is a ``(word, nature)`` relation.  POS dictionaries are
    small (≈10⁵ rows ≈ a few MB) against a corpus of any size, so this is
    a **broadcast** left join — map-side, no shuffle of the token stream,
    the correct 100 TB shape.  Unknown words default to noun, same
    convention as :func:`nature_expr` and ansj's OOV handling.

    Compose with :func:`filter_nature` (natures=("n","ns","nt","nz")) to
    reproduce the reference predicate verbatim.
    """
    lex = F.broadcast(
        lexicon.select(
            F.col(word_col).alias("__lex_word"), F.col("nature").alias("__lex_nature")
        )
    )
    out = tokens.join(lex, tokens[word_col] == lex["__lex_word"], "left")
    return out.select(
        *tokens.columns,
        F.coalesce(F.col("__lex_nature"), F.lit(default_nature)).alias("nature"),
    )


def filter_nature(
    tokens: DataFrame,
    natures: tuple[str, ...] = NOUN_FAMILY,
    nature_col: str = "nature",
) -> DataFrame:
    """Keep only tokens whose nature is in the expected set — the P2 POS
    half of the reference predicate (``BatchBM25PreMain.java:191``:
    ``expectedNature.contains(natureStr)``)."""
    return tokens.where(F.col(nature_col).isin(*natures))
