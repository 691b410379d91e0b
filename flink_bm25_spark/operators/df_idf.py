"""Document-frequency / IDF operators (A2, A3, A5, A6, F1 in SURVEY.md).

Reference behavior: DF is accumulated either by a per-document Mongo
``$inc`` upsert (``BatchBM25PreMain.java:107-123``) or by a growing
``union().groupBy(0).sum(1)`` DAG re-built every loop iteration
(``backup/BatchBM25PrePrint.java:213-215``).  Both are incremental
maintenance of the same aggregate.

Spark restatement: corpus-at-once.  The TF relation already has exactly
one row per (doc_id, word), so DF is a single re-aggregation of it —
``groupBy(word).count()`` — with no extra distinct pass.  We compute DF
*before* the top-k truncation: the reference's A3 variant counts top-30
membership instead of true containment (``backup/BMStream.java:318-321``),
a quirk SURVEY.md §5 pins down as a bug we do not reproduce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def document_frequencies(tf: DataFrame) -> DataFrame:
    """``(word, df)`` — #docs containing each word (A2).

    Input is the TF relation (distinct (doc_id, word) by construction).
    Map-side partial counts keep the shuffle tiny: the shuffled data is
    one (word, partial_count) pair per word per partition, independent of
    corpus row count — this is what makes DF cheap at 100 TB.
    """
    return tf.groupBy("word").agg(F.count("*").cast("long").alias("df"))


def distinct_words(tokens: DataFrame) -> DataFrame:
    """Vocabulary (A5 — ``.distinct(0)``, ``backup/BatchBM25Pre.java:153``)."""
    return tokens.select("word").distinct()


def corpus_size(documents: DataFrame) -> int:
    """Scalar corpus count N (A6 — ``DataSet.count()``,
    ``backup/BMStream.java:328``)."""
    return documents.count()


def document_frequencies_salted(
    tf: DataFrame, salt_buckets: int = 16
) -> DataFrame:
    """Two-phase (salted) DF for pathologically hot words.

    Plain ``groupBy(word)`` already does map-side partial aggregation, but
    at extreme scale a handful of ultra-frequent words can still bottleneck
    their reducer partitions.  Salting splits each word across
    ``salt_buckets`` reducers (phase 1: count per (word, salt)), then
    merges the per-salt partials (phase 2) — the classic skew-breaking
    two-shuffle trade.  Results are identical to
    :func:`document_frequencies`; use under AQE-detected skew only, since
    the extra shuffle costs more when keys are well distributed.
    """
    salted = tf.withColumn(
        "salt", F.pmod(F.xxhash64("doc_id"), F.lit(salt_buckets)).cast("int")
    )
    partial = salted.groupBy("word", "salt").agg(F.count("*").alias("c"))
    return partial.groupBy("word").agg(F.sum("c").cast("long").alias("df"))


def idf(df_stats: DataFrame, n_docs: int) -> DataFrame:
    """``(word, df, idf)`` with ``idf = ln(N / (df + 1))`` (F1).

    Float division by declaration — the reference's ``TfIdfUtil.java:121``
    floor-divides two ints before ``log``, a silent quirk we deviate from
    (SURVEY.md §5); the oracle SQL declares the same float semantics.
    """
    return df_stats.withColumn(
        "idf", F.log(F.lit(float(n_docs)) / (F.col("df") + F.lit(1)))
    )


def idf_relational(df_stats: DataFrame, documents: DataFrame) -> DataFrame:
    """:func:`idf` with N supplied IN-PLAN as a broadcast 1-row count
    aggregate instead of a driver-side ``count()`` (r9): every
    BM25-family query used to pay one full corpus-count job at plan
    CONSTRUCTION time — at 100 TB that is an extra corpus pass per
    query.  ``cast(count AS double)`` is the identical double to the
    former ``lit(float(n))`` for any count below 2^53, so idf values
    are unchanged."""
    n_rel = documents.agg(
        F.count(F.lit(1)).cast("double").alias("_ndocs")
    )
    return (
        df_stats.join(F.broadcast(n_rel))
        .withColumn(
            "idf", F.log(F.col("_ndocs") / (F.col("df") + F.lit(1)))
        )
        .drop("_ndocs")
    )
