"""Deduplication operators — the large-scale training-data-pipeline
extension (BASELINE.json north star; not present in the reference, which
only dedupes (word,count) records — A5, ``backup/BatchBM25Pre.java:153``).

Five families, each designed for 100 TB first and verified exactly on the
fixtures:

- **exact**: hash-groupBy on md5(text) — one shuffle on a 32-byte key.
- **MinHash + LSH**: shingle → 64 universal min-hashes → 16 bands × 4 rows
  → band-bucket self-join.  The 64× hash expansion happens map-side and
  collapses in the partial MIN aggregate, so the shuffle carries one row
  per (doc, hash-index) regardless of document size.
- **SimHash**: 60-bit weighted fingerprint, banded 4×15 bits; by
  pigeonhole, hamming ≤ 3 ⟹ at least one identical band, so banded
  candidate generation has **100% recall** (not approximate) for d ≤ 3.
- **n-gram Jaccard**: exact pairwise via shingle equi-join — the
  verification path for LSH candidates and the small-data brute force.
- **embedding cosine**: see :mod:`flink_bm25_spark.operators.similarity`.

All hashing is md5-derived (:mod:`flink_bm25_spark.functions.hashing`) so
results are bit-identical in any SQL engine — sketches are hash-checkable,
not just statistically similar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_bm25_spark.config import (
    HASH_PRIME,
    MINHASH_BANDS,
    MINHASH_NUM_HASHES,
    MINHASH_ROWS_PER_BAND,
    SHINGLE_SIZE,
    SIMHASH_BANDS,
    SIMHASH_BAND_BITS,
    SIMHASH_BITS,
    SIMHASH_MAX_HAMMING,
)
from flink_bm25_spark.functions.hashing import (
    h60,
    h_mod_p,
    minhash_seed_a,
    minhash_seed_b,
)
from flink_bm25_spark.functions.text import tokenize_expr


# ---------------------------------------------------------------------------
# Exact duplicates
# ---------------------------------------------------------------------------


def exact_duplicates(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """``(doc_id, canonical_id)`` for every doc in a group of byte-identical
    texts (group size > 1); canonical = min doc_id.

    One shuffle on the md5 digest — the text column itself never moves.
    """
    hashed = documents.select("doc_id", F.md5(F.col(text_col).cast("binary")).alias("h"))
    canon = hashed.groupBy("h").agg(
        F.min("doc_id").alias("canonical_id"), F.count("*").alias("n")
    )
    return (
        hashed.join(canon.where(F.col("n") > 1), "h")
        .where(F.col("doc_id") != F.col("canonical_id"))
        .select("doc_id", "canonical_id")
    )


def token_set_duplicates(documents: DataFrame) -> DataFrame:
    """Exact dedup on the *sorted distinct token set* — catches documents
    that are word-order permutations / repetition variants of each other."""
    sets = documents.select(
        "doc_id",
        F.md5(
            F.array_join(
                F.array_sort(F.array_distinct(
                    F.filter(tokenize_expr(F.col("text")), lambda w: w != F.lit(""))
                )),
                " ",
            ).cast("binary")
        ).alias("h"),
    )
    canon = sets.groupBy("h").agg(
        F.min("doc_id").alias("canonical_id"), F.count("*").alias("n")
    )
    return (
        sets.join(canon.where(F.col("n") > 1), "h")
        .where(F.col("doc_id") != F.col("canonical_id"))
        .select("doc_id", "canonical_id")
    )


# ---------------------------------------------------------------------------
# Shingles + exact Jaccard
# ---------------------------------------------------------------------------


def shingles(documents: DataFrame, n: int = SHINGLE_SIZE) -> DataFrame:
    """Distinct word n-grams per document: ``(doc_id, gram)``.

    Built with an indexed ``transform`` over the token array — pure
    map-side generator, no Python.
    """
    words = F.split(F.lower(F.col("text")), r"\s+")

    def make_gram(x, i):
        parts = None
        for j in range(n):
            piece = F.element_at(words, (i + F.lit(j + 1)).cast("int"))
            parts = piece if parts is None else F.concat(parts, F.lit(" "), piece)
        return F.when(i + n <= F.size(words), parts)

    grams = F.transform(words, make_gram)
    return (
        documents.select("doc_id", F.explode(grams).alias("gram"))
        .where(F.col("gram").isNotNull())
        .distinct()
    )


def jaccard_pairs(
    sh: DataFrame, threshold: float, pairs: DataFrame | None = None
) -> DataFrame:
    """Exact n-gram Jaccard: ``(d1, d2, jaccard)`` with jaccard ≥ threshold.

    Intersections come from a shingle equi-join (only docs sharing a gram
    ever meet — never an all-pairs cross join).  When ``pairs`` is given,
    the join is pre-filtered to those candidates (the LSH verify path).
    """
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.gram") == F.col("b.gram")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count("*").alias("i"))
    )
    if pairs is not None:
        inter = inter.join(pairs.select("d1", "d2"), ["d1", "d2"], "left_semi")
    jac = (
        inter.join(sizes.withColumnRenamed("doc_id", "d1").withColumnRenamed("n", "n1"), "d1")
        .join(sizes.withColumnRenamed("doc_id", "d2").withColumnRenamed("n", "n2"), "d2")
        .select(
            "d1",
            "d2",
            F.round(
                F.col("i").cast("double") / (F.col("n1") + F.col("n2") - F.col("i")),
                6,
            ).alias("jaccard"),
        )
    )
    return jac.where(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _seeds(spark, num_hashes: int) -> DataFrame:
    i = F.col("id").cast("long")
    return spark.range(num_hashes).select(
        F.col("id").cast("int").alias("i"),
        minhash_seed_a(i).alias("ha"),
        minhash_seed_b(i).alias("hb"),
    )


def minhash_signatures(
    sh: DataFrame, num_hashes: int = MINHASH_NUM_HASHES
) -> DataFrame:
    """``(doc_id, i, mh)`` — MinHash signature rows.

    The broadcast seed table fans each gram out to ``num_hashes`` rows
    *map-side*; the partial MIN aggregate collapses them before the
    shuffle, so shuffled volume is O(docs × num_hashes), independent of
    document length.
    """
    spark = sh.sparkSession
    seeds = F.broadcast(_seeds(spark, num_hashes))
    g = sh.withColumn("gh", h_mod_p(F.col("gram")))
    return (
        g.crossJoin(seeds)
        .select(
            "doc_id",
            "i",
            ((F.col("ha") * F.col("gh") + F.col("hb")) % F.lit(HASH_PRIME)).alias("h"),
        )
        .groupBy("doc_id", "i")
        .agg(F.min("h").alias("mh"))
    )


def lsh_candidate_pairs(
    sigs: DataFrame,
    bands: int = MINHASH_BANDS,
    rows_per_band: int = MINHASH_ROWS_PER_BAND,
) -> DataFrame:
    """LSH banding: docs agreeing on ALL rows of any band become ``(d1, d2)``
    candidates.  Band keys are md5 digests of the concatenated signature
    slice, so the self-join key is short and uniform."""
    banded = (
        sigs.withColumn("band", (F.col("i") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct(F.col("i"), F.col("mh")))
                        ),
                        lambda s: s["mh"].cast("string"),
                    ),
                    ",",
                ).cast("binary")
            ).alias("bkey")
        )
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )


def minhash_dedup_pairs(
    documents: DataFrame,
    threshold: float = 0.8,
    n: int = SHINGLE_SIZE,
    num_hashes: int = MINHASH_NUM_HASHES,
    bands: int = MINHASH_BANDS,
) -> DataFrame:
    """Near-duplicate pairs: LSH candidates verified by exact Jaccard.

    This is the canonical 100 TB near-dup pipeline: LSH prunes the
    quadratic pair space to same-bucket collisions; the exact Jaccard join
    then runs only over candidates.
    """
    sh = shingles(documents, n)
    sigs = minhash_signatures(sh, num_hashes)
    cands = lsh_candidate_pairs(sigs, bands, num_hashes // bands)
    return jaccard_pairs(sh, threshold, pairs=cands)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_signatures(tf: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """``(doc_id, simhash)`` — 60-bit TF-weighted SimHash.

    Relational formulation: explode bit positions map-side, sum signed
    tf-weights per (doc, bit), reassemble.  Shuffle volume is
    O(docs × bits), independent of document length.
    """
    spark = tf.sparkSession
    bit_ids = F.broadcast(
        spark.range(bits).select(F.col("id").cast("int").alias("j"))
    )
    contrib = (
        tf.withColumn("h60", h60(F.col("word")))
        .crossJoin(bit_ids)
        .select(
            "doc_id",
            "j",
            # shiftright with a *column* bit count needs the SQL form —
            # the Python F.shiftright only takes an int literal.
            (
                (F.expr("shiftright(h60, j)").bitwiseAND(F.lit(1)) * 2 - 1)
                * F.col("tf")
            ).alias("w"),
        )
    )
    bit_sums = contrib.groupBy("doc_id", "j").agg(F.sum("w").alias("s"))
    return bit_sums.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), j)")).otherwise(
                F.lit(0).cast("long")
            )
        )
        .cast("long")
        .alias("simhash")
    )


def simhash_pairs(
    sigs: DataFrame,
    max_hamming: int = SIMHASH_MAX_HAMMING,
    bands: int = SIMHASH_BANDS,
    band_bits: int = SIMHASH_BAND_BITS,
) -> DataFrame:
    """``(d1, d2, hamming)`` with hamming ≤ max_hamming.

    Banded self-join: 4 bands × 15 bits; hamming ≤ 3 guarantees one exact
    band match (pigeonhole), so recall is exactly 100% — the banding is a
    pure pruning step, not an approximation.
    """
    spark = sigs.sparkSession
    band_ids = F.broadcast(
        spark.range(bands).select(F.col("id").cast("int").alias("band"))
    )
    mask = (1 << band_bits) - 1
    banded = sigs.crossJoin(band_ids).select(
        "doc_id",
        "simhash",
        "band",
        F.expr(f"shiftright(simhash, band * {band_bits})")
        .bitwiseAND(F.lit(mask))
        .alias("bkey"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("d1"),
            F.col("b.doc_id").alias("d2"),
            F.col("a.simhash").alias("s1"),
            F.col("b.simhash").alias("s2"),
        )
        .distinct()
    )
    ham = cand.select(
        "d1", "d2", F.bit_count(F.col("s1").bitwiseXOR(F.col("s2"))).cast("int").alias("hamming")
    )
    return ham.where(F.col("hamming") <= max_hamming)
