"""Deterministic sampling and dataset splitting — training-data-pipeline
operators (north-star extension; the reference's only sampling is a
driver-side ``subList`` worklist cap, ``BatchBM25PreMain.java:153-159``).

A 100 TB corpus cannot be split with ``rand()``: resampling must be
reproducible across runs, engines, and partitionings, or train/val leakage
silently invalidates every downstream eval.  Both operators here key the
decision on the md5-derived 60-bit hash of a stable id
(:func:`flink_bm25_spark.functions.hashing.h60`), so

- assignment is a pure map-side projection (no shuffle, no state),
- re-running on re-partitioned / incrementally-grown data never moves an
  existing document between splits, and
- the DuckDB oracle reproduces the assignment bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_bm25_spark.functions.hashing import h60

DEFAULT_SPLITS: tuple[tuple[str, int], ...] = (("train", 80), ("val", 90), ("test", 100))


def _bucket(key: Column, buckets: int) -> Column:
    # h60 of the *decimal string* form of the key — the only cross-engine
    # canonical byte representation of an integer id.
    return h60(key.cast("string")) % F.lit(buckets)


def hash_split(
    df: DataFrame,
    key_col: str = "doc_id",
    splits: Sequence[tuple[str, int]] = DEFAULT_SPLITS,
    buckets: int = 100,
    out_col: str = "split",
) -> DataFrame:
    """Assign every row a deterministic split label (train/val/test …).

    ``splits`` is ``[(label, upper_bound_bucket_exclusive), …]`` with the
    last bound equal to ``buckets``; a row lands in the first split whose
    bound exceeds ``h60(key) % buckets``.
    """
    if splits[-1][1] != buckets:
        raise ValueError(f"last split bound must equal buckets={buckets}: {splits}")
    b = _bucket(F.col(key_col), buckets)
    expr = None
    for label, bound in splits[:-1]:
        clause = b < F.lit(bound)
        expr = F.when(clause, label) if expr is None else expr.when(clause, label)
    expr = expr.otherwise(splits[-1][0]) if expr is not None else F.lit(splits[-1][0])
    return df.withColumn(out_col, expr)


def hash_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    buckets: int = 10_000,
) -> DataFrame:
    """Deterministic ~``fraction`` sample: keep rows whose key-hash bucket
    falls below ``fraction * buckets``.  Unlike ``df.sample`` this is stable
    under re-partitioning and across engines, and composable: a 1% sample
    is a strict subset of the 10% sample of the same data."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1]: {fraction}")
    return df.where(_bucket(F.col(key_col), buckets) < F.lit(int(fraction * buckets)))


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str = "doc_id",
    seed: str = "ws:0",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement — the
    Efraimidis–Spirakis (2006) one-pass scheme: each row draws
    ``u ∈ (0, 1]`` from the seeded hash of its key and the sample is the
    top-``k`` by ``u^(1/w)`` — computed in log space as
    ``es_key = ln(u) / w`` (monotone-equivalent, numerically tame).
    Inclusion probability is proportional to weight, the draw is
    reproducible across engines/partitionings, and changing ``seed``
    yields an independent sample (epoch resampling).

    The quality-weighted subsampling primitive: pass a keep/quality
    score as the weight to bias a budget-limited corpus slice toward
    good documents without hard-thresholding.  Rows with NULL or
    non-positive weight are excluded (they can never be sampled).

    Plan: the ES key is pure map-side arithmetic on the key hash; top-k
    compiles to TakeOrderedAndProject.  Deterministic: key rounded to 6
    decimals, ties to the smaller id.
    """
    if k <= 0:
        raise ValueError(f"k must be positive: {k}")
    u = (h60(F.concat(F.lit(f"{seed}:"), F.col(key_col).cast("string")))
         + F.lit(1)).cast("double") / F.lit(float(1 << 60))
    es = F.round(F.log(u) / F.col(weight_col).cast("double"), 6)
    scored = df.where(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    ).withColumn("es_key", es)
    return scored.orderBy(F.desc("es_key"), F.asc(key_col)).limit(k)


def stratified_hash_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    buckets: int = 10_000,
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling — the language/source quota
    step of a pretraining mix (e.g. keep 100% of low-resource languages,
    10% of English).

    Same hash-bucket construction as :func:`hash_sample`, with the
    threshold chosen per stratum — so each stratum's sample is stable
    under repartitioning, reproducible across engines, and nested
    (raising a rate strictly grows that stratum's sample).  Pure map-side
    filter: no shuffle, no per-stratum scan."""
    thr = None
    for value, rate in sorted(rates.items()):
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate must be in [0,1]: {value}={rate}")
        t = F.when(
            F.col(stratum_col) == value, F.lit(int(rate * buckets))
        )
        thr = t if thr is None else thr.when(
            F.col(stratum_col) == value, F.lit(int(rate * buckets))
        )
    thr = thr.otherwise(F.lit(int(default_rate * buckets)))
    return df.where(_bucket(F.col(key_col), buckets) < thr)


def temperature_resample(
    df: DataFrame,
    weights: dict[str, float],
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    buckets: int = 10_000,
    default_weight: float = 1.0,
) -> DataFrame:
    """Weighted corpus mixing with UPSAMPLING — the temperature-mix step
    of a pretraining data recipe (weights come from e.g.
    ``(p_stratum)^(1/T)`` renormalization; low-resource strata get
    weights > 1 and repeat).

    Every row is emitted ``floor(w)`` times, plus once more for the
    deterministic ``frac(w)`` slice of the key-hash space — so a weight
    of 2.3 yields exactly 2 copies for 70% of the stratum's keys and 3
    for the hash-chosen 30%, reproducible across engines, partitionings
    and runs.  Output adds ``rep`` (0-based copy index): downstream
    shuffles see distinct (key, rep) pairs, and dropping ``rep > 0``
    recovers the unweighted corpus.

    Scale: pure map-side — a ``sequence`` literal exploded per row; the
    fanout is the sampled weight itself (the physically unavoidable
    cost), never a join or shuffle.  The extra-copy hash is salted
    (``key || ':t'``) so it is independent of the ``hash_sample`` /
    ``hash_split`` bucket of the same key.
    """
    n_copies = None
    for value, w in sorted(weights.items()):
        if w < 0:
            raise ValueError(f"weight must be >= 0: {value}={w}")
        n_copies = (F.when if n_copies is None else n_copies.when)(
            F.col(stratum_col) == value, _n_copies_expr(key_col, w, buckets)
        )
    base_expr = _n_copies_expr(key_col, default_weight, buckets)
    n_copies = base_expr if n_copies is None else n_copies.otherwise(base_expr)
    return (
        df.withColumn("__n", n_copies)
        .where(F.col("__n") > 0)
        .withColumn(
            "rep",
            F.explode(F.sequence(F.lit(0), (F.col("__n") - 1).cast("int"))),
        )
        .drop("__n")
    )


def _n_copies_expr(key_col: str, w: float, buckets: int) -> Column:
    whole = int(w)
    frac_thr = int(round((w - whole) * buckets))
    salted = h60(F.concat(F.col(key_col).cast("string"), F.lit(":t"))) % F.lit(
        buckets
    )
    return F.lit(whole) + (salted < F.lit(frac_thr)).cast("int")


def pack_sequences(
    df: DataFrame,
    budget: int,
    len_col: str = "n_tokens",
    key_col: str = "doc_id",
    shards: int = 1,
) -> DataFrame:
    """Assign documents to fixed-token-budget training sequences:
    ``(…, shard, seq_id, offset)`` — the sequence-packing step between a
    cleaned corpus and a trainer.

    Deterministic contiguous packing: within a shard, docs are laid out
    in key order; ``offset`` is the running token count before the doc
    and ``seq_id = offset // budget`` — a new sequence starts whenever
    the budget boundary is crossed (a doc straddling the boundary counts
    toward the sequence it starts in; trainers treat the overflow as the
    cross-boundary continuation they already handle).

    Scale: packing is embarrassingly parallel across ``shards`` (each
    packs independently off one window cumsum = one exchange on the
    shard key); ``shards=1`` gives one globally-ordered stream for
    small corpora.  The shard of a key is hash-stable, so incremental
    re-packing moves no existing document between shards.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    shard = (_bucket(F.col(key_col), 1_000_000) % F.lit(shards)).alias("shard")
    w = Window.partitionBy("shard").orderBy(F.col(key_col).asc())
    cum = F.sum(F.col(len_col)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("shard", shard)
        .withColumn("offset", (cum - F.col(len_col)).cast("long"))
        .withColumn(
            "seq_id", F.floor(F.col("offset") / F.lit(budget)).cast("long")
        )
    )


def training_shuffle(
    df: DataFrame,
    n_shards: int = 1024,
    seed: str = "shuffle:0",
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global training-order shuffle: ``(…, shard, pos)``.

    Trainers need the corpus in pseudo-random order, reproducible across
    reruns, with NO total-order bottleneck.  Each doc gets a 60-bit
    order hash from ``(seed, key)``; ``shard = hash % n_shards`` and
    ``pos`` ranks docs *within* the shard by the same hash — so reading
    the shards in id order and each shard in ``pos`` order yields one
    fixed pseudo-random permutation of the corpus.  Changing ``seed``
    yields an independent permutation (fresh epoch order).

    Scale shape: ONE exchange on the shard key + a per-shard window sort
    (each shard is corpus/n_shards rows — size the shard count so a
    shard fits an executor).  A global ``orderBy(rand())`` would sort
    the whole corpus through one range exchange and is not reproducible;
    this is, and it parallelizes by shard.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    oh = h60(F.concat(F.lit(seed + ":"), F.col(key_col).cast("string")))
    w = Window.partitionBy("shard").orderBy(F.col("__oh").asc(), F.col(key_col).asc())
    return (
        df.withColumn("__oh", oh)
        .withColumn("shard", (F.col("__oh") % F.lit(n_shards)).cast("int"))
        .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .drop("__oh")
    )


def leakage_safe_split(
    documents: DataFrame,
    pairs: DataFrame | None = None,
    splits: Sequence[tuple[str, int]] = DEFAULT_SPLITS,
    buckets: int = 100,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """``(doc_id, split)`` — :func:`hash_split` with the near-duplicate
    leakage hole closed: members of one near-dup cluster bucket on their
    cluster CANONICAL id, so a document and its near-copies can never
    straddle train/val/test (plain id-hash splitting puts ~20% of each
    cluster's copies in val/test, silently leaking train content into
    eval).  Unclustered documents bucket on their own id, so adding the
    cluster constraint never moves a non-duplicated document.

    Scale shape: the cluster relation is duplicate-fraction-sized and
    joins LEFT on ``doc_id`` (keyed, AQE-broadcastable when small); the
    split decision itself stays a pure projection.
    """
    from flink_bm25_spark.operators.dedup import minhash_dedup_pairs  # noqa: PLC0415
    from flink_bm25_spark.operators.graph import dedup_clusters  # noqa: PLC0415

    if pairs is None:
        pairs = minhash_dedup_pairs(documents, jaccard_threshold)
    members = dedup_clusters(pairs).select("doc_id", "canonical_id")
    keyed = (
        documents.select("doc_id")
        .join(members, "doc_id", "left")
        .withColumn("_skey", F.coalesce("canonical_id", F.col("doc_id")))
    )
    return hash_split(keyed, key_col="_skey", splits=splits, buckets=buckets).select(
        "doc_id", "split"
    )


def token_budget_sample(
    documents: DataFrame,
    budget_tokens: int,
    group_col: str = "lang",
    buckets: int = 16,
) -> DataFrame:
    """``(doc_id, <group_col>, n_tokens)`` — per-group quota sampling by
    TOKEN budget (the unit that actually prices pretraining), taking
    documents in deterministic hash order until the group's budget is
    spent.  A document is kept iff the tokens taken before it (in order)
    are still under budget — so the document that crosses the line is
    included and every group with data yields at least one document.

    Scale shape — the naive form is one giant window per group (a single
    sorted reducer per language at 100 TB).  Instead the cumsum runs in
    TWO phases: documents hash into ``buckets`` blocks per group; block
    token sums accumulate over a per-group window of only ``buckets``
    rows; blocks fully under budget keep all documents with a map-side
    semi-join, and only the ONE boundary block per group runs a
    document-level window (partition size ≈ group/buckets).  Order is
    (block, hash, doc_id), so the two-phase result is IDENTICAL to the
    naive single-window cutoff — which is exactly what the DuckDB oracle
    computes.
    """
    from flink_bm25_spark.functions.text import tokenize_expr  # noqa: PLC0415

    toks = F.filter(tokenize_expr(F.col("text")), lambda w: w != F.lit(""))
    h = h60(F.col("doc_id").cast("string"))
    base = documents.select(
        "doc_id",
        F.col(group_col).alias("_grp"),
        F.size(toks).cast("long").alias("n_tokens"),
        (h % F.lit(buckets)).alias("_bkt"),
        h.alias("_h"),
    ).localCheckpoint(eager=True)

    from pyspark.sql import Window  # noqa: PLC0415

    bw = (
        Window.partitionBy("_grp")
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    blocks = (
        base.groupBy("_grp", "_bkt")
        .agg(F.sum("n_tokens").alias("_bsum"))
        .withColumn("_before", F.coalesce(F.sum("_bsum").over(bw), F.lit(0)))
    )
    full = blocks.where(F.col("_before") + F.col("_bsum") <= F.lit(budget_tokens))
    boundary = blocks.where(
        (F.col("_before") < F.lit(budget_tokens))
        & (F.col("_before") + F.col("_bsum") > F.lit(budget_tokens))
    )

    kept_full = base.join(full.select("_grp", "_bkt"), ["_grp", "_bkt"], "left_semi")
    dw = (
        Window.partitionBy("_grp", "_bkt")
        .orderBy("_h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    kept_boundary = (
        base.join(boundary.select("_grp", "_bkt", "_before"), ["_grp", "_bkt"])
        .withColumn(
            "_dbefore",
            F.col("_before") + F.coalesce(F.sum("n_tokens").over(dw), F.lit(0)),
        )
        .where(F.col("_dbefore") < F.lit(budget_tokens))
        .select(*base.columns)
    )
    return (
        kept_full.unionByName(kept_boundary)
        .select("doc_id", F.col("_grp").alias(group_col), "n_tokens")
    )


def stratified_topk_sample(
    df: DataFrame,
    k: int,
    group_col: str = "lang",
    key_col: str = "doc_id",
) -> DataFrame:
    """EXACTLY ``min(k, |group|)`` rows per group, deterministically:
    rows rank by their 60-bit key hash within each group (ties by key)
    and the first ``k`` survive.  The fixed-size counterpart of
    :func:`stratified_hash_sample` (which keeps a *fraction*): eval-set
    construction wants "200 docs per language", not "2% of each".
    Re-running, re-partitioning, or growing OTHER groups never changes
    a group's picks; adding rows to a group only swaps picks whose hash
    rank shifted.  One window shuffle on the group key.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    h = h60(F.col(key_col).cast("string"))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= F.lit(k))
        .drop("_rk")
    )
