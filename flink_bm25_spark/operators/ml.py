"""Distributed supervised learning as relational algebra — logistic
regression by full-batch gradient descent, the kmeans posture applied to
a supervised model: per round, ONE aggregation computes the exact
gradient map-side (partial sums fold before the 1-row shuffle), only the
(d+1)-float weight vector ever reaches the driver, and the next round's
scoring expression embeds those weights as codegen literals — no
per-round broadcast variable, no ML library, no Python in the hot path.

The canonical in-engine use is quality-filter fitting: train a
lightweight classifier on a small labeled slice, then score the whole
corpus with the closed-form sigmoid expression (a pure projection, so
scoring 100 TB is scan-bound).  Per-round 6-decimal rounding of the
weights keeps the fixpoint replayable across engines (same caveat as
``kmeans_assign``); the oracle unrolls the same rounds in SQL.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _z(weights: Sequence[float], feature_cols: Sequence[str]) -> Column:
    # w·x as a left fold seeded at the bias over ONE array Literal of
    # weights: ((w0 + w1·x1) + w2·x2) + … — the same doubles in the same
    # addition order as the former w0 + w1*x1 + … expression chain, but
    # the weights are a referenced literal object instead of inlined
    # constants, so the generated whole-stage code is identical across
    # gradient rounds and the codegen cache serves rounds 2..n (the
    # per-round recompile was most of a round's cost at sf0.1; same fix
    # as kmeans._squared_dist).
    if not feature_cols:
        return F.lit(float(weights[0]))
    xs = F.array(*[F.col(c).cast("double") for c in feature_cols])
    return F.aggregate(
        F.zip_with(
            F.lit([float(wj) for wj in weights[1:]]),
            xs,
            lambda a, b: a * b,
        ),
        F.lit(float(weights[0])),
        lambda acc, x: acc + x,
    )


def _sigmoid(z: Column) -> Column:
    return 1.0 / (1.0 + F.exp(-z))


def logreg_fit(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    iterations: int = 3,
    lr: float = 0.5,
) -> list[float]:
    """Full-batch gradient descent from ``w = 0``:

        w ← round(w + lr · (1/n) Σ (y − σ(w·x)) · [1, x], 6)

    Returns ``[bias, w_1, …, w_d]`` after ``iterations`` rounds.  Each
    round is one aggregation over the (cached) training relation; the
    driver only ever sees d+1 floats per round.
    """
    df = df.select(
        F.col(label_col).cast("double").alias("_y"),
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
    ).cache()
    w = [0.0] * (len(feature_cols) + 1)
    for _ in range(iterations):
        err = F.col("_y") - _sigmoid(_z(w, feature_cols))
        grads = df.agg(
            F.avg(err).alias("_g0"),
            *[
                F.avg(err * F.col(c)).alias(f"_g{j + 1}")
                for j, c in enumerate(feature_cols)
            ],
        ).first()
        # avg over an EMPTY relation is NULL — no data means no update
        # (weights stay at their current value instead of a TypeError)
        w = [
            round(
                w[j]
                + lr
                * (0.0 if grads[f"_g{j}"] is None else float(grads[f"_g{j}"])),
                6,
            )
            for j in range(len(w))
        ]
    return w


def logreg_score(
    df: DataFrame,
    weights: Sequence[float],
    feature_cols: Sequence[str],
    out_col: str = "p",
) -> DataFrame:
    """Append ``σ(w·x)`` (rounded to 6 decimals) — a pure projection:
    scoring is map-side codegen, so the corpus pass is scan-bound."""
    return df.withColumn(
        out_col, F.round(_sigmoid(_z(weights, feature_cols)), 6)
    )


def quality_classifier_scores(
    documents: DataFrame,
    iterations: int = 3,
    lr: float = 0.5,
) -> DataFrame:
    """``(doc_id, p)`` — the end-to-end quality-model demo: fit a
    logistic model of the heuristic keep-gate (label: ``keep_score >=
    0.2``) on the corpus's own quality features (scaled token count,
    stopword ratio, punctuation ratio), then score every document.
    Learning the heuristic's smooth surrogate gives a ranking signal
    where the hard gate gives only a bit — the standard bootstrap for
    quality classifiers before human labels exist.
    """
    from flink_bm25_spark.operators.text_analysis import quality_scores  # noqa: PLC0415

    q = quality_scores(documents)
    feats = q.select(
        "doc_id",
        F.round(F.least(F.col("n_tokens") / 100.0, F.lit(1.0)), 6).alias("x1"),
        F.col("stopword_ratio").alias("x2"),
        F.col("punct_ratio").alias("x3"),
        (F.col("keep_score") >= 0.2).cast("double").alias("y"),
    )
    w = logreg_fit(feats, ["x1", "x2", "x3"], "y", iterations, lr)
    return logreg_score(feats, w, ["x1", "x2", "x3"]).select("doc_id", "p")


def classifier_metrics(
    df: DataFrame,
    label_col: str = "y",
    score_col: str = "p",
    threshold: float = 0.5,
) -> DataFrame:
    """``(metric, value)`` — AUC plus accuracy / precision / recall / F1
    at ``threshold``, as two aggregation passes.

    AUC uses the Mann-Whitney average-rank formula, computed over the
    per-DISTINCT-SCORE relation: scores are 6-decimal-rounded upstream,
    so that relation is bounded (≤ 10⁶ rows) no matter the corpus size,
    and the rank window runs over it — never a global sort of the
    scored corpus.  Ties get average ranks (exact, matching the
    textbook definition).  Threshold metrics are one conditional-sum
    pass.  Degenerate inputs (single-class) yield NULL AUC / metrics
    rather than a division error (ANSI-safe).
    """
    scored = df.select(
        F.col(label_col).cast("double").alias("_y"),
        F.col(score_col).cast("double").alias("_s"),
    )
    per_score = scored.groupBy("_s").agg(
        F.sum(F.when(F.col("_y") == 1.0, 1).otherwise(0))
        .cast("double")
        .alias("_np"),
        F.sum(F.when(F.col("_y") != 1.0, 1).otherwise(0))
        .cast("double")
        .alias("_nn"),
    )
    from pyspark.sql import Window  # noqa: PLC0415

    w = Window.orderBy("_s").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_score.withColumn(
        "_before", F.coalesce(F.sum(F.col("_np") + F.col("_nn")).over(w), F.lit(0.0))
    ).withColumn(
        "_avg_rank",
        F.col("_before") + (F.col("_np") + F.col("_nn") + 1.0) / 2.0,
    )
    agg = ranked.agg(
        F.sum(F.col("_np") * F.col("_avg_rank")).alias("_pr"),
        F.sum("_np").alias("_P"),
        F.sum("_nn").alias("_N"),
    )
    auc = agg.select(
        F.lit("auc").alias("metric"),
        F.round(
            F.when(
                (F.col("_P") > 0) & (F.col("_N") > 0),
                (F.col("_pr") - F.col("_P") * (F.col("_P") + 1.0) / 2.0)
                / (F.col("_P") * F.col("_N")),
            ),
            6,
        ).alias("value"),
    )
    pred = (F.col("_s") >= F.lit(threshold)).cast("double")
    conf = scored.agg(
        F.sum(F.when((pred == 1.0) & (F.col("_y") == 1.0), 1).otherwise(0))
        .cast("double")
        .alias("tp"),
        F.sum(F.when((pred == 1.0) & (F.col("_y") != 1.0), 1).otherwise(0))
        .cast("double")
        .alias("fp"),
        F.sum(F.when((pred != 1.0) & (F.col("_y") == 1.0), 1).otherwise(0))
        .cast("double")
        .alias("fn"),
        F.count(F.lit(1)).cast("double").alias("n"),
    )
    prec = F.when(F.col("tp") + F.col("fp") > 0, F.col("tp") / (F.col("tp") + F.col("fp")))
    rec = F.when(F.col("tp") + F.col("fn") > 0, F.col("tp") / (F.col("tp") + F.col("fn")))
    packed = F.array(
        F.struct(
            F.lit("accuracy").alias("metric"),
            F.round((F.col("n") - F.col("fp") - F.col("fn")) / F.col("n"), 6).alias(
                "value"
            ),
        ),
        F.struct(F.lit("precision").alias("metric"), F.round(prec, 6).alias("value")),
        F.struct(F.lit("recall").alias("metric"), F.round(rec, 6).alias("value")),
        F.struct(
            F.lit("f1").alias("metric"),
            F.round(
                F.when(
                    prec.isNotNull() & rec.isNotNull() & (prec + rec > 0),
                    2.0 * prec * rec / (prec + rec),
                ),
                6,
            ).alias("value"),
        ),
    )
    thresh = conf.select(F.explode(packed).alias("_m")).select(
        "_m.metric", "_m.value"
    )
    return auc.unionByName(thresh)


def power_iteration_top_component(
    embeddings: DataFrame,
    iterations: int = 3,
    vec_col: str = "embedding",
) -> DataFrame:
    """``(dim, component)`` — the corpus's top (uncentered) principal
    direction by power iteration on ``XᵀX``, WITHOUT materializing the
    d×d covariance: each round computes ``s = Σ_rows (x·v)·x`` in ONE
    aggregation (d running sums, partial-agg map-side) and normalizes
    on the driver — d floats per round cross the wire, same posture as
    k-means/logreg.  Embedding-space QA: the top component's dominance
    reveals anisotropy (a rogue dominant direction is the classic
    symptom of degenerate embeddings).

    Deterministic: v₀ = 1/√d, per-round 6-decimal rounding of the
    normalized vector (kmeans caveat applies); the oracle unrolls the
    same rounds in SQL.

    Execution shape (r9 optimization round): the loop stays driver-eager
    (chaining the rounds into one nested declarative plan was measured
    SLOWER at sf0.1 — every round's plan contains all prior rounds', so
    Catalyst planning grows superlinearly), but v now enters the dot
    kernel as ONE array Literal instead of CreateArray(d scalar
    literals): the generated whole-stage code is identical across
    rounds (the literal is a referenced object, not d inlined
    constants), so rounds 2..n are codegen-cache hits instead of fresh
    compiles — the same fix as :func:`~flink_bm25_spark.operators.
    kmeans._squared_dist`.
    """
    import math  # noqa: PLC0415

    first = embeddings.select(vec_col).first()
    if first is None:
        return embeddings.sparkSession.createDataFrame(
            [], "dim int, component double"
        )
    d = len(first[0])
    embeddings = embeddings.cache()
    v = [round(1.0 / math.sqrt(d), 6)] * d

    e = F.col(vec_col)
    for _ in range(iterations):
        # x·v as a HOF fold over the literal-array v (products in index
        # order, left-fold accumulation — the exact double sequence the
        # unrolled form and the SQL oracle compute), then the d running
        # sums as ONE narrow groupBy(dim) over posexplode: partial aggs
        # combine map-side, so the shuffle carries partitions×d rows —
        # identical volume to a d-column wide aggregate, but the plan is
        # d-independent and codegen-stable across rounds (a 64-column agg
        # re-optimized/re-compiled per round: measured 5.7 s → 3.6 s for
        # 3 rounds at sf0.1).
        lit_v = F.lit([float(x) for x in v])
        dot = F.aggregate(
            F.zip_with(e, lit_v, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        # dot is bound in a projection BELOW the explode: selecting it in
        # the same projection as posexplode puts it ABOVE the Generate,
        # where it is re-evaluated once per EXPLODED row — d× the work
        # (measured 1.3 s → 0.3 s per round at sf0.1, d=64).
        pre = embeddings.select(dot.alias("_dot"), e.alias("_e"))
        proj = pre.select(
            "_dot", F.posexplode("_e").alias("dim", "val")
        )
        rows = (
            proj.groupBy("dim")
            .agg(
                F.sum(F.col("val").cast("double") * F.col("_dot")).alias("s")
            )
            .collect()
        )
        s = [0.0] * d
        for r in rows:
            s[r["dim"]] = float(r["s"])
        nrm = math.sqrt(sum(x * x for x in s))
        v = [round(x / nrm, 6) for x in s]
    out = [(i, v[i]) for i in range(d)]
    return embeddings.sparkSession.createDataFrame(
        out, "dim int, component double"
    )


def calibration_curve(
    df: DataFrame,
    label_col: str = "y",
    score_col: str = "p",
    n_bins: int = 10,
) -> DataFrame:
    """``(bin, n, mean_p, frac_pos)`` — the reliability diagram behind a
    probabilistic classifier: scores bucketed into ``n_bins`` equal-width
    bins (bin = floor(p·n_bins), top edge clamped into the last bin),
    each with its mean predicted probability and observed positive rate.
    A calibrated model tracks the diagonal.  One map-side binning + one
    count aggregation."""
    p = F.col(score_col).cast("double")
    b = F.least(
        F.floor(p * F.lit(n_bins)).cast("int"), F.lit(n_bins - 1)
    )
    return (
        df.select(
            b.alias("bin"),
            p.alias("_p"),
            F.col(label_col).cast("double").alias("_y"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.avg("_p"), 6).alias("mean_p"),
            F.round(F.avg("_y"), 6).alias("frac_pos"),
        )
    )
