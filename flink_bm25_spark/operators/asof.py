"""As-of (temporal) join — an operator the reference's dataflow engine has
no counterpart for, but which any event/time-series workload on its data
model needs (``events``-style streams, ``backup/UnionTest.java:54-103``
unions keyed event streams without ever aligning them in time).

Spark has no native ASOF JOIN, and the naive formulation —
``l JOIN r ON l.k = r.k AND r.ts <= l.ts`` + max-filter — is a range
cross-join whose intermediate blows up quadratically per key.  This
implementation is the scalable sort-merge form:

    union(left tagged 1, right tagged 0)
      -> window per key ordered by (ts, tag)
      -> running ``last(value, ignorenulls)``
      -> keep left rows

One shuffle on the join key, O(n log n) per key, no intermediate blow-up —
the plan a 1000-executor cluster wants at 100 TB: both inputs co-partition
on the key, the window sort is per-partition, and skewed keys spill rather
than multiply.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] = ("value",),
    tiebreak: str | None = None,
    how: str = "inner",
    prefix: str = "asof_",
    tolerance: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach the latest right row of the same ``on``
    key with ``right_ts <= left_ts`` (backward as-of).

    ``value_cols`` are the right columns to carry; they surface as
    ``{prefix}{col}``.  When several right rows share one (key, ts),
    ``tiebreak`` picks the one with the max value of that column
    (deterministic); otherwise the survivor is unspecified.
    ``how`` = ``inner`` drops left rows with no prior right row,
    ``left`` keeps them with nulls.

    ``tolerance`` (same units as the ts columns; seconds when they are
    timestamps) bounds the match age: a right row older than
    ``left_ts - tolerance`` is treated as NO match — pandas
    ``merge_asof(tolerance=...)`` semantics — still within the single
    sort-merge pass (the matched ts rides the same running-last fill).

    ``direction='forward'`` attaches the EARLIEST right row with
    ``right_ts >= left_ts`` instead (the other merge_asof direction):
    identical machinery with the window ordered descending — ties still
    match, tolerance bounds ``matched_ts - left_ts``.
    ``direction='nearest'`` runs BOTH fills over the same key exchange
    (two window sorts, one shuffle) and keeps the closer match per left
    row — backward wins exact-distance ties (deterministic); tolerance
    bounds whichever gap was chosen.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )

    r_cols = list(value_cols)
    if tiebreak is not None and tiebreak not in r_cols:
        r_cols.append(tiebreak)
    r = right.select(
        F.col(on), F.col(right_ts).alias("__t"), *[F.col(c) for c in r_cols]
    )
    if tiebreak is not None:
        # one survivor per (key, ts): max_by on the tiebreak column —
        # a partial-aggregatable reduction (map-side combine), not a window
        r = r.groupBy(on, "__t").agg(
            *[
                F.max_by(F.col(c), F.col(tiebreak)).alias(c)
                for c in value_cols
            ]
        )

    left_struct = F.struct(*[F.col(c) for c in left.columns]).alias("__l")
    l_tagged = left.select(
        F.col(on),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__s"),
        left_struct,
        *[
            F.lit(None).cast(r.schema[c].dataType).alias(f"__v_{c}")
            for c in value_cols
        ],
    )
    null_left = F.lit(None).cast(
        l_tagged.schema["__l"].dataType
    ).alias("__l")
    r_tagged = r.select(
        F.col(on),
        F.col("__t"),
        F.lit(0).alias("__s"),
        null_left,
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )

    # right rows sort before left rows at equal ts (__s 0 < 1), so a left
    # row at exactly t sees a right row at t — the <=/>= tie semantics in
    # either direction.  forward = the same scan over descending ts;
    # nearest = BOTH fills over the one exchange (two window sorts share
    # the hash partitioning on the key), closer match wins, backward on
    # ties (deterministic).
    w_back = (
        Window.partitionBy(on)
        .orderBy(F.asc("__t"), F.asc("__s"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(on)
        .orderBy(F.desc("__t"), F.asc("__s"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the matched right ts rides along so a tolerance bound can be
    # applied AFTER the fill without a second pass
    mt = F.when(F.col("__s") == 0, F.col("__t"))
    union = l_tagged.unionByName(r_tagged)

    def _fill(w):
        return [F.last(mt, ignorenulls=True).over(w).alias("__mt")] + [
            F.last(f"__v_{c}", ignorenulls=True).over(w).alias(f"__v_{c}")
            for c in value_cols
        ]

    if direction != "nearest":
        w = w_back if direction == "backward" else w_fwd
        filled = union.select(F.col(on), "__t", "__s", "__l", *_fill(w))
        out = filled.where(F.col("__s") == 1)
        if tolerance is not None:
            age = (
                F.col("__t").cast("double") - F.col("__mt").cast("double")
                if direction == "backward"
                else F.col("__mt").cast("double") - F.col("__t").cast("double")
            )
            stale = F.col("__mt").isNull() | (age > F.lit(float(tolerance)))
            out = out.select(
                F.col(on),
                "__t",
                "__s",
                "__l",
                "__mt",
                *[
                    F.when(~stale, F.col(f"__v_{c}")).alias(f"__v_{c}")
                    for c in value_cols
                ],
            )
    else:
        both = union.select(
            F.col(on),
            "__t",
            "__s",
            "__l",
            F.last(mt, ignorenulls=True).over(w_back).alias("__mtb"),
            *[
                F.last(f"__v_{c}", ignorenulls=True)
                .over(w_back)
                .alias(f"__vb_{c}")
                for c in value_cols
            ],
            F.last(mt, ignorenulls=True).over(w_fwd).alias("__mtf"),
            *[
                F.last(f"__v_{c}", ignorenulls=True)
                .over(w_fwd)
                .alias(f"__vf_{c}")
                for c in value_cols
            ],
        )
        t = F.col("__t").cast("double")
        age_b = t - F.col("__mtb").cast("double")
        age_f = F.col("__mtf").cast("double") - t
        if tolerance is not None:
            tol = F.lit(float(tolerance))
            b_ok = F.col("__mtb").isNotNull() & (age_b <= tol)
            f_ok = F.col("__mtf").isNotNull() & (age_f <= tol)
        else:
            b_ok = F.col("__mtb").isNotNull()
            f_ok = F.col("__mtf").isNotNull()
        use_back = b_ok & (~f_ok | (age_b <= age_f))
        use_fwd = f_ok & ~use_back
        out = both.where(F.col("__s") == 1).select(
            F.col(on),
            "__t",
            "__s",
            "__l",
            *[
                F.when(use_back, F.col(f"__vb_{c}"))
                .when(use_fwd, F.col(f"__vf_{c}"))
                .alias(f"__v_{c}")
                for c in value_cols
            ],
        )
    if how == "inner":
        out = out.where(F.col(f"__v_{value_cols[0]}").isNotNull())
    return out.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__v_{c}").alias(f"{prefix}{c}") for c in value_cols],
    )


def range_window_agg(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    lookback_s: int = 300,
) -> DataFrame:
    """Per-row trailing range aggregate: count and sum of the same key's
    rows within the previous ``lookback_s`` seconds (inclusive).

    A RANGE window frame over the event-time axis — the batch twin of a
    sliding-window stream aggregate, and the scalable alternative to a
    self range-join (which is quadratic per key).  Frames are peer-
    inclusive on ties, so results are deterministic.
    """
    w = (
        Window.partitionBy(key)
        .orderBy(F.unix_micros(F.col(ts)))
        .rangeBetween(-lookback_s * 1_000_000, 0)
    )
    return events.select(
        "event_id",
        F.col(key),
        F.count("*").over(w).cast("long").alias("n_trailing"),
        F.round(F.sum(value).over(w), 6).alias("sum_trailing"),
    )
