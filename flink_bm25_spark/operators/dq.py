"""Data-quality audit operators — the validation pass a training-data
pipeline runs before (and after) every ingest.

The reference trusts its store blindly (``MongoUtil.java`` does raw
find/insert with no validation); at 100 TB that discipline fails quietly
— a nulled-out column, a duplicated key, or an out-of-domain enum in one
upstream shard poisons every statistic downstream.  These operators make
the checks first-class relational citizens so they compose into the same
declarative plan as the pipeline they guard.

Scale shape: the profile is ONE aggregate pass over the table (per-column
counters fold map-side into a single 1-row shuffle, then fan back out as
rows with an explode — never one job per column).  Constraint checks are
map-side filters; uniqueness is one groupBy on the key; referential
checks are keyed anti-joins that AQE turns into broadcasts only when the
parent side is genuinely small.  A full audit is a union of 1-row
aggregates — one plan, one pass per table scanned.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def null_profile(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """``(col_name, n_rows, n_null, null_frac)`` — one row per audited
    column, computed in a SINGLE aggregate pass (``count(col)`` skips
    nulls, so per-column non-null counters ride the same map-side partial
    aggregation; the explode that reshapes counters into rows happens on
    the 1-row result, not the data)."""
    cols = list(cols) if cols is not None else df.columns
    agg = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.count(F.col(c)).alias(f"__nn_{c}") for c in cols],
    )
    packed = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                (F.col("n_rows") - F.col(f"__nn_{c}")).alias("n_null"),
            )
            for c in cols
        ]
    )
    return agg.select("n_rows", F.explode(packed).alias("p")).select(
        F.col("p.col_name").alias("col_name"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("p.n_null").cast("long").alias("n_null"),
        F.round(
            F.when(
                F.col("n_rows") > 0, F.col("p.n_null") / F.col("n_rows")
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("null_frac"),
    )


def uniqueness_violations(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Key tuples that appear more than once: ``(*keys, n_dup)``.
    One shuffle on the candidate key."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_dup"))
        .where(F.col("n_dup") > 1)
    )


def fk_orphans(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str | None = None,
) -> DataFrame:
    """Child rows whose foreign key has no parent — a keyed left-anti
    join (the parent side is reduced to its distinct key first, so the
    join never carries parent payload; AQE broadcasts it when small)."""
    pk = parent_key or child_key
    keys = parent.select(F.col(pk).alias(child_key)).distinct()
    return child.join(keys, child_key, "left_anti")


def accepted_values_violations(
    df: DataFrame, col: str, allowed: Iterable[str]
) -> DataFrame:
    """Rows whose ``col`` is outside the allow-list (NULL counts as a
    violation — an enum column with no value is as wrong as a bad one)."""
    c = F.col(col)
    return df.where(~c.isin(*list(allowed)) | c.isNull())


def range_violations(
    df: DataFrame,
    col: str,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Rows whose numeric ``col`` falls outside ``[lo, hi]`` (either
    bound optional; NULL is a violation)."""
    c = F.col(col)
    cond = c.isNull()
    if lo is not None:
        cond = cond | (c < F.lit(lo))
    if hi is not None:
        cond = cond | (c > F.lit(hi))
    return df.where(cond)


def expression_violations(df: DataFrame, predicate: Column) -> DataFrame:
    """Rows violating an arbitrary row-level invariant (pass the
    predicate that should HOLD; rows where it is false or NULL are
    returned).  Map-side, zero shuffles."""
    return df.where(~F.coalesce(predicate, F.lit(False)))


def dq_summary(checks: Sequence[tuple[str, DataFrame]]) -> DataFrame:
    """``(dq_check, violations)`` — one row per named check, the union of
    each check's 1-row count aggregate.  Every union leg reduces to a
    scalar before the union (no violation payload moves), but each leg
    plans its OWN scan — for many row-level checks on one table, use
    :func:`dq_summary_fused`, which folds them into a single pass."""
    legs = [
        df.agg(F.count(F.lit(1)).cast("long").alias("violations")).select(
            F.lit(name).alias("dq_check"), "violations"
        )
        for name, df in checks
    ]
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


def dq_summary_fused(
    df: DataFrame, predicates: Sequence[tuple[str, Column]]
) -> DataFrame:
    """``(dq_check, violations)`` for several ROW-LEVEL invariants of one
    table in a SINGLE aggregate pass: each named predicate (the
    condition that should HOLD; NULL counts as a violation) becomes a
    conditional counter in one map-side partial agg — the table is
    scanned once no matter how many checks ride along.  This is the
    100 TB form for same-table checks; :func:`dq_summary` remains the
    general composition for checks that need joins or grouping
    (uniqueness, FK orphans) or span tables.
    """
    agg = df.agg(
        *[
            F.sum(
                F.when(~F.coalesce(pred, F.lit(False)), 1).otherwise(0)
            )
            .cast("long")
            .alias(f"__v{i}")
            for i, (_, pred) in enumerate(predicates)
        ]
    )
    packed = F.array(
        *[
            F.struct(
                F.lit(name).alias("dq_check"), F.col(f"__v{i}").alias("violations")
            )
            for i, (name, _) in enumerate(predicates)
        ]
    )
    return agg.select(F.explode(packed).alias("_p")).select(
        "_p.dq_check", "_p.violations"
    )


def dataset_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """``(*keys, change)`` for every row that differs between two
    dataset versions -- ``change`` in {'added', 'removed', 'changed'};
    unchanged rows are omitted.  The audit behind any reprocessing run:
    "what did the new pipeline version actually change?"

    Each side reduces to ``(keys, content-hash)`` BEFORE the join (an
    md5 of the compared columns with NULL markers and a \\x01 field
    separator), so the full-outer join moves 32-byte digests instead of
    row payloads, keyed on the same key both relations already hash on.
    The hash is engine-portable (the DuckDB oracle replays it), unlike
    an engine-native row hash.
    """
    cc = list(compare_cols) if compare_cols is not None else [
        c for c in new.columns if c not in keys
    ]

    def content_hash(df: DataFrame) -> DataFrame:
        h = F.md5(
            F.concat_ws(
                "\x01",
                *[
                    F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
                    for c in cc
                ],
            ).cast("binary")
        )
        return df.select(*keys, h.alias("_h"))

    o = content_hash(old).withColumnRenamed("_h", "_ho")
    n = content_hash(new).withColumnRenamed("_h", "_hn")
    joined = o.join(n, list(keys), "full_outer")
    change = (
        F.when(F.col("_ho").isNull(), F.lit("added"))
        .when(F.col("_hn").isNull(), F.lit("removed"))
        .when(F.col("_ho") != F.col("_hn"), F.lit("changed"))
    )
    return joined.withColumn("change", change).where(
        F.col("change").isNotNull()
    ).select(*keys, "change")
