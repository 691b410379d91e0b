"""Change-data-capture primitives: SCD2 history build + CDC merge apply.

The reference maintains its DF statistics table by point-upserting Mongo
documents per batch (``$inc`` sink, ``BatchBM25PreMain`` — SURVEY.md §2.7
K1/A3): a mutable last-writer-wins keyed store fed by a change stream.
This module re-expresses that pattern as the two relational shapes a
warehouse uses instead of point writes:

- :func:`scd2_history` — a type-2 slowly-changing-dimension view of the
  change log: every change becomes a validity interval
  ``[valid_from, valid_to)``, so *all* historical states stay queryable
  (the reference's upsert store keeps only the last one).
- :func:`cdc_apply` — Delta-``MERGE``-style application of a change batch
  (upserts + deletes) onto a base snapshot, without a mutable table:
  dedupe the batch to the latest change per key, anti-join the affected
  keys out of the base, union the surviving upserts back in.

Scale posture: ``scd2_history`` is ONE shuffle of the change log on the
key — both window functions (lead + row_number) share the exchange and
sort.  ``cdc_apply`` never shuffles the base: the change batch is orders
of magnitude smaller than the snapshot (that is what makes it a *batch*),
so its deduped key set broadcasts, and both the anti-join and the union
are exchange-free on the base side.  At 100 TB the snapshot crosses the
network zero times per merge.

All time arithmetic is integer microseconds (``unix_micros`` ==
DuckDB ``epoch_us``), per the cross-engine parity contract.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: ``valid_to`` of the open (current) interval: 9999-12-31T00:00:00Z in
#: epoch microseconds.  A sentinel rather than NULL so interval predicates
#: (``valid_from_us <= t AND t < valid_to_us``) need no NULL guard.
OPEN_INTERVAL_US = 253_402_214_400_000_000


def scd2_history(
    changes: DataFrame,
    keys: Sequence[str] = ("user_id",),
    ts: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Type-2 SCD history from a change log: one output row per change,
    carrying its validity interval and version number.

    Adds ``valid_from_us`` / ``valid_to_us`` (epoch µs, half-open;
    ``valid_to_us`` of the latest change is :data:`OPEN_INTERVAL_US`),
    ``version`` (1-based per key, in change order) and ``is_current``.

    lead + row_number over the SAME window partitioning: Catalyst plans a
    single exchange on the key and one Window node — the change log is
    shuffled exactly once regardless of corpus size.
    """
    us = F.unix_micros(F.col(ts))
    w = Window.partitionBy(*keys).orderBy(us.asc(), F.col(order_tiebreak).asc())
    return (
        changes.withColumn("valid_from_us", us)
        .withColumn(
            "valid_to_us",
            F.coalesce(
                F.lead("valid_from_us").over(w), F.lit(OPEN_INTERVAL_US)
            ),
        )
        .withColumn("version", F.row_number().over(w).cast("int"))
        .withColumn("is_current", F.col("valid_to_us") == F.lit(OPEN_INTERVAL_US))
    )


def latest_changes(
    changes: DataFrame,
    keys: Sequence[str] = ("user_id",),
    ts: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Dedupe a change batch to the LAST change per key (the only one that
    matters for a last-writer-wins merge).  One shuffle of the batch —
    which is small by construction; the snapshot is never touched here."""
    us = F.unix_micros(F.col(ts))
    w = Window.partitionBy(*keys).orderBy(us.desc(), F.col(order_tiebreak).desc())
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def cdc_apply(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str] = ("user_id",),
    ts: str = "ts",
    order_tiebreak: str = "event_id",
    op_col: str = "op",
    delete_op: str = "delete",
) -> DataFrame:
    """Apply a CDC batch onto a base snapshot — ``MERGE INTO`` without a
    mutable table.

    ``changes`` rows carry ``op_col`` (``delete_op`` ⇒ delete, anything
    else ⇒ upsert).  Per key only the latest change applies.  The result
    has exactly ``base``'s columns.

    Plan shape: the deduped change batch broadcasts; the base side sees a
    broadcast anti-join (drop every touched key) and a union with the
    upserts — zero exchanges over the snapshot.
    """
    latest = latest_changes(changes, keys=keys, ts=ts, order_tiebreak=order_tiebreak)
    touched = F.broadcast(latest.select(*keys))
    survivors = base.join(touched, on=list(keys), how="left_anti")
    upserts = latest.where(F.col(op_col) != delete_op).select(*base.columns)
    return survivors.unionByName(upserts)


def snapshot_of(
    changes: DataFrame,
    keys: Sequence[str] = ("user_id",),
    ts: str = "ts",
    order_tiebreak: str = "event_id",
    op_col: str = "op",
    delete_op: str = "delete",
) -> DataFrame:
    """Fold an entire change log into its final snapshot: the latest change
    per key, minus keys whose latest change is a delete.  This is the
    algebraic identity CDC relies on::

        snapshot_of(log) == cdc_apply(snapshot_of(log[:t]), log[t:])

    (pinned by test and by the ``q_cdc_apply`` oracle, which computes the
    left side in DuckDB while Spark computes the right)."""
    latest = latest_changes(changes, keys=keys, ts=ts, order_tiebreak=order_tiebreak)
    return latest.where(F.col(op_col) != delete_op)
