"""Data-profiling operators — distributional outlier detection.

A training-data pipeline screens numeric telemetry (reward scores,
lengths, loss values) for outliers before aggregation; the relational
form is per-group moments + a z-score filter, all in one pass over the
fact table plus a broadcast join of the tiny moments relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def numeric_outliers(
    df: DataFrame,
    value_col: str,
    group_col: str,
    z: float = 3.0,
    id_col: str = "event_id",
) -> DataFrame:
    """Rows whose value deviates from their group mean by more than
    ``z`` population standard deviations:
    ``(id_col, group_col, value_col, zscore)``.

    Moments come from one groupBy over the fact table (sum/sum-of-squares
    partials combine map-side; the population variance
    ``E[x²] − E[x]²`` form keeps the aggregation single-pass), and the
    per-group moments relation is groups-sized — broadcast back, so the
    fact table is scanned twice but never shuffled for the join.
    zscore is rounded to 6 dp for the cross-engine contract.
    """
    moments = (
        df.groupBy(group_col)
        .agg(
            F.avg(F.col(value_col)).alias("_mu"),
            (
                F.avg(F.col(value_col) * F.col(value_col))
                - F.avg(F.col(value_col)) * F.avg(F.col(value_col))
            ).alias("_var"),
        )
        .where(F.col("_var") > 0)
    )
    zscore = F.round(
        (F.col(value_col) - F.col("_mu")) / F.sqrt(F.col("_var")), 6
    )
    return (
        df.join(F.broadcast(moments), group_col)
        .withColumn("zscore", zscore)
        .where(F.abs(F.col("zscore")) > F.lit(z))
        .select(id_col, group_col, value_col, "zscore")
    )
