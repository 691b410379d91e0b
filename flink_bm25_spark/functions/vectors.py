"""Vector math over ``array<float>`` embedding columns.

Built on ``F.zip_with`` / ``F.aggregate`` (JVM higher-order functions) —
no UDF, no Python serialization, vectorizable by codegen.  Accumulation is
in double precision in strict index order, matching the SQL oracle's fold
semantics so rounded results agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    products = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(products, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
