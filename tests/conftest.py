"""Shared fixtures: one local SparkSession + a DuckDB oracle comparator
that mimics the driver's t2 check (row count + schema + order-insensitive
value comparison)."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_bm25_spark.session import get_spark
from flink_bm25_spark.sources.tables import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="flink_bm25_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if hasattr(v, "isoformat"):  # datetime/date — engine-neutral text form
        return v.isoformat()
    if isinstance(v, (int, str, bool, bytes)):
        return v
    return str(v)


def normalize(rows, columns):
    """Sort columns by name, normalize cells, return a sorted multiset."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return out


def compare_spark_duck(spark_df, duck_con, sql, check_schema=True):
    """Assert the Spark DataFrame and the DuckDB result are value-identical
    (order-insensitive, columns matched by name)."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    res = duck_con.execute(sql)
    d_cols = [c[0] for c in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (
        f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    )
    sn = normalize(s_rows, s_cols)
    dn = normalize(d_rows, d_cols)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(sn, dn)) if a != b
    ]
    assert not mismatches, f"value mismatch (first 5): {mismatches[:5]}"
