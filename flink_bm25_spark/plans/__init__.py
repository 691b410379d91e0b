"""Plan inspection — make the 100 TB design posture *testable*.

Rather than trusting that Catalyst pushed a filter or broadcast a join,
these helpers surface the physical plan as a string so tests (and bench
investigations) can assert the shape: pushed filters reach the parquet
scan, small sides broadcast, per-stage shuffle counts stay at the designed
number.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """Capture ``df.explain(mode)`` output as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan — the metric that
    dominates cost at scale.  AQE reuse/coalescing can only reduce it."""
    plan = explain_str(df, "simple")
    return plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df, "simple")


def scan_read_schema(df: DataFrame) -> str:
    """The ReadSchema fragment of the (first) parquet scan — verifies
    column pruning reached the reader."""
    plan = explain_str(df, "formatted")
    for line in plan.splitlines():
        if "ReadSchema" in line:
            return line.strip()
    return ""


def pushed_filters(df: DataFrame) -> str:
    plan = explain_str(df, "formatted")
    return "\n".join(
        line.strip() for line in plan.splitlines() if "PushedFilters" in line
    )
