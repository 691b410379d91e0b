"""SparkSession factory tuned for both local testing and cluster scale.

The reference hardcodes parallelism per job (8/32/5/1 —
``BatchBM25PreMain.java:148``, ``backup/StreamingJob.java:187``); here the
equivalent knobs are AQE + shuffle-partition sizing, which re-plan at
runtime instead of being frozen into the job.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "flink_bm25_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-aware defaults.

    Defaults matter at 100 TB:

    - AQE on (+ partition coalescing + skew-join) so shuffle sizing and
      skew handling are decided from runtime statistics, not guessed.
    - Arrow enabled so any Pandas-UDF path is batch-vectorized.
    - Session timezone pinned to UTC so timestamp semantics are stable
      across engines (and match the DuckDB oracle).
    - Shuffle partitions default to the local core count for tests; on a
      real cluster AQE coalescing makes the initial number less critical.
    """
    # Python workers inherit PYTHONPATH (not the driver's sys.path); make
    # sure this package resolves on executors even when the driver was
    # launched from another directory.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{existing}" if existing else pkg_root
        )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # The sketch builders aggregate 60-64 conditional columns in ONE
        # groupBy (minhash wide signature, simhash bit-sums).  Above the
        # default maxFields=100 whole-stage codegen silently disables and
        # those aggregates run interpreted — measured ~2x slower.  Raise
        # the ceiling so the widest planned aggregate still compiles.
        .config("spark.sql.codegen.maxFields", "256")
        # The events fixture stores TIMESTAMP(NANOS), which the Spark parquet
        # reader rejects by default; read as long and normalize in the loader.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
