"""Parquet table loaders.

The reference reads its corpus from MongoDB with hand-written projection
pushdown (fetch only ``pid`` — ``BatchBM25PreMain.java:54-71``) and point
lookups (``getByPid`` — ``BatchBM25PreMain.java:78-105``).  On Spark these
become plain parquet scans: Catalyst pushes column pruning and predicates
into the vectorized parquet reader automatically, so a
``select("doc_id")`` never reads the ``text`` column off disk.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Scan one fixture table (S1 — full scan; pruning/pushdown via Catalyst)."""
    # Timestamp→epoch conversions (NTZ casts, unix_timestamp) read the
    # session timezone; pin UTC so results match the (UTC-naive) SQL
    # oracle under ANY caller-provided session.  Runtime-settable.
    # (unconditional set: conf.get(key, default) VALIDATES the default for
    # this key in Spark 4.1 and throws on a sentinel like '' — a read-then-
    # set guard crashes under a vanilla caller session)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # ts is TIMESTAMP(NANOS) on disk, which the Spark 4 parquet reader
        # rejects outright.  The legacy escape hatch is runtime-settable,
        # so set it here — the engine then works under ANY caller-provided
        # SparkSession (the external driver builds its own).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # nanosAsLong surfaces ts as int64 nanos; truncate to microseconds
        # (`div` = exact integer division; a double division would lose
        # precision at ~1.7e18 nanos) — the same µs granularity SQL engines
        # use, so ordering and window bucketing agree with the oracle.
        from pyspark.sql import functions as F  # noqa: PLC0415

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # Micros-precision NTZ fixtures: normalize to TIMESTAMP so
            # epoch arithmetic (unix_micros, long casts) resolves.  With
            # the session timezone pinned to UTC above, the NTZ→LTZ cast
            # preserves the wall-clock instant bit-for-bit, and
            # unix_micros == DuckDB epoch_us on the same (naive) values.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_documents(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """The corpus table — analogue of Mongo ``candidate.file``
    (``BatchBM25PreMain.java:55,90-97``)."""
    return load_table(spark, "documents", sf_dir)


def load_events(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    return load_table(spark, "events", sf_dir)


def load_embeddings(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    return load_table(spark, "embeddings", sf_dir)


def load_csv(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """CSV source with an explicit schema (inference is a full extra scan —
    never in production paths)."""
    reader = spark.read.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def load_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSON-lines source with an explicit schema (schema inference is a
    full extra scan — acceptable in exploration, never in production
    paths; at 100 TB an inferred schema also silently widens types)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def load_json_quarantine(
    spark: SparkSession,
    path: str,
    schema,
    corrupt_col: str = "_corrupt_record",
):
    """PERMISSIVE JSON-lines ingestion with a quarantine lane: returns
    ``(good, quarantined)`` — well-formed rows parsed into ``schema``
    versus raw malformed lines.  The production middle ground between
    FAILFAST (one bad line kills a 100 TB ingest) and DROPMALFORMED
    (bad lines vanish silently, unauditable).

    One scan serves both lanes: the parsed frame is persisted before
    splitting because (a) Spark refuses a query that reads ONLY the
    internal corrupt column, and (b) without it each lane would re-read
    and re-parse the raw input.  At real scale, write the parsed frame
    to a staging table instead of memory-persisting and split from
    there — same shape, durable.
    """
    from pyspark.sql.types import StringType, StructType  # noqa: PLC0415

    # copy the field list — StructType(...) keeps a reference, and .add()
    # mutates in place, which would append the corrupt column to the
    # CALLER's schema
    full = StructType(list(schema.fields)).add(corrupt_col, StringType())
    parsed = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
        .persist()
    )
    good = parsed.where(F.col(corrupt_col).isNull()).drop(corrupt_col)
    quarantined = parsed.where(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw")
    )
    return good, quarantined


def load_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source — columnar like parquet (self-describing schema,
    predicate pushdown and column pruning both apply)."""
    return spark.read.orc(path)


def load_text(spark: SparkSession, path: str) -> DataFrame:
    """S7 — line-oriented text source (``env.readTextFile``,
    ``backup/StreamingJob.java:68``): one ``value`` row per line."""
    return spark.read.text(path)


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every fixture table as a temp view for the SQL surface."""
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)


def register_corpus_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """SQL-first surface: expose the derived BM25 statistics relations
    (tokens/tf/dlen/df/idf) as temp views so the whole engine is usable
    from ``spark.sql`` alone — the flink-table layer the reference declares
    but never wires up (``pom.xml:67-76``, SURVEY.md §1.1).
    """
    from flink_bm25_spark.operators.pipeline import corpus_stats_for  # noqa: PLC0415

    register_views(spark, sf_dir)
    stats = corpus_stats_for(spark, sf_dir)
    stats.tokens.createOrReplaceTempView("tokens")
    stats.tf.createOrReplaceTempView("tf")
    stats.dlen.createOrReplaceTempView("dlen")
    stats.df_stats.createOrReplaceTempView("dfreq")
    stats.idf_stats.createOrReplaceTempView("idf")


def register_curation_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Extend the SQL surface with the curation relations — quality
    scores, shingles, chunks, LM scores, token stats — so a data-quality
    analyst can drive the whole pipeline from ``spark.sql`` without
    touching the Python API (``SELECT * FROM quality WHERE keep_score <
    0.2``, ``SELECT * FROM lm_scores ORDER BY nll DESC LIMIT 20`` …).
    Views are lazy: registering costs nothing until queried.
    """
    from flink_bm25_spark.operators.dedup import shingles  # noqa: PLC0415
    from flink_bm25_spark.operators.text_analysis import (  # noqa: PLC0415
        chunk_documents,
        lm_perplexity_scores,
        quality_scores,
        token_stats,
    )

    register_views(spark, sf_dir)
    docs = load_documents(spark, sf_dir)
    quality_scores(docs).createOrReplaceTempView("quality")
    shingles(docs).createOrReplaceTempView("shingles")
    chunk_documents(docs).createOrReplaceTempView("chunks")
    lm_perplexity_scores(docs).createOrReplaceTempView("lm_scores")
    token_stats(docs).createOrReplaceTempView("token_stats")
