"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship corpus-at-once BM25 ranking on sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2.10 +
large-scale-pipeline extensions), each ``(spark, sf_dir) -> DataFrame``.
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query key.

Determinism contract shared by both sides (SURVEY.md §5):
- tokenizer = lowercase + split on ``\\s+``, drop empty strings;
- stopwords = fixed list in ``flink_bm25_spark.config.STOPWORDS``;
- IDF uses float division ``ln(N/(df+1))``;
- all double outputs rounded to 6 decimals; ranks tiebreak on word/doc_id;
- sketch hashing is md5-derived (bit-identical in Spark and DuckDB).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_bm25_spark.config import (
    BM25_B,
    BM25_K1,
    DEFAULT_QUERY_TERMS,
    HASH_PRIME,
    STOPWORDS,
    TOP_K_TERMS,
)
from flink_bm25_spark.operators.bm25 import bm25_rank, tfidf
from flink_bm25_spark.operators.df_idf import distinct_words
from flink_bm25_spark.operators.pipeline import corpus_stats_for
from flink_bm25_spark.operators.tf import topk_terms
from flink_bm25_spark.operators.tokenize import filter_stopwords, tokenize
from flink_bm25_spark.sources.tables import load_table

_SW = ", ".join(f"'{w}'" for w in STOPWORDS)
_QT = ", ".join(f"'{w}'" for w in DEFAULT_QUERY_TERMS)

# Shared DuckDB CTE prelude mirroring flink_bm25_spark.operators.pipeline.
_PIPE = f"""
tokens AS (
  SELECT doc_id, word FROM (
    SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS word
    FROM documents
  ) WHERE word <> ''
),
filtered AS (SELECT doc_id, word FROM tokens WHERE word NOT IN ({_SW})),
tf AS (SELECT doc_id, word, count(*) AS tf FROM filtered GROUP BY doc_id, word),
dlen AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
idf AS (
  SELECT word, df,
         ln(CAST((SELECT count(*) FROM documents) AS DOUBLE) / (df + 1)) AS idf
  FROM dfreq
)
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: BM25 top-10 ranking for a term query over the
    sf0.001 corpus — exercises scan, explode, filter, two aggregations,
    broadcast + shuffle joins, window/top-k (SURVEY.md §7 Phase 0)."""
    stats = corpus_stats_for(spark, "/root/testdata/sf0.001", cache_tf=True)
    return bm25_rank(
        stats.tf, stats.idf_stats, stats.dlen, DEFAULT_QUERY_TERMS, k=10
    )


# --------------------------------------------------------------------------
# queries() — Spark side
# --------------------------------------------------------------------------


def _q_scan_project(spark, sf_dir):
    # S1 — full scan + projection (reference getPidList, BatchBM25PreMain.java:54-71)
    return load_table(spark, "documents", sf_dir).select("doc_id", "n_chars")


def _q_point_lookup(spark, sf_dir):
    # S2 — point lookup by key (getByPid, BatchBM25PreMain.java:78-105)
    return (
        load_table(spark, "documents", sf_dir)
        .where(F.col("doc_id") == 42)
        .select("doc_id", "lang", "source", "n_chars")
    )


def _q_filter_limit(spark, sf_dir):
    # S3/O3 — filter + deterministic limit (backup/BatchBM25PrePrint.java:55)
    return (
        load_table(spark, "documents", sf_dir)
        .where(F.col("lang") == "en")
        .orderBy("doc_id")
        .limit(10)
        .select("doc_id", "lang", "n_chars")
    )


def _q_paged_scan(spark, sf_dir):
    # S8 — sort + skip/limit pagination (MongoUtil.findByPage, util/MongoUtil.java:140-143)
    return (
        load_table(spark, "documents", sf_dir)
        .orderBy("doc_id")
        .offset(100)
        .limit(50)
        .select("doc_id", "source")
    )


def _q_concat_fields(spark, sf_dir):
    # S4/F4 — multi-field content assembly (BatchBM25PreMain.java:91-97)
    return load_table(spark, "documents", sf_dir).select(
        "doc_id",
        F.concat_ws("|", F.col("lang"), F.col("source")).alias("meta"),
        (F.col("n_chars") * 2).cast("long").alias("n_chars_x2"),
    )


def _q_tokenize_explode(spark, sf_dir):
    # P1 — tokenize flatMap → (doc_id, word) stream (BatchBM25PreMain.java:183-196)
    return tokenize(load_table(spark, "documents", sf_dir))


def _q_stopword_filter(spark, sf_dir):
    # P2/P3 — stopword predicate (BatchBM25PreMain.java:38-48)
    return filter_stopwords(tokenize(load_table(spark, "documents", sf_dir)))


def _stats(spark, sf_dir):
    return corpus_stats_for(spark, sf_dir)


def _q_tf(spark, sf_dir):
    # A1 — groupBy(doc,word).count (BatchBM25PreMain.java:200-205)
    return _stats(spark, sf_dir).tf


def _q_doc_len(spark, sf_dir):
    return _stats(spark, sf_dir).dlen


def _q_distinct_words(spark, sf_dir):
    # A5 — distinct on word (backup/BatchBM25Pre.java:153)
    return distinct_words(
        filter_stopwords(tokenize(load_table(spark, "documents", sf_dir)))
    )


def _q_df(spark, sf_dir):
    # A2 — global document frequency (backup/BatchBM25PrePrint.java:213)
    return _stats(spark, sf_dir).df_stats


def _q_idf(spark, sf_dir):
    # F1 — idf = ln(N/(df+1)), float division (util/TfIdfUtil.java:121 + SURVEY §5)
    s = _stats(spark, sf_dir)
    return s.idf_stats.select("word", "df", F.round("idf", 6).alias("idf"))


def _q_count_docs(spark, sf_dir):
    # A6 — scalar corpus count (backup/BMStream.java:328)
    return (
        load_table(spark, "documents", sf_dir)
        .agg(F.count("*").alias("n_docs"))
    )


def _q_topk_per_doc(spark, sf_dir):
    # A4/P6/O4 — top-30 terms per doc, desc tf / asc word (BatchBM25PreMain.java:50,214-236)
    return topk_terms(_stats(spark, sf_dir).tf, TOP_K_TERMS)


def _q_sort_desc(spark, sf_dir):
    # O1/O2 — global word counts sorted desc (backup/BatchBM25Pre.java:156)
    s = _stats(spark, sf_dir)
    return (
        s.tf.groupBy("word")
        .agg(F.sum("tf").cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
    )


def _q_union_merge(spark, sf_dir):
    # U1/A2 — union of two token-count halves, re-aggregated
    # (backup/BatchBM25PrePrint.java:213: union().groupBy(0).sum(1))
    docs = load_table(spark, "documents", sf_dir)
    lo = filter_stopwords(tokenize(docs.where(F.col("doc_id") < 250)))
    hi = filter_stopwords(tokenize(docs.where(F.col("doc_id") >= 250)))
    lo_c = lo.groupBy("word").agg(F.count("*").alias("c"))
    hi_c = hi.groupBy("word").agg(F.count("*").alias("c"))
    return (
        lo_c.unionByName(hi_c)
        .groupBy("word")
        .agg(F.sum("c").cast("long").alias("cnt"))
    )


def _q_tfidf(spark, sf_dir):
    # F2 — tfidf = tf * idf (util/TfIdfUtil.java:126-137)
    s = _stats(spark, sf_dir)
    return tfidf(s.tf, s.idf_stats).select(
        "doc_id", "word", F.round("tfidf", 6).alias("tfidf")
    )


def _q_bm25_rank(spark, sf_dir):
    # F3 — BM25 completion over the materialized statistics (SURVEY §2.4)
    s = _stats(spark, sf_dir)
    return bm25_rank(s.tf, s.idf_stats, s.dlen, DEFAULT_QUERY_TERMS, k=10)


def _q_tf_vector_sink(spark, sf_dir):
    # K1 — nested TF document shape {_id, tf:[{w,c}]} (model/TF.java:66-74),
    # rendered as a canonical string so the oracle hash is engine-neutral.
    s = _stats(spark, sf_dir)
    arr = F.sort_array(
        F.collect_list(F.struct((-F.col("tf")).alias("negc"), F.col("word").alias("w")))
    )
    folded = s.tf.groupBy("doc_id").agg(arr.alias("ks"))
    rendered = F.array_join(
        F.transform(
            F.slice(F.col("ks"), 1, TOP_K_TERMS),
            lambda x: F.concat_ws(":", x["w"], (-x["negc"]).cast("string")),
        ),
        ",",
    )
    return folded.select("doc_id", rendered.alias("tf_list"))


def _q_window_tumbling(spark, sf_dir):
    # T5 capability extension — 5-minute tumbling window over events;
    # batch twin of the Structured Streaming aggregation (SURVEY §2.8).
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).alias("total"),
        )
        .select(
            F.col("w.start").cast("long").alias("win_start"),
            "event_type",
            "n",
            "total",
        )
    )


def _q_running_total(spark, sf_dir):
    # T2 batch-equivalent — keyed running sum (backup/UnionTest.java:92-97)
    ev = load_table(spark, "events", sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 6).alias("running"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q_scan_project": _q_scan_project,
        "q_point_lookup": _q_point_lookup,
        "q_filter_limit": _q_filter_limit,
        "q_paged_scan": _q_paged_scan,
        "q_concat_fields": _q_concat_fields,
        "q_tokenize_explode": _q_tokenize_explode,
        "q_stopword_filter": _q_stopword_filter,
        "q_tf": _q_tf,
        "q_doc_len": _q_doc_len,
        "q_distinct_words": _q_distinct_words,
        "q_df": _q_df,
        "q_idf": _q_idf,
        "q_count_docs": _q_count_docs,
        "q_topk_per_doc": _q_topk_per_doc,
        "q_sort_desc": _q_sort_desc,
        "q_union_merge": _q_union_merge,
        "q_tfidf": _q_tfidf,
        "q_bm25_rank": _q_bm25_rank,
        "q_tf_vector_sink": _q_tf_vector_sink,
        "q_window_tumbling": _q_window_tumbling,
        "q_running_total": _q_running_total,
    }


# --------------------------------------------------------------------------
# oracle_sql() — DuckDB side
# --------------------------------------------------------------------------


def oracle_sql() -> dict[str, str]:
    return {
        "q_scan_project": "SELECT doc_id, n_chars FROM documents",
        "q_point_lookup": (
            "SELECT doc_id, lang, source, n_chars FROM documents WHERE doc_id = 42"
        ),
        "q_filter_limit": (
            "SELECT doc_id, lang, n_chars FROM documents "
            "WHERE lang = 'en' ORDER BY doc_id LIMIT 10"
        ),
        "q_paged_scan": (
            "SELECT doc_id, source FROM documents ORDER BY doc_id LIMIT 50 OFFSET 100"
        ),
        "q_concat_fields": (
            "SELECT doc_id, lang || '|' || source AS meta, "
            "CAST(n_chars * 2 AS BIGINT) AS n_chars_x2 FROM documents"
        ),
        "q_tokenize_explode": f"WITH {_PIPE} SELECT doc_id, word FROM tokens",
        "q_stopword_filter": f"WITH {_PIPE} SELECT doc_id, word FROM filtered",
        "q_tf": f"WITH {_PIPE} SELECT doc_id, word, tf FROM tf",
        "q_doc_len": f"WITH {_PIPE} SELECT doc_id, dl FROM dlen",
        "q_distinct_words": f"WITH {_PIPE} SELECT DISTINCT word FROM filtered",
        "q_df": f"WITH {_PIPE} SELECT word, df FROM dfreq",
        "q_idf": f"WITH {_PIPE} SELECT word, df, round(idf, 6) AS idf FROM idf",
        "q_count_docs": "SELECT count(*) AS n_docs FROM documents",
        "q_topk_per_doc": f"""
            WITH {_PIPE},
            ranked AS (
              SELECT doc_id, word, tf,
                     CAST(row_number() OVER (
                       PARTITION BY doc_id ORDER BY tf DESC, word ASC
                     ) AS INTEGER) AS rk
              FROM tf
            )
            SELECT doc_id, word, tf, rk FROM ranked WHERE rk <= {TOP_K_TERMS}
        """,
        "q_sort_desc": f"""
            WITH {_PIPE}
            SELECT word, CAST(sum(tf) AS BIGINT) AS cnt FROM tf
            GROUP BY word ORDER BY cnt DESC, word ASC
        """,
        "q_union_merge": f"""
            WITH {_PIPE},
            lo AS (
              SELECT word, count(*) AS c FROM filtered WHERE doc_id < 250 GROUP BY word
            ),
            hi AS (
              SELECT word, count(*) AS c FROM filtered WHERE doc_id >= 250 GROUP BY word
            ),
            u AS (SELECT * FROM lo UNION ALL SELECT * FROM hi)
            SELECT word, CAST(sum(c) AS BIGINT) AS cnt FROM u GROUP BY word
        """,
        "q_tfidf": f"""
            WITH {_PIPE}
            SELECT t.doc_id, t.word, round(t.tf * i.idf, 6) AS tfidf
            FROM tf t JOIN idf i ON t.word = i.word
        """,
        "q_bm25_rank": f"""
            WITH {_PIPE},
            avgdl AS (SELECT avg(CAST(dl AS DOUBLE)) AS avgdl FROM dlen),
            scored AS (
              SELECT t.doc_id,
                     round(sum(
                       i.idf * (CAST(t.tf AS DOUBLE) * ({BM25_K1} + 1.0)) /
                       (CAST(t.tf AS DOUBLE) + {BM25_K1} *
                        (1.0 - {BM25_B} + {BM25_B} * CAST(d.dl AS DOUBLE)
                         / (SELECT avgdl FROM avgdl)))
                     ), 6) AS score
              FROM tf t
              JOIN idf i ON t.word = i.word
              JOIN dlen d ON t.doc_id = d.doc_id
              WHERE t.word IN ({_QT})
              GROUP BY t.doc_id
            ),
            ranked AS (
              SELECT doc_id, score,
                     CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC)
                          AS INTEGER) AS rk
              FROM scored
            )
            SELECT doc_id, score, rk FROM ranked WHERE rk <= 10
        """,
        "q_tf_vector_sink": f"""
            WITH {_PIPE},
            ranked AS (
              SELECT doc_id, word, tf,
                     row_number() OVER (
                       PARTITION BY doc_id ORDER BY tf DESC, word ASC
                     ) AS rk
              FROM tf
            )
            SELECT doc_id,
                   string_agg(word || ':' || tf, ',' ORDER BY tf DESC, word ASC)
                     AS tf_list
            FROM ranked WHERE rk <= {TOP_K_TERMS}
            GROUP BY doc_id
        """,
        "q_window_tumbling": """
            SELECT (epoch_us(ts) // 300000000) * 300 AS win_start,
                   event_type,
                   count(*) AS n,
                   round(sum(value), 6) AS total
            FROM events
            GROUP BY 1, 2
        """,
        "q_running_total": """
            SELECT event_id, user_id,
                   round(sum(value) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ), 6) AS running
            FROM events
        """,
    }
