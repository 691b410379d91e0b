"""Source breadth (text lines, live socket) and the SQL-view surface."""

from __future__ import annotations

import socket
import tempfile
import threading
import time

from flink_bm25_spark.sources.tables import (
    load_text,
    register_corpus_views,
)
from flink_bm25_spark.streaming.wordcount import running_word_count, socket_lines
from tests.conftest import SF_DIR


def test_text_source(spark):
    with tempfile.TemporaryDirectory() as d:
        p = f"{d}/lines.txt"
        with open(p, "w") as f:
            f.write("spark join stream\nspark window\n")
        df = load_text(spark, p)
        assert df.columns == ["value"]
        assert df.count() == 2


def test_csv_roundtrip(spark):
    from flink_bm25_spark.sources.tables import load_csv, load_table

    docs = load_table(spark, "documents", SF_DIR).select(
        "doc_id", "lang", "n_chars"
    )
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/docs_csv"
        docs.write.option("header", "true").mode("overwrite").csv(path)
        back = load_csv(spark, path, schema="doc_id long, lang string, n_chars long")
        assert back.count() == docs.count()
        assert sorted(tuple(r) for r in back.collect()) == sorted(
            tuple(r) for r in docs.collect()
        )


def test_json_roundtrip(spark):
    from flink_bm25_spark.sources.tables import load_json, load_table

    docs = load_table(spark, "documents", SF_DIR).select(
        "doc_id", "lang", "n_chars"
    )
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/docs_json"
        docs.write.mode("overwrite").json(path)
        back = load_json(spark, path, schema="doc_id long, lang string, n_chars long")
        assert back.count() == docs.count()
        assert sorted(tuple(r) for r in back.collect()) == sorted(
            tuple(r) for r in docs.collect()
        )


def test_orc_roundtrip(spark):
    from flink_bm25_spark.sources.tables import load_orc, load_table

    docs = load_table(spark, "documents", SF_DIR).select(
        "doc_id", "lang", "n_chars"
    )
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/docs_orc"
        docs.write.mode("overwrite").orc(path)
        back = load_orc(spark, path)
        assert back.count() == docs.count()
        assert sorted(tuple(r) for r in back.collect()) == sorted(
            tuple(r) for r in docs.collect()
        )


def test_sql_surface_bm25_in_pure_sql(spark):
    register_corpus_views(spark, SF_DIR)
    # the whole BM25 statistics pipeline, driven from SQL alone
    out = spark.sql(
        """
        SELECT t.doc_id,
               round(sum(i.idf * t.tf * 2.2 /
                     (t.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl /
                      (SELECT avg(dl) FROM dlen)))), 6) AS score
        FROM tf t JOIN idf i ON t.word = i.word JOIN dlen d ON t.doc_id = d.doc_id
        WHERE t.word IN ('spark', 'stream', 'join')
        GROUP BY t.doc_id ORDER BY score DESC, doc_id LIMIT 5
        """
    ).collect()
    assert len(out) == 5
    assert out[0].score >= out[-1].score


def test_live_socket_wordcount(spark):
    """T1 end-to-end: a real TCP socket feeding the streaming word count."""
    lines = ["spark join stream", "spark spark window", "join the a"]
    server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind(("127.0.0.1", 0))
    port = server.getsockname()[1]
    server.listen(1)
    stop = threading.Event()

    def serve():
        conn, _ = server.accept()
        with conn:
            conn.sendall(("\n".join(lines) + "\n").encode())
            stop.wait(20)  # keep the connection open while Spark reads

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    counts = running_word_count(socket_lines(spark, "127.0.0.1", port))
    q = (
        counts.writeStream.outputMode("complete")
        .format("memory")
        .queryName("t_socket_wc")
        .start()
    )
    try:
        deadline = time.time() + 30
        got = {}
        while time.time() < deadline:
            got = {
                r.word: r.cnt
                for r in spark.sql("SELECT * FROM t_socket_wc").collect()
            }
            if got.get("spark") == 3 and got.get("join") == 2:
                break
            time.sleep(0.5)
        assert got.get("spark") == 3, got
        assert got.get("join") == 2, got
        assert got.get("window") == 1, got
        assert "the" not in got and "a" not in got  # stopwords dropped
    finally:
        stop.set()
        q.stop()
        server.close()


def test_curation_views_sql_surface(spark):
    from flink_bm25_spark.sources.tables import register_curation_views
    from tests.conftest import SF_DIR

    register_curation_views(spark, SF_DIR)
    low_q = spark.sql(
        "SELECT count(*) AS n FROM quality WHERE keep_score < 0.2"
    ).collect()[0]["n"]
    assert low_q >= 0
    worst = spark.sql(
        "SELECT doc_id FROM lm_scores ORDER BY nll DESC, doc_id LIMIT 5"
    ).collect()
    assert len(worst) == 5
    joined = spark.sql(
        """SELECT q.doc_id FROM quality q JOIN token_stats t USING (doc_id)
           WHERE q.keep_score >= 0.2 AND t.n_tokens >= 50 LIMIT 3"""
    ).collect()
    assert len(joined) == 3
    n_chunks = spark.sql("SELECT count(*) AS n FROM chunks").collect()[0]["n"]
    assert n_chunks >= spark.sql("SELECT count(*) FROM documents").collect()[0][0]


def test_json_quarantine_splits_good_and_bad(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from flink_bm25_spark.sources.tables import load_json_quarantine

    p = tmp_path / "feed.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok one"}\n'
        "this is not json at all\n"
        '{"doc_id": 2, "text": "ok two"}\n'
        '{"doc_id": "NaN-ish", "text": 3}\n'  # type mismatch -> quarantine
    )
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    good, bad = load_json_quarantine(spark, str(p), schema)
    assert {r.doc_id for r in good.collect()} == {1, 2}
    raws = [r.raw for r in bad.collect()]
    assert len(raws) == 2
    assert any("not json" in r for r in raws)
    # every input line is accounted for in exactly one lane
    assert good.count() + bad.count() == 4


def test_json_quarantine_does_not_mutate_caller_schema(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from flink_bm25_spark.sources.tables import load_json_quarantine

    p = tmp_path / "feed.jsonl"
    p.write_text('{"doc_id": 1, "text": "ok"}\nnot json\n')
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    load_json_quarantine(spark, str(p), schema)
    assert len(schema.fields) == 2 and schema.names == ["doc_id", "text"]
    # a second call with the SAME schema object must behave identically
    good, bad = load_json_quarantine(spark, str(p), schema)
    assert good.columns == ["doc_id", "text"] and bad.count() == 1
