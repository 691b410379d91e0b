"""BM25 serving index: partition-pruned disk layout + mergeable
statistics partials must answer exactly like the batch `bm25_rank`."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from flink_bm25_spark.config import DEFAULT_QUERY_TERMS
from flink_bm25_spark.functions.hashing import h60
from flink_bm25_spark.operators.bm25 import bm25_rank
from flink_bm25_spark.operators.pipeline import build_corpus_stats
from flink_bm25_spark.operators.serving import (
    bm25_index_add,
    bm25_index_batch,
    bm25_index_save,
    bm25_topk_from_index,
    bm25_topk_from_partials,
    merge_index_batches,
    query_buckets,
)
from flink_bm25_spark.sources.tables import load_documents
from tests.conftest import SF_DIR


def _sec(spark, path, name):
    """Layout-resolved section path (bare before the first compaction,
    the current v<N>/ tree after — mirrors the engine's _Layout)."""
    from flink_bm25_spark.operators.serving import _Layout

    return _Layout(spark, path).sec(name)

TERMS = DEFAULT_QUERY_TERMS


def _want(spark):
    docs = load_documents(spark, SF_DIR)
    s = build_corpus_stats(docs)
    return [
        tuple(r)
        for r in bm25_rank(s.tf, s.idf_stats, s.dlen, TERMS, k=10).collect()
    ]


def test_partials_equal_bm25_rank(spark):
    # One batch over the full corpus: the serving fold IS the batch math.
    docs = load_documents(spark, SF_DIR)
    got = bm25_topk_from_partials(bm25_index_batch(docs), TERMS, k=10)
    assert [tuple(r) for r in got.collect()] == _want(spark)


def test_two_batch_fold_equals_full(spark):
    # Split corpus -> per-batch partials -> fold == full rebuild: the
    # merge law the append-only layout relies on.
    docs = load_documents(spark, SF_DIR)
    merged = merge_index_batches(
        [
            bm25_index_batch(docs.where(F.col("doc_id") < 250)),
            bm25_index_batch(docs.where(F.col("doc_id") >= 250)),
        ]
    )
    got = bm25_topk_from_partials(merged, TERMS, k=10)
    assert [tuple(r) for r in got.collect()] == _want(spark)


def test_index_disk_roundtrip_and_pruning(spark, tmp_path):
    docs = load_documents(spark, SF_DIR)
    path = str(tmp_path / "bm25idx")
    bm25_index_save(docs, path, n_buckets=16)
    served = bm25_topk_from_index(spark, path, TERMS, k=10)
    assert [tuple(r) for r in served.collect()] == _want(spark)

    # the bucket predicate reaches the postings scan as PARTITION pruning
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters")[1][:160]
    assert "bucket" in seg

    # and the files actually opened are only the query terms' buckets
    expected = set(query_buckets(TERMS, 16))
    opened = (
        spark.read.parquet(_sec(spark, path, "postings"))
        .where(
            F.col("bucket").isin(sorted(expected))
            & F.col("word").isin(*TERMS)
        )
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    )
    got_buckets = {
        int(r["f"].split("bucket=")[1].split("/")[0]) for r in opened
    }
    assert got_buckets <= expected and got_buckets


def test_index_add_equals_full_rebuild(spark, tmp_path):
    docs = load_documents(spark, SF_DIR)
    half = str(tmp_path / "half")
    full = str(tmp_path / "full")
    bm25_index_save(docs.where(F.col("doc_id") < 250), half, n_buckets=16)
    bm25_index_add(docs.where(F.col("doc_id") >= 250), half)
    bm25_index_save(docs, full, n_buckets=16)
    got = [tuple(r) for r in bm25_topk_from_index(spark, half, TERMS).collect()]
    want = [tuple(r) for r in bm25_topk_from_index(spark, full, TERMS).collect()]
    assert got == want == _want(spark)


def test_unknown_term_contributes_nothing(spark):
    docs = load_documents(spark, SF_DIR)
    idx = bm25_index_batch(docs)
    with_junk = bm25_topk_from_partials(
        idx, (*TERMS, "zzz_not_in_vocab"), k=10
    )
    assert [tuple(r) for r in with_junk.collect()] == _want(spark)


def test_query_buckets_match_plan_side_hash(spark):
    # Driver-side hashlib bucketing == the in-plan h60 bucketing, term
    # by term — the contract partition pruning correctness rests on.
    words = ["spark", "stream", "join", "the", "zzz", "日本語", ""]
    nb = 16
    df = spark.createDataFrame([(w,) for w in words], "word string").select(
        "word", F.pmod(h60(F.col("word")), F.lit(nb)).cast("int").alias("b")
    )
    plan_side = {r["word"]: r["b"] for r in df.collect()}
    for w in words:
        h = int(hashlib.md5(w.encode("utf-8")).hexdigest()[:15], 16)
        assert plan_side[w] == h % nb, w


def test_add_redelivery_same_batch_id_is_noop(spark, tmp_path):
    # An explicit batch_id makes the add idempotent: redelivery replaces
    # its own partitions (dynamic overwrite), never double-counts.
    docs = load_documents(spark, SF_DIR)
    path = str(tmp_path / "idx")
    bm25_index_save(docs.where(F.col("doc_id") < 250), path, n_buckets=16)
    hi = docs.where(F.col("doc_id") >= 250)
    bm25_index_add(hi, path, batch_id=7)
    once = [tuple(r) for r in bm25_topk_from_index(spark, path, TERMS).collect()]
    bm25_index_add(hi, path, batch_id=7)  # at-least-once redelivery
    twice = [tuple(r) for r in bm25_topk_from_index(spark, path, TERMS).collect()]
    assert once == twice == _want(spark)


def test_streaming_maintenance_equals_batch(spark, tmp_path):
    # Micro-batched adds through the foreachBatch loop: the served
    # ranking after the stream drains equals the batch pipeline over the
    # whole corpus, and a restart on the same checkpoint re-adds nothing.
    from flink_bm25_spark.streaming.index_maintenance import (
        maintain_index_stream,
    )

    docs = load_documents(spark, SF_DIR)
    path = str(tmp_path / "idx")
    bm25_index_save(docs.where(F.col("doc_id") < 250), path, n_buckets=16)

    src = str(tmp_path / "src")
    cols = docs.columns
    docs.where((F.col("doc_id") >= 250) & (F.col("doc_id") < 375)).select(
        *cols
    ).coalesce(1).write.parquet(src)
    docs.where(F.col("doc_id") >= 375).select(*cols).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    def run():
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        maintain_index_stream(stream, path, str(tmp_path / "ckpt"))

    run()
    got = [tuple(r) for r in bm25_topk_from_index(spark, path, TERMS).collect()]
    assert got == _want(spark)
    run()  # restart, same checkpoint: nothing new to deliver
    again = [
        tuple(r) for r in bm25_topk_from_index(spark, path, TERMS).collect()
    ]
    assert again == got


def test_add_rejects_nothing_but_matches_bucket_count(spark, tmp_path):
    # n_buckets is read back from the stats partials so an add can never
    # bucket the batch inconsistently with the archive.
    docs = load_documents(spark, SF_DIR)
    path = str(tmp_path / "idx")
    bm25_index_save(docs.where(F.col("doc_id") < 100), path, n_buckets=8)
    bm25_index_add(docs.where(F.col("doc_id") >= 100), path)
    buckets = (
        spark.read.parquet(_sec(spark, path, "postings"))
        .select("bucket")
        .distinct()
        .collect()
    )
    assert {r["bucket"] for r in buckets} <= set(range(8))


def test_prf_expands_and_stays_deterministic(spark):
    # RM3 feedback: the expanded query must (a) keep exactly k rows,
    # (b) never mine an original term, (c) reproduce itself run-to-run.
    from flink_bm25_spark.operators.bm25 import bm25_rank, bm25_rank_prf
    from flink_bm25_spark.operators.pipeline import build_corpus_stats

    docs = load_documents(spark, SF_DIR)
    s = build_corpus_stats(docs)
    out1 = [
        tuple(r)
        for r in bm25_rank_prf(
            s.tf, s.idf_stats, s.dlen, TERMS, k=10, fb_docs=5, fb_terms=5
        ).collect()
    ]
    out2 = [
        tuple(r)
        for r in bm25_rank_prf(
            s.tf, s.idf_stats, s.dlen, TERMS, k=10, fb_docs=5, fb_terms=5
        ).collect()
    ]
    assert out1 == out2 and len(out1) == 10

    # orig_weight=1.0 with no expansion mass still ranks like plain BM25
    # scaled by the weight — the interpolation degenerates correctly.
    plain = {
        r["doc_id"]: r["score"]
        for r in bm25_rank(s.tf, s.idf_stats, s.dlen, TERMS, k=10).collect()
    }
    full_orig = {
        r["doc_id"]: r["score"]
        for r in bm25_rank_prf(
            s.tf, s.idf_stats, s.dlen, TERMS, k=10, fb_terms=0,
            orig_weight=1.0,
        ).collect()
    }
    assert set(full_orig) == set(plain)
    for d, sc in full_orig.items():
        assert abs(sc - plain[d]) < 1e-5, (d, sc, plain[d])


def test_index_compaction_preserves_scores_and_folds_state(spark, tmp_path):
    # Compaction folds many batch partitions into batch 0: served
    # ranking unchanged, stats collapse to one row, df to one row/word.
    from flink_bm25_spark.operators.serving import bm25_index_compact

    docs = load_documents(spark, SF_DIR)
    path = str(tmp_path / "idx")
    bm25_index_save(docs.where(F.col("doc_id") < 200), path, n_buckets=16)
    bm25_index_add(
        docs.where((F.col("doc_id") >= 200) & (F.col("doc_id") < 350)), path
    )
    bm25_index_add(docs.where(F.col("doc_id") >= 350), path)
    before = [
        tuple(r) for r in bm25_topk_from_index(spark, path, TERMS).collect()
    ]
    bm25_index_compact(spark, path)
    after = [
        tuple(r) for r in bm25_topk_from_index(spark, path, TERMS).collect()
    ]
    assert after == before == _want(spark)
    stats = spark.read.parquet(_sec(spark, path, "stats")).collect()
    assert len(stats) == 1
    dup_words = (
        spark.read.parquet(_sec(spark, path, "df"))
        .groupBy("word")
        .count()
        .where(F.col("count") > 1)
        .count()
    )
    assert dup_words == 0
    # still addable + queryable after compaction
    assert [
        tuple(r) for r in bm25_topk_from_index(spark, path, TERMS).collect()
    ] == before


def test_batch_serving_equals_single_queries(spark, tmp_path):
    # The served batch-retrieval primitive: per-query results equal the
    # single-query serve path, computed in ONE plan for all queries.
    from flink_bm25_spark.operators.serving import bm25_batch_topk_from_index

    docs = load_documents(spark, SF_DIR)
    path = str(tmp_path / "idx")
    bm25_index_save(docs, path, n_buckets=16)
    batch_queries = [
        (1, ("spark", "stream", "join")),
        (2, ("fast", "hash", "merge")),
    ]
    got = bm25_batch_topk_from_index(spark, path, batch_queries, k=5)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["score"], r["rk"])
        )
    for qid, terms in batch_queries:
        solo = [
            (r["doc_id"], r["score"], r["rk"])
            for r in bm25_topk_from_index(spark, path, terms, k=5).collect()
        ]
        assert sorted(by_q[qid], key=lambda x: x[2]) == solo, qid


def test_index_stats_profile(spark, tmp_path):
    from flink_bm25_spark.operators.serving import bm25_index_stats

    docs = load_documents(spark, SF_DIR)
    path = str(tmp_path / "idx")
    bm25_index_save(docs.where(F.col("doc_id") < 250), path, n_buckets=8)
    bm25_index_add(docs.where(F.col("doc_id") >= 250), path)
    prof = bm25_index_stats(spark, path).collect()
    assert {r["bucket"] for r in prof} <= set(range(8))
    assert all(r["n_batches"] == 2 for r in prof)  # both batches hit all 8
    # postings across buckets account for the whole (doc, word) relation
    total = sum(r["n_postings"] for r in prof)
    tf_rows = build_corpus_stats(docs).tf.count()
    assert total == tf_rows


def test_empty_batch_add_is_harmless(spark, tmp_path):
    # An empty micro-batch contributes zero-valued partials; the fold
    # skips them and served scores are unchanged.
    docs = load_documents(spark, SF_DIR)
    path = str(tmp_path / "idx")
    bm25_index_save(docs, path, n_buckets=16)
    before = [
        tuple(r) for r in bm25_topk_from_index(spark, path, TERMS).collect()
    ]
    bm25_index_add(docs.where(F.lit(False)), path)
    after = [
        tuple(r) for r in bm25_topk_from_index(spark, path, TERMS).collect()
    ]
    assert after == before == _want(spark)


def test_bm25index_facade_loop(spark, tmp_path):
    # create -> add -> free-text search == BM25Engine.search; compact
    # keeps answers; stats stays consistent.
    from flink_bm25_spark.api import BM25Engine, Bm25Index

    docs = load_documents(spark, SF_DIR)
    path = str(tmp_path / "idx")
    idx = Bm25Index.create(docs.where(F.col("doc_id") < 250), path, n_buckets=16)
    idx.add(docs.where(F.col("doc_id") >= 250))
    want = [
        tuple(r)
        for r in BM25Engine.fit(docs).search("spark stream join", k=10).collect()
    ]
    got = [tuple(r) for r in idx.search("spark stream join", k=10).collect()]
    assert got == want
    idx.compact()
    assert [tuple(r) for r in idx.search("spark stream join", k=10).collect()] == want
    assert idx.stats().count() > 0


def test_served_hybrid_rrf(spark, tmp_path):
    # End-to-end hybrid retrieval with BOTH sides served from persisted
    # indexes: BM25 from the bucket-partitioned postings, dense from the
    # cell-partitioned IVF — fused by RRF with no corpus rescan and no
    # statistics rebuild anywhere on the query path.
    from flink_bm25_spark.operators.retrieval import rrf_fuse
    from flink_bm25_spark.operators.similarity import (
        ivf_build,
        ivf_save,
        ivf_topk_from_disk,
    )
    from flink_bm25_spark.sources.tables import load_embeddings

    docs = load_documents(spark, SF_DIR)
    idx = str(tmp_path / "bm25")
    bm25_index_save(docs, idx, n_buckets=16)
    lexical = bm25_topk_from_index(spark, idx, TERMS, k=10)

    emb = load_embeddings(spark, SF_DIR).select(
        F.col("vec_id").alias("doc_id").cast("long").alias("doc_id"),
        "embedding",
    )
    model, assigned = ivf_build(
        emb.select(F.col("doc_id").alias("vec_id"), "embedding"), n_cells=4
    )
    ivf_path = str(tmp_path / "ivf")
    ivf_save(model, assigned, ivf_path)
    from pyspark.sql import Window

    qvec = [float(x) for x in emb.orderBy("doc_id").first()["embedding"]]
    dense = (
        ivf_topk_from_disk(spark, ivf_path, qvec, k=10, nprobe=2)
        .withColumn(
            "rk",
            F.row_number()
            .over(Window.orderBy(F.desc("cos"), F.asc("vec_id")))
            .cast("int"),
        )
        .select(F.col("vec_id").alias("doc_id"), "rk")
    )

    fused = rrf_fuse([lexical.select("doc_id", "rk"), dense], k=10)
    rows = fused.collect()
    assert rows and fused.columns == ["doc_id", "rrf", "n_systems", "rk"]
    assert all(1 <= r["n_systems"] <= 2 for r in rows)
    assert any(r["n_systems"] >= 1 for r in rows) and len(rows) <= 10


def test_forward_point_lookup_matches_tf_vectors(spark, tmp_path):
    # The forward section is the reference's tf5 store shape: a point
    # lookup returns exactly the doc's (word, tf) vector, partition-
    # pruned to its fbucket directory.
    from flink_bm25_spark.operators.serving import (
        bm25_index_save_forward,
        doc_vector_from_index,
    )

    docs = load_documents(spark, SF_DIR)
    path = str(tmp_path / "idx")
    bm25_index_save(docs, path, n_buckets=16)
    bm25_index_save_forward(docs, path)

    row = doc_vector_from_index(spark, path, 7).collect()
    assert len(row) == 1 and row[0]["doc_id"] == 7
    got = {(t["word"], t["tf"]) for t in row[0]["terms"]}
    s = build_corpus_stats(docs)
    want = {
        (r["word"], r["tf"])
        for r in s.tf.where(F.col("doc_id") == 7).collect()
    }
    assert got == want and row[0]["dl"] == sum(t for _, t in want)

    plan = (
        doc_vector_from_index(spark, path, 7)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan
    assert "fbucket" in plan.split("PartitionFilters")[1][:160]


def test_served_mlt_bounded_reads_and_sane_ranking(spark, tmp_path):
    # Served more-like-this: reads = one forward bucket + the source
    # terms' postings buckets; the dot-product ranking must surface the
    # corpus doc whose vector IS the source's (a near-duplicate) first.
    from flink_bm25_spark.operators.serving import (
        bm25_index_save_forward,
        more_like_this_from_index,
    )

    docs = load_documents(spark, SF_DIR)
    # plant an exact near-duplicate of doc 3 with a new id
    twin = docs.where(F.col("doc_id") == 3).select(
        (F.col("doc_id") + 900000).alias("doc_id"),
        *[c for c in docs.columns if c != "doc_id"],
    )
    corpus = docs.unionByName(twin.select(*docs.columns))
    path = str(tmp_path / "idx")
    bm25_index_save(corpus, path, n_buckets=16)
    bm25_index_save_forward(corpus, path)

    out = more_like_this_from_index(spark, path, 3, k=5).collect()
    assert out and out[0]["doc_id"] == 900003
    assert [r["rk"] for r in out] == list(range(1, len(out) + 1))


def test_multi_get_and_mlt_term_cap(spark, tmp_path):
    from flink_bm25_spark.operators.serving import (
        bm25_index_save_forward,
        doc_vectors_from_index,
        more_like_this_from_index,
    )

    docs = load_documents(spark, SF_DIR)
    path = str(tmp_path / "idx")
    bm25_index_save(docs, path, n_buckets=16)
    bm25_index_save_forward(docs, path)

    got = doc_vectors_from_index(spark, path, [3, 7, 100]).collect()
    assert {r["doc_id"] for r in got} == {3, 7, 100}
    assert doc_vectors_from_index(spark, path, []).count() == 0

    # the term cap keeps the query bounded and leaves ranking sane
    capped = more_like_this_from_index(spark, path, 3, k=5, max_terms=8)
    rows = capped.collect()
    assert len(rows) == 5 and [r["rk"] for r in rows] == [1, 2, 3, 4, 5]


def test_forward_section_stays_in_lockstep_with_adds(spark, tmp_path):
    # Once the forward section exists, adds and compaction maintain it
    # automatically: point lookups see new-batch docs, and compaction
    # folds forward partitions without losing any vector.
    from flink_bm25_spark.operators.serving import (
        bm25_index_compact,
        bm25_index_save_forward,
        doc_vector_from_index,
    )

    docs = load_documents(spark, SF_DIR)
    path = str(tmp_path / "idx")
    lo = docs.where(F.col("doc_id") < 250)
    bm25_index_save(lo, path, n_buckets=16)
    bm25_index_save_forward(lo, path)
    bm25_index_add(docs.where(F.col("doc_id") >= 250), path)

    row = doc_vector_from_index(spark, path, 400).collect()  # new-batch doc
    assert len(row) == 1 and row[0]["terms"]

    bm25_index_compact(spark, path)
    again = doc_vector_from_index(spark, path, 400).collect()
    assert len(again) == 1 and again[0]["terms"] == row[0]["terms"]
    n_fwd = spark.read.parquet(_sec(spark, path, "forward")).count()
    assert n_fwd == docs.count()  # every doc exactly once after the fold
