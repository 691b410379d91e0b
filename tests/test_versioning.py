"""Snapshot pins + time-travel reads on the versioned-manifest indexes
(r9): a pinned superseded tree is an immutable snapshot — readable via
``version=`` on every read entry point, exempt from GC until unpinned,
never clobbered by later folds — on BOTH retrieval tiers.  The
operational story: reproducible evals against a frozen corpus state
while CDC maintenance keeps rolling the current tree forward."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flink_bm25_spark.config import DEFAULT_QUERY_TERMS
from flink_bm25_spark.operators.serving import (
    bm25_index_add,
    bm25_index_compact,
    bm25_index_delete,
    bm25_index_gc,
    bm25_index_pin,
    bm25_index_save,
    bm25_index_save_forward,
    bm25_index_snapshot,
    bm25_index_unpin,
    bm25_index_upsert,
    bm25_index_versions,
    bm25_topk_from_index,
    doc_vector_from_index,
)
from flink_bm25_spark.operators.similarity import (
    ivf_build,
    ivf_delete,
    ivf_pin,
    ivf_retrain,
    ivf_save,
    ivf_snapshot,
    ivf_stats,
    ivf_topk_from_disk,
    ivf_unpin,
    ivf_upsert,
    ivf_versions,
)
from flink_bm25_spark.sources.tables import load_documents, load_embeddings
from tests.conftest import SF_DIR

TERMS = DEFAULT_QUERY_TERMS


def _topk(spark, path, version=None, k=10):
    return [
        tuple(r)
        for r in bm25_topk_from_index(
            spark, path, TERMS, k=k, version=version
        ).collect()
    ]


def _build(spark, tmp_path, name="idx"):
    path = str(tmp_path / name)
    docs = load_documents(spark, SF_DIR).limit(60)
    bm25_index_save(docs, path, n_buckets=8)
    bm25_index_save_forward(docs, path)
    return path, docs


def test_snapshot_read_is_frozen_across_mutations(spark, tmp_path):
    path, docs = _build(spark, tmp_path)
    before = _topk(spark, path)
    top_doc = before[0][0]

    v = bm25_index_snapshot(spark, path)
    # mutate the CURRENT tree: delete the snapshot's top doc
    bm25_index_delete(spark, path, [top_doc])

    now = _topk(spark, path)
    assert all(r[0] != top_doc for r in now)
    # the pinned snapshot still serves the pre-mutation answer, exactly
    assert _topk(spark, path, version=v) == before
    # point lookup time-travels too
    assert (
        doc_vector_from_index(spark, path, top_doc, version=v).count() == 1
    )
    assert doc_vector_from_index(spark, path, top_doc).count() == 0


def test_pin_survives_folds_and_gc_until_unpinned(spark, tmp_path):
    path, docs = _build(spark, tmp_path)
    before = _topk(spark, path)
    v = bm25_index_snapshot(spark, path, gc_grace_seconds=0.0)

    # hostile follow-up maintenance: more mutations, zero-grace folds,
    # explicit GC — the pinned tree must ride through all of it
    extra = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    ).limit(5)
    bm25_index_add(extra, path)
    bm25_index_compact(spark, path, gc_grace_seconds=0.0)
    bm25_index_compact(spark, path, gc_grace_seconds=0.0)
    assert bm25_index_gc(spark, path, grace_seconds=0.0) >= 0
    assert _topk(spark, path, version=v) == before

    rows = {
        r["version"]: r for r in bm25_index_versions(spark, path).collect()
    }
    assert rows[v]["pinned"] and rows[v]["readable"] and not rows[v]["current"]
    assert sum(1 for r in rows.values() if r["current"]) == 1

    # release the pin: the next zero-grace GC reclaims the tree
    bm25_index_unpin(spark, path, v)
    bm25_index_gc(spark, path, grace_seconds=0.0)
    with pytest.raises(Exception, match="not readable|superseded|Path does not exist"):
        _topk(spark, path, version=v)


def test_unpinned_superseded_version_errors_clearly(spark, tmp_path):
    path, _ = _build(spark, tmp_path)
    # three zero-grace folds: v1 is created, superseded, then reclaimed
    bm25_index_compact(spark, path, gc_grace_seconds=0.0)
    bm25_index_compact(spark, path, gc_grace_seconds=0.0)
    bm25_index_compact(spark, path, gc_grace_seconds=0.0)
    with pytest.raises(FileNotFoundError, match="pinned"):
        bm25_topk_from_index(spark, path, TERMS, version=1)


def test_fold_never_reuses_a_pinned_version_number(spark, tmp_path):
    """A *_save reset drops the manifest to bare v0 while pinned trees
    survive; later folds must count PAST the pinned version, not
    clobber it."""
    path, docs = _build(spark, tmp_path)
    before = _topk(spark, path)
    v = bm25_index_snapshot(spark, path)  # pinned v1, current v2
    assert v == 1

    bm25_index_save(docs, path, n_buckets=8)  # reset: current back to v0
    bm25_index_save_forward(docs, path)
    assert _topk(spark, path, version=v) == before

    # the next fold would be v1 by naive counting — must skip to v2+
    bm25_index_compact(spark, path, gc_grace_seconds=0.0)
    assert _topk(spark, path, version=v) == before
    rows = {
        r["version"]: r for r in bm25_index_versions(spark, path).collect()
    }
    assert rows[v]["pinned"] and rows[v]["readable"]
    cur = [r["version"] for r in rows.values() if r["current"]]
    assert cur and cur[0] != v


def test_batch_and_stats_reads_take_version(spark, tmp_path):
    from flink_bm25_spark.operators.serving import (
        bm25_batch_topk_from_index,
        bm25_index_stats,
    )

    path, _ = _build(spark, tmp_path)
    qrel = [(1, list(TERMS))]
    before = [
        tuple(r)
        for r in bm25_batch_topk_from_index(spark, path, qrel).collect()
    ]
    n_before = bm25_index_stats(spark, path).agg(
        F.sum("n_postings")
    ).first()[0]
    v = bm25_index_snapshot(spark, path)
    bm25_index_delete(spark, path, [before[0][1]])
    assert [
        tuple(r)
        for r in bm25_batch_topk_from_index(
            spark, path, qrel, version=v
        ).collect()
    ] == before
    assert (
        bm25_index_stats(spark, path, version=v)
        .agg(F.sum("n_postings"))
        .first()[0]
        == n_before
    )


def test_ivf_snapshot_survives_churn_and_retrain(spark, tmp_path):
    path = str(tmp_path / "ivf")
    emb = load_embeddings(spark, SF_DIR).select("vec_id", "embedding")
    model, assigned = ivf_build(emb, n_cells=4, seed=7)
    ivf_save(model, assigned, path)
    qv = [float(x) for x in emb.first()["embedding"]]
    before = [
        tuple(r)
        for r in ivf_topk_from_disk(spark, path, qv, k=5, nprobe=4).collect()
    ]

    v = ivf_snapshot(spark, path, gc_grace_seconds=0.0)

    # churn the CURRENT tree: re-embed (reverse dims) + delete the top hit
    churned = emb.select(
        "vec_id", F.reverse("embedding").alias("embedding")
    )
    ivf_upsert(spark, path, churned)
    ivf_delete(spark, path, [int(before[0][0])])
    # retrain rebuilds to bare v0 with a NEW codebook at the root
    ivf_retrain(spark, path, seed=11)

    after = [
        tuple(r)
        for r in ivf_topk_from_disk(
            spark, path, qv, k=5, nprobe=4, version=v
        ).collect()
    ]
    assert after == before  # stashed codebook + frozen cells
    assert ivf_stats(spark, path, version=v).first()["n_tombstoned"] == 0

    rows = {r["version"]: r for r in ivf_versions(spark, path).collect()}
    assert rows[v]["pinned"] and rows[v]["readable"]

    ivf_unpin(spark, path, v)
    from flink_bm25_spark.operators.similarity import ivf_gc

    ivf_gc(spark, path, grace_seconds=0.0)
    with pytest.raises(Exception, match="not readable|Path does not exist"):
        ivf_topk_from_disk(spark, path, qv, k=5, nprobe=4, version=v)


def test_ivf_pin_is_idempotent_and_listed(spark, tmp_path):
    path = str(tmp_path / "ivf")
    emb = load_embeddings(spark, SF_DIR).select("vec_id", "embedding")
    model, assigned = ivf_build(emb, n_cells=4, seed=7)
    ivf_save(model, assigned, path)
    v1 = ivf_pin(spark, path)
    v2 = ivf_pin(spark, path)
    assert v1 == v2 == 0
    rows = {r["version"]: r for r in ivf_versions(spark, path).collect()}
    assert rows[0]["pinned"] and rows[0]["current"] and rows[0]["readable"]
    ivf_unpin(spark, path, v1)
    assert not ivf_versions(spark, path).first()["pinned"]


def test_pin_current_does_not_freeze_until_fold(spark, tmp_path):
    """Documented semantics: a pin on the CURRENT tree guarantees
    survival, not immutability — mutations keep landing until the next
    fold supersedes it (which is why snapshot = pin + fold)."""
    path, _ = _build(spark, tmp_path)
    before = _topk(spark, path)
    v = bm25_index_pin(spark, path)
    top_doc = before[0][0]
    bm25_index_delete(spark, path, [top_doc])
    # same tree — the pinned read sees the mutation
    assert all(r[0] != top_doc for r in _topk(spark, path, version=v))
    bm25_index_unpin(spark, path, v)


def test_snapshot_warm_serves_through_maintenance(spark, tmp_path):
    """warm(version=N) — the reproducible-eval throughput mode: the
    frozen tree pins into the warm cache, searches skip the staleness
    guard (a superseded pinned tree is immutable), and concurrent
    mutations + folds on HEAD change nothing."""
    from flink_bm25_spark.api import Bm25Index

    path, docs = _build(spark, tmp_path)
    idx = Bm25Index(spark, path)
    want = _topk(spark, path)
    v = bm25_index_snapshot(spark, path)

    idx.warm(version=v)
    assert idx._warm is not None and idx._warm["immutable"]
    got0 = [tuple(r) for r in idx.search("spark stream join", k=10).collect()]
    frozen = [
        tuple(r)
        for r in idx.search("spark stream join", k=10, version=v).collect()
    ]
    assert frozen == [
        tuple(r)
        for r in bm25_topk_from_index(
            spark, path, ("spark", "stream", "join"), k=10, version=v
        ).collect()
    ]

    # hostile maintenance on HEAD: delete the frozen top doc + fold
    bm25_index_delete(spark, path, [want[0][0]])
    bm25_index_compact(spark, path, gc_grace_seconds=0.0)

    # the snapshot warm survives: same answer, warm state NOT cooled
    assert [
        tuple(r)
        for r in idx.search("spark stream join", k=10, version=v).collect()
    ] == frozen
    assert idx._warm is not None

    # un-versioned search does NOT ride the snapshot warm: it takes the
    # cold current path and sees the delete
    now = [tuple(r) for r in idx.search("spark stream join", k=10).collect()]
    assert all(r[0] != want[0][0] for r in now)
    assert got0 is not None
    idx.cool()


def test_ivf_repin_after_retrain_keeps_original_codebook(spark, tmp_path):
    """The stash is write-once: re-pinning an already-pinned version
    after a retrain must NOT replace the stashed codebook (its meaning
    is 'the codebook that assigned this tree's cells', fixed at first
    pin)."""
    path = str(tmp_path / "ivf")
    emb = load_embeddings(spark, SF_DIR).select("vec_id", "embedding")
    model, assigned = ivf_build(emb, n_cells=4, seed=7)
    ivf_save(model, assigned, path)
    qv = [float(x) for x in emb.first()["embedding"]]

    v = ivf_snapshot(spark, path)
    before = [
        tuple(r)
        for r in ivf_topk_from_disk(
            spark, path, qv, k=5, nprobe=2, version=v
        ).collect()
    ]
    ivf_retrain(spark, path, seed=99)  # new codebook at the root
    assert ivf_pin(spark, path, version=v) == v  # idempotent re-pin
    after = [
        tuple(r)
        for r in ivf_topk_from_disk(
            spark, path, qv, k=5, nprobe=2, version=v
        ).collect()
    ]
    assert after == before
