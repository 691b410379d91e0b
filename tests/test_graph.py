"""Connected components / dedup clustering (operators/graph.py)."""

import pytest
from pyspark.sql import functions as F

from flink_bm25_spark.operators.graph import connected_components, dedup_clusters


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "d1 long, d2 long")
    return {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }


def test_two_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (5, 6)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5}


def test_long_chain_converges_by_pointer_jumping(spark):
    # a 40-node path: plain propagation needs 40 rounds; pointer jumping
    # must finish well inside the iteration cap
    n = 40
    got = _cc(spark, [(i, i + 1) for i in range(n)])
    assert got == {i: 0 for i in range(n + 1)}


def test_chain_anchored_at_high_end(spark):
    # min label sits at the far end of the chain — worst case propagation
    got = _cc(spark, [(i + 1, i) for i in range(10)])
    assert got == {i: 0 for i in range(11)}


def test_self_loops_and_duplicates_ignored(spark):
    got = _cc(spark, [(7, 7), (1, 2), (2, 1), (1, 2)])
    assert got == {1: 1, 2: 1}


def test_empty_pairs(spark):
    df = spark.createDataFrame([], "d1 long, d2 long")
    assert connected_components(df).count() == 0


def test_dedup_clusters_sizes(spark):
    df = spark.createDataFrame(
        [(10, 11), (11, 12), (20, 21)], "d1 long, d2 long"
    )
    rows = {
        r["doc_id"]: (r["canonical_id"], r["cluster_size"])
        for r in dedup_clusters(df).collect()
    }
    assert rows == {
        10: (10, 3),
        11: (10, 3),
        12: (10, 3),
        20: (20, 2),
        21: (20, 2),
    }


def _union_find_components(edges):
    """Sequential oracle: classic union-find with path compression."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = min reachable id
    return {n: find(n) for n in parent}


def test_random_graphs_match_union_find(spark):
    # deterministic pseudo-random graphs of varying shapes vs the
    # sequential union-find oracle (hypothesis-style sweep without
    # per-example Spark-session cost)
    import random

    rng = random.Random(20260813)
    for trial in range(6):
        n = rng.randint(2, 60)
        m = rng.randint(1, 90)
        edges = [(rng.randint(0, n), rng.randint(0, n)) for _ in range(m)]
        want = _union_find_components([(a, b) for a, b in edges if a != b])
        if not want:
            continue
        got = _cc(spark, edges)
        assert got == want, f"trial {trial}: n={n} m={m}"


def test_cc_distributed_path_equals_fast_path(spark, monkeypatch):
    """r9: connected_components picks its strategy from a bounded edge
    probe — force the cap to 0 so the DISTRIBUTED pointer-jumping loop
    runs, and pin that it labels exactly like the driver union-find fast
    path (same fixpoint, same node set, self-loops dropped both ways)."""
    from flink_bm25_spark.operators import graph

    edges = [(1, 2), (2, 3), (3, 4), (5, 6), (7, 7), (9, 8), (6, 5)]
    df = spark.createDataFrame(edges, "d1 long, d2 long")
    fast = {
        r["node"]: r["component"] for r in connected_components(df).collect()
    }
    monkeypatch.setattr(graph, "CC_FAST_PATH_MAX_EDGES", 0)
    dist = {
        r["node"]: r["component"] for r in connected_components(df).collect()
    }
    assert fast == dist
    assert fast == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 8: 8, 9: 8}


def test_pagerank_distributed_path_equals_fast_path(spark, monkeypatch):
    """r9: pagerank's driver fast path (HALF_UP decimal rounding, same
    share arithmetic) must produce exactly the distributed loop's ranks;
    force the cap to 0 to run the distributed loop and compare."""
    from flink_bm25_spark.operators import graph
    from flink_bm25_spark.operators.graph import pagerank

    edges = [(1, 2, 3), (2, 1, 3), (2, 3, 1), (3, 1, 2), (4, 1, 5)]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    fast = {r["node"]: r["rank"] for r in pagerank(df).collect()}
    monkeypatch.setattr(graph, "CC_FAST_PATH_MAX_EDGES", 0)
    dist = {r["node"]: r["rank"] for r in pagerank(df).collect()}
    assert fast == dist


def test_pagerank_matches_numpy_power_iteration(spark):
    """pagerank == the dense power-iteration reference (same per-round
    rounding) on a small weighted digraph, including a dangling-free
    asymmetric structure and a sink-ish low-degree node."""
    import numpy as np

    from flink_bm25_spark.operators.graph import pagerank

    raw = [
        ("a", "b", 3), ("a", "c", 1), ("b", "c", 2), ("c", "a", 1),
        ("b", "d", 1), ("d", "a", 5),
    ]
    edges = spark.createDataFrame(raw, "src string, dst string, w long")
    got = {r.node: r.rank for r in pagerank(edges, iterations=3).collect()}

    nodes = sorted({x for e in raw for x in e[:2]})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    share = np.zeros((n, n))  # share[u, v] = w(u,v)/out_w(u)
    outw = {}
    for s, d, w in raw:
        outw[s] = outw.get(s, 0) + w
    for s, d, w in raw:
        share[idx[s], idx[d]] = w / outw[s]
    r = np.ones(n)
    for _ in range(3):
        r = np.round((1.0 - 0.85) + 0.85 * (share.T @ r), 6)
    want = {nodes[i]: r[i] for i in range(n)}
    assert got.keys() == want.keys()
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, (k, got[k], want[k])


def test_textrank_ranks_hub_word_highest(spark):
    """The word adjacent to everything is the most central: TextRank
    must rank it above the peripheral words (which frequency alone
    would tie)."""
    from flink_bm25_spark.operators.text_analysis import textrank_keywords

    docs = spark.createDataFrame(
        [
            (1, "hub alpha hub beta hub gamma"),
            (2, "hub delta hub epsilon"),
            (3, "alpha beta"),
        ],
        "doc_id bigint, text string",
    )
    ranks = {r.word: r.tr_rank for r in textrank_keywords(docs).collect()}
    assert max(ranks, key=ranks.get) == "hub"
    # peripheral words that only touch the hub sit below it
    assert ranks["delta"] < ranks["hub"]
