"""Round-10 hardening — regression pins for the r9 ADVICE findings:
the pagerank driver fast path must replicate the distributed loop's
null/zero-weight semantics (no ZeroDivisionError, null-share edges
contribute nothing but their nodes stay ranked) and its exact rounding
(Spark's round() quantizes the SHORTEST decimal repr, not the binary
expansion); the connected-components fast path must widen mixed-width
node columns like the distributed union does; kmeans_fit must ignore
dimensions beyond the init row's width instead of raising; and merged
corpus stats must keep the pre-seeded additive n_docs (no in-plan
recount of the whole archive per action)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_bm25_spark.operators.graph import connected_components, pagerank


def test_pagerank_null_and_zero_weight_parity(spark, monkeypatch):
    """Fast path == distributed loop on every degenerate edge shape:
    null src (edge and its dst vanish), null dst (ranked, receives
    nothing), null weight and zero out-weight sum (null share — the
    nodes stay ranked at the teleport floor)."""
    from flink_bm25_spark.operators import graph

    edges = spark.createDataFrame(
        [
            (1, 2, 1.0),
            (2, 1, 1.0),
            (3, 4, 0.0),  # out_sum == 0 -> null share, NOT a crash
            (5, None, 2.0),
            (None, 6, 2.0),  # null src never joins out_w
            (7, 8, None),
            (9, 10, 1.0),
            (9, 11, -1.0),  # weights cancel: out_sum == 0
        ],
        "src long, dst long, w double",
    )
    fast = {r["node"]: r["rank"] for r in pagerank(edges).collect()}
    monkeypatch.setattr(graph, "CC_FAST_PATH_MAX_EDGES", 0)
    dist = {r["node"]: r["rank"] for r in pagerank(edges).collect()}
    assert fast == dist
    assert 6 not in fast  # null-src edge vanished together with its dst
    assert fast[None] == 0.15  # null dst ranked, contributions discarded
    assert fast[3] == fast[4] == 0.15  # zero out-weight: null shares
    assert fast[1] == fast[2] == 1.0  # the regular cycle is untouched


def test_pagerank_fast_path_rounds_like_spark_shortest_repr():
    """2.675 has binary expansion 2.67499…, but Spark's round() goes
    through Double.toString -> "2.675" -> HALF_UP -> 2.68.  The fast
    path must quantize from repr(x) the same way (at its 6-dp scale:
    x.xxxxxx5 repr ties round UP)."""
    from decimal import ROUND_HALF_UP, Decimal

    # the exact helper the fast path uses, at its quantum
    q6 = Decimal("0.000001")

    def round6(x):
        return float(Decimal(repr(x)).quantize(q6, rounding=ROUND_HALF_UP))

    # 0.1234565 reprs as "0.1234565" (binary value ...64999…): shortest-
    # repr HALF_UP rounds UP — Decimal(x) directly would round DOWN.
    assert round6(0.1234565) == 0.123457
    assert float(Decimal(0.1234565).quantize(q6, rounding=ROUND_HALF_UP)) == 0.123456


def test_cc_fast_path_widens_mixed_node_types(spark, monkeypatch):
    """int src × long dst: the fast path's output schema must be the
    widened common type, exactly what the distributed unionByName
    produces."""
    from flink_bm25_spark.operators import graph

    df = spark.createDataFrame([(1, 2), (2, 3)], "d1 int, d2 long")
    fast = connected_components(df)
    assert fast.schema.simpleString() == "struct<node:bigint,component:bigint>"
    fast_rows = {(r["node"], r["component"]) for r in fast.collect()}
    monkeypatch.setattr(graph, "CC_FAST_PATH_MAX_EDGES", 0)
    dist = connected_components(df)
    assert dist.schema.simpleString() == fast.schema.simpleString()
    assert {(r["node"], r["component"]) for r in dist.collect()} == fast_rows


def test_kmeans_fit_ignores_dims_beyond_init_width(spark):
    """A vector longer than the first init row's dimension used to
    raise IndexError on the driver; the wide aggregate it replaced
    simply never read those dimensions.  Pin the ignore-extra-dims
    behavior."""
    from flink_bm25_spark.operators.kmeans import kmeans_fit

    emb = spark.createDataFrame(
        [
            (1, [0.0, 0.0]),
            (2, [1.0, 1.0, 99.0]),  # third dim must be ignored, not fatal
        ],
        "vec_id long, embedding array<double>",
    )
    cents = kmeans_fit(emb, k=1, iterations=1)
    assert cents == [[0.5, 0.5]]  # means over dims 0..1 only


def test_merged_stats_keep_preseeded_count_literal(spark):
    """After merge_corpus_stats the documents relation is the old∪new
    union; idf_stats must still use the pre-seeded additive n_docs (a
    literal in the plan) instead of recounting the whole archive
    in-plan on every action."""
    from flink_bm25_spark.operators.pipeline import (
        build_corpus_stats,
        merge_corpus_stats,
    )

    old_docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha alpha delta")],
        "doc_id long, text string",
    )
    new_docs = spark.createDataFrame(
        [(3, "beta beta epsilon")], "doc_id long, text string"
    )
    merged = merge_corpus_stats(build_corpus_stats(old_docs), new_docs)
    assert merged.n_docs == 3
    plan = merged.idf_stats._jdf.queryExecution().optimizedPlan().toString()
    # the literal form bakes N into the idf expression; the relational
    # form would JOIN a count aggregate over the old∪new archive —
    # exactly the per-action recount the merge contract forbids
    assert "Join" not in plan
    got = {r["word"]: r["idf"] for r in merged.idf_stats.collect()}
    want = {
        r["word"]: r["idf"]
        for r in build_corpus_stats(
            old_docs.unionByName(new_docs)
        ).idf_stats.collect()
    }
    assert got == want
