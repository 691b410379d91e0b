"""Iterative graph operators — connected components over a pair relation.

The reference's dedup story stops at *pairs* (its only dedup is the exact
(word,count) distinct, ``backup/BatchBM25Pre.java:153``); a training-data
pipeline needs the next step: group near-duplicate pairs into **clusters**
and elect one canonical document per cluster.  That grouping is connected
components over the pair graph.

Scale shape (100 TB): label propagation with **pointer jumping**.  Each
iteration is two shuffles (one propagate join, one min-aggregate) plus a
pointer-jump self-join that doubles the distance a label travels, so
convergence is O(log diameter) rounds — not O(diameter), which matters
when adversarial duplicate chains (boilerplate pages, templated spam)
form long paths.  Labels are monotonically non-increasing, so the sum of
labels is a strictly decreasing convergence metric: one scalar per round,
no change-detection join.  Lineage is truncated every round with
``localCheckpoint`` (the DataFrame analogue of an iterative algorithm's
stage checkpoint) so the plan does not grow with the iteration count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# NOTE (r9 optimization round): this module used to memoize component
# labelings in a module-level dict keyed on (session, plan semantic hash).
# That let a REPEAT invocation of the same query skip the whole loop —
# which is result caching across runs, not optimization — so the memo was
# removed; every call now computes from its input.  ``clear_memo`` stays
# as a no-op so existing callers keep working.


def clear_memo() -> None:
    """No-op (kept for API compatibility): the former result memo was
    removed in the r9 optimization round — every call recomputes."""


def connected_components(
    pairs: DataFrame,
    src: str = "d1",
    dst: str = "d2",
    max_iterations: int = 50,
) -> DataFrame:
    """``(node, component)`` for every node appearing in ``pairs``;
    ``component`` is the minimum node id reachable in the undirected
    pair graph — a deterministic canonical id.
    """
    sym = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # Lazy: the first round's propagate join materializes it — no
    # standalone checkpoint job.
    sym = (
        sym.unionByName(sym.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    labels = sym.select(F.col("a").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    prev_sum = None
    for _ in range(max_iterations):
        # propagate: every edge offers its source's label to its target
        offered = sym.join(labels, sym["a"] == labels["node"]).select(
            F.col("b").alias("node"), "component"
        )
        merged = (
            labels.unionByName(offered)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        # pointer jump: follow component -> label(component) one more hop,
        # doubling the effective path length per round
        jump = merged.select(
            F.col("node").alias("jnode"), F.col("component").alias("jcomp")
        )
        # LAZY checkpoint: the convergence scalar right below is the
        # round's only action — it materializes the checkpoint as a side
        # effect, so each round costs ONE Spark job, not an eager
        # checkpoint job plus the agg.
        labels = (
            merged.join(jump, merged["component"] == jump["jnode"], "left")
            .select(
                "node",
                F.coalesce(F.col("jcomp"), F.col("component")).alias("component"),
            )
            .localCheckpoint(eager=False)
        )
        # labels only ever decrease => their sum strictly decreases until
        # the fixpoint; a scalar comparison replaces a change-count join
        cur_sum = labels.agg(F.sum("component")).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def dedup_clusters(
    pairs: DataFrame, src: str = "d1", dst: str = "d2"
) -> DataFrame:
    """``(doc_id, canonical_id, cluster_size)`` — each document in a
    near-duplicate cluster, its elected canonical (cluster-min id), and
    the cluster population.  Feed any pair relation (exact, MinHash,
    SimHash, embedding-cosine); downstream keeps ``doc_id ==
    canonical_id`` rows and drops the rest.
    """
    comp = connected_components(pairs, src, dst)
    return (
        comp.select(
            F.col("node").alias("doc_id"), F.col("component").alias("canonical_id")
        )
        .withColumn(
            "cluster_size",
            F.count("*").over(Window.partitionBy("canonical_id")).cast("long"),
        )
    )


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """``(node, rank)`` — weighted PageRank after a FIXED number of
    iterations (no convergence test: a pinned round count is what makes
    the result a deterministic, oracle-replayable relation).

    rank'(v) = (1-d) + d * Σ_{(u,v)} rank(u) · w(u,v) / out_w(u)

    Scale shape: the edge relation is normalized ONCE (share = w/out_w,
    one keyed join) and checkpointed; each iteration is then one keyed
    join (ranks are hashed on node, edges on src — the partitioning is
    reused every round) plus one sum-aggregate, O(E) shuffle per round,
    with ``localCheckpoint`` truncating lineage so the plan does not grow
    with the iteration count.  Ranks are never broadcast and never reach
    the driver.  Per-round 6-decimal rounding keeps the fixpoint
    replayable across engines (same caveat as ``kmeans_assign``: rounding
    makes cross-engine divergence improbable, not impossible).
    """
    e = edges.select(
        F.col(src).alias("_src"), F.col(dst).alias("_dst"), F.col(weight).alias("_w")
    )
    out_w = e.groupBy("_src").agg(F.sum("_w").alias("_ow"))
    shares = (
        e.join(out_w, "_src")
        .select(
            "_src",
            "_dst",
            (F.col("_w").cast("double") / F.col("_ow")).alias("_share"),
        )
        .localCheckpoint(eager=True)
    )
    nodes = (
        shares.select(F.col("_src").alias("node"))
        .unionByName(shares.select(F.col("_dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    ranks = nodes.withColumn("rank", F.lit(1.0))
    for _ in range(iterations):
        contrib = (
            shares.join(ranks, shares["_src"] == ranks["node"])
            .groupBy("_dst")
            .agg(F.sum(F.col("_share") * F.col("rank")).alias("_s"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["_dst"], "left")
            .select(
                "node",
                F.round(
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce("_s", F.lit(0.0)),
                    6,
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
