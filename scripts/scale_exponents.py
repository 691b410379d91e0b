"""Time-vs-size exponents for the dedup/curation family — evidence that
the LSH pipelines are ~linear in corpus size (exponent ≈ 1), not
quadratic like their naive all-pairs formulations.

Scaling construction: the corpus is replicated M× with every word salted
by its replica id (``regexp_replace(text, '(\\S+)', '$1·<rep>')``), so

- within one replica the duplicate structure of the base corpus is
  preserved EXACTLY (same shingle sets up to the salt, same Jaccard), and
- across replicas no shingle ever matches, so the true near-dup pair set
  grows exactly M× (linearly), never quadratically.

That makes wall-time the only variable: exponent
``log(t_big / t_small) / log(m_big / m_small)`` ≈ 1.0 means the engine
does work proportional to the data.  (Plain replication would be wrong:
each doc would gain M−1 identical twins and the CORRECT output itself
would grow ~M², drowning the engine signal.)

Run: python scripts/scale_exponents.py [mults]   # default "1,4,8"
Writes a markdown table to stdout; paste into THROUGHPUT.md.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from flink_bm25_spark.operators.cleaning import (
        c4_line_filter,
        curation_pipeline,
        web_intake_pipeline,
    )
    from flink_bm25_spark.operators.text_analysis import (
        gopher_filter,
        gopher_ngram_fracs,
    )
    from flink_bm25_spark.operators.dedup import (
        jaccard_pairs,
        minhash_dedup_pairs,
        remove_duplicated_spans,
        shingles,
        simhash_pairs,
        simhash_signatures_from_tokens,
        winnowing_dedup_pairs,
        winnowing_fingerprints,
    )
    from flink_bm25_spark.operators.dedup import edit_distance_pairs, line_dedup
    from flink_bm25_spark.operators.similarity import semantic_dedup_pairs
    from flink_bm25_spark.operators.text_analysis import (
        quality_percentile_gate,
    )
    from flink_bm25_spark.operators.tokenize import filter_stopwords, tokenize
    from flink_bm25_spark.session import get_spark
    from flink_bm25_spark.sources.tables import load_documents, load_embeddings

    from flink_bm25_spark.functions.text import make_fmm_segmenter
    from flink_bm25_spark.operators.tokenize import tokenize_with_udf

    _cjk26 = "的一是不了人我在有他这中大来上国个到说们为子和你地出"

    def _fmm_tokens(d):
        translated = d.select(
            "doc_id",
            F.translate(
                F.lower("text"), "abcdefghijklmnopqrstuvwxyz", _cjk26
            ).alias("text"),
        )
        seg = make_fmm_segmenter(set(_cjk26))
        return tokenize_with_udf(translated, segment=seg)

    mults = [int(m) for m in (sys.argv[1] if len(sys.argv) > 1 else "1,4,8").split(",")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="scale_exponents")
    base = load_documents(spark, sf_dir)
    emb_base = load_embeddings(spark, sf_dir).select("vec_id", "embedding")
    from flink_bm25_spark.sources.tables import load_table

    part_base = load_table(spark, "part", sf_dir).select("p_name")
    # target_cluster_size chosen so the DEFAULT k=None (k ∝ n) resolves
    # to k=4 at 1× and grows with the replicas — the exponent now
    # measures the out-of-the-box configuration, not a hand-tuned k.
    n_emb_base = emb_base.count()
    tcs = max(1, -(-n_emb_base // 4))  # ceil: k=auto is ceil(n/tcs)=4 at 1×

    tmp = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "spark-warehouse",
        "scale_exponents",
    )

    steps = {
        "minhash_lsh_pairs": lambda d: minhash_dedup_pairs(d).count(),
        "simhash_pairs": lambda d: simhash_pairs(
            simhash_signatures_from_tokens(filter_stopwords(tokenize(d)))
        ).count(),
        "ngram_jaccard_pairs": lambda d: jaccard_pairs(
            shingles(d), threshold=0.8
        ).count(),
        "curation_pipeline": lambda d: curation_pipeline(
            d, benchmark=base.limit(25), weights={"en": 0.5, "de": 2.3}
        ).count(),
        # the length() filter forces cleaned_text to be computed — a bare
        # count() would let Catalyst prune the whole reassembly
        "remove_dup_spans": lambda d: remove_duplicated_spans(d, n=10)
        .where(F.length("cleaned_text") >= 0)
        .count(),
        # salted replicas share no grams, so fp counts grow exactly M×
        # and cross-replica pairs are structurally impossible
        "winnowing_fps": lambda d: winnowing_fingerprints(d).count(),
        "winnowing_pairs": lambda d: winnowing_dedup_pairs(d).count(),
        # exact percentile gate, two-phase block rank (r4): the rank
        # stage partitions by value block, so this must scale ~linear
        "quality_gate_exact": lambda d: quality_percentile_gate(d).count(),
        # CCNet step-1 line dedup: line structure synthesized in-plan
        # (newline per 8 words); the word salt makes cross-replica lines
        # distinct, so survivors grow exactly M× and the line-keyed
        # shuffle is the only corpus-sized stage
        "line_dedup": lambda d: line_dedup(
            d.select(
                "doc_id",
                F.regexp_replace(
                    F.col("text"), r"((?:\S+ ){7}\S+) ", "$1\n"
                ).alias("text"),
            )
        )
        .where(F.length("cleaned_text") >= 0)
        .count(),
        # the composed web-intake flagship (strip -> line dedup ->
        # per-lang LM buckets -> per-lang gate): salted replicas keep
        # each language's score/nll distribution intact, so survivors
        # grow exactly M× and every stage's shuffle is corpus-linear
        "web_intake": lambda d: web_intake_pipeline(
            d.select(
                "doc_id",
                "lang",
                F.regexp_replace(
                    F.col("text"), r"((?:\S+ ){7}\S+) ", "$1\n"
                ).alias("text"),
            ),
            by_col="lang",
        )
        .where(F.length("cleaned_text") >= 0)
        .count(),
        # the composed Gopher filter: flags map-side, unit + 9-width
        # (n, gram) counts corpus-linear — the salted replicas keep
        # per-doc repetition structure identical, so verdicts replicate
        # exactly M× and only engine cost varies
        "gopher_filter": lambda d: gopher_filter(d).count(),
        # r6: the single-scan n-gram branch on its own (one tokenize +
        # localCheckpoint + 9 replay branches); the frac filter keeps
        # Catalyst from pruning the rollup under count()
        "gopher_ngram_fracs": lambda d: gopher_ngram_fracs(d)
        .where(F.col("top_2gram_char_frac") >= 0)
        .count(),
        # C4 line/page rules: pure map-side projection + filter
        "c4_line_filter": lambda d: c4_line_filter(
            d.select(
                "doc_id",
                F.regexp_replace(
                    F.col("text"), r"((?:\S+ ){7}\S+) ", "$1.\n"
                ).alias("text"),
            )
        ).count(),
        # the engine's one Python hot path (Arrow FMM segmentation) —
        # map-side, so the exponent must be ~1 and the partition spread
        # must actually engage (a 1-core stage would show here as a
        # constant-slope wall regardless of M)
        "cjk_fmm_tokens": lambda d: _fmm_tokens(d).count(),
    }

    # r6: WebIntakeScreen.screen_batch at 1×/4×/8× — the model and
    # operating points are fitted ONCE (on the first mult seen, 1× by
    # default) and FROZEN (eagerly checkpointed so fit cost is never
    # billed to a screening leg); each leg screens its replica batch
    # with a fresh line archive, so the measured work is the production
    # per-batch cost: strip → incremental line dedup → frozen-model
    # scoring join → frozen gates.  Replica salting keeps cross-replica
    # lines distinct (archive grows M×) while rep-0 stays model-known.
    from flink_bm25_spark.api import WebIntakeScreen

    _screen_state: dict[str, WebIntakeScreen] = {}

    def _lined(d):
        return d.select(
            "doc_id",
            "lang",
            F.regexp_replace(
                F.col("text"), r"((?:\S+ ){7}\S+) ", "$1\n"
            ).alias("text"),
        )


    # SPARK_GRAFT_STEPS=name1,name2 limits the run to named rows (the
    # non-dict blocks below honor it too) — lets one new row be measured
    # without re-paying the whole suite.
    _only = os.environ.get("SPARK_GRAFT_STEPS")
    _allow = set(_only.split(",")) if _only else None

    def _want_step(name: str) -> bool:
        return _allow is None or name in _allow

    if _allow is not None:
        steps = {k: v for k, v in steps.items() if k in _allow}

    rows: dict[str, dict[int, tuple[float, int]]] = {k: {} for k in steps}
    for mult in mults:
        reps = spark.range(mult).select(F.col("id").alias("rep"))
        docs = (
            base.crossJoin(reps)
            .select(
                (F.col("doc_id") + F.col("rep") * F.lit(10_000_000)).alias(
                    "doc_id"
                ),
                F.regexp_replace(
                    F.col("text"),
                    F.lit(r"(\S+)"),
                    F.concat(F.lit("$1·"), F.col("rep").cast("string")),
                ).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
        # materialize so every step reads parquet, not the generator
        d = f"{tmp}_x{mult}"
        docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        mat = spark.read.parquet(f"{d}/documents.parquet")
        n = mat.count()
        for name, fn in steps.items():
            t0 = time.perf_counter()
            out = fn(mat)
            dt = time.perf_counter() - t0
            rows[name][mult] = (dt, out)
            print(f"x{mult} ({n} docs) {name}: {out} rows in {dt:.1f}s", flush=True)

        # r6: the BM25 serving index — build cost must be corpus-linear
        # (one TF shuffle + one doc_id join + the partitioned write);
        # the query leg times ONE partition-pruned top-k against the
        # grown index.  Salting rewrites every word, so the query uses
        # replica-0's salted terms; its bucket set is fixed while each
        # bucket's postings grow M×, making the query row the honest
        # "serve latency vs corpus size" curve (bounded by bucket scan,
        # never the corpus).
        if any(
            _want_step(s)
            for s in (
                "bm25_index_build",
                "bm25_serve_query",
                "bm25_batch_serve_q100",
                "bm25_point_lookup",
                "bm25_serve_mlt",
                "bm25_delete_10pct",
                "bm25_upsert_10pct",
                "bm25_serve_tombstoned",
            )
        ):
            from flink_bm25_spark.operators.serving import (
                bm25_index_save,
                bm25_topk_from_index,
            )

            idx = f"{tmp}_bm25idx_x{mult}"
            t0 = time.perf_counter()
            bm25_index_save(mat, idx, n_buckets=64)
            dt = time.perf_counter() - t0
            if _want_step("bm25_index_build"):
                rows.setdefault("bm25_index_build", {})[mult] = (dt, n)
                print(
                    f"x{mult} ({n} docs) bm25_index_build: in {dt:.1f}s",
                    flush=True,
                )
            if _want_step("bm25_serve_query"):
                qterms = ("spark·0", "stream·0", "join·0")
                t0 = time.perf_counter()
                out = bm25_topk_from_index(spark, idx, qterms, k=10).count()
                dt = time.perf_counter() - t0
                rows.setdefault("bm25_serve_query", {})[mult] = (dt, out)
                print(
                    f"x{mult} ({n} docs) bm25_serve_query: {out} rows"
                    f" in {dt:.1f}s",
                    flush=True,
                )
            if _want_step("bm25_batch_serve_q100"):
                # r7: the capped batch path (no In-list above 64 terms)
                # serving a FIXED 100-query eval set as the corpus
                # grows — per-query buckets are fixed, so the curve is
                # the bucket-scan growth, never the corpus scan
                from flink_bm25_spark.operators.serving import (
                    bm25_batch_topk_from_index,
                )

                vocab = ("spark", "stream", "join", "fast", "hash",
                         "merge", "data", "big", "value", "table")
                q100 = [
                    (
                        i,
                        tuple(
                            f"{vocab[(i + j) % len(vocab)]}·0"
                            for j in range(4)
                        )
                        + (f"tail{i}·0", f"tail{i}b·0"),
                    )
                    for i in range(100)
                ]
                t0 = time.perf_counter()
                out = bm25_batch_topk_from_index(spark, idx, q100, k=10).count()
                dt = time.perf_counter() - t0
                rows.setdefault("bm25_batch_serve_q100", {})[mult] = (dt, out)
                print(
                    f"x{mult} ({n} docs) bm25_batch_serve_q100: {out} rows"
                    f" in {dt:.1f}s",
                    flush=True,
                )
            if _want_step("bm25_point_lookup") or _want_step("bm25_serve_mlt"):
                from flink_bm25_spark.operators.serving import (
                    bm25_index_save_forward,
                    doc_vector_from_index,
                    more_like_this_from_index,
                )

                bm25_index_save_forward(mat, idx)
                if _want_step("bm25_point_lookup"):
                    t0 = time.perf_counter()
                    out = doc_vector_from_index(spark, idx, 42).count()
                    dt = time.perf_counter() - t0
                    rows.setdefault("bm25_point_lookup", {})[mult] = (dt, out)
                    print(
                        f"x{mult} ({n} docs) bm25_point_lookup: {out} rows"
                        f" in {dt:.1f}s",
                        flush=True,
                    )
                if _want_step("bm25_serve_mlt"):
                    t0 = time.perf_counter()
                    out = more_like_this_from_index(spark, idx, 42, k=10).count()
                    dt = time.perf_counter() - t0
                    rows.setdefault("bm25_serve_mlt", {})[mult] = (dt, out)
                    print(
                        f"x{mult} ({n} docs) bm25_serve_mlt: {out} rows"
                        f" in {dt:.1f}s",
                        flush=True,
                    )
            # r8: the CRUD legs at 10% of the corpus per scale — the
            # WRITE side is expected ~linear in its own batch (which
            # grows with the corpus here), the tombstoned READ side
            # ~flat vs the clean serve row (the anti-join folds into
            # the pruned scan; never a postings rewrite).  Ids stay
            # IN-PLAN (a DataFrame — the r7-weak recipe end to end).
            if any(
                _want_step(s)
                for s in (
                    "bm25_delete_10pct",
                    "bm25_upsert_10pct",
                    "bm25_serve_tombstoned",
                )
            ):
                from flink_bm25_spark.operators.serving import (
                    bm25_index_delete,
                    bm25_index_save_forward,
                    bm25_index_upsert,
                )

                if not os.path.isdir(f"{idx}/forward"):
                    bm25_index_save_forward(mat, idx)
                if _want_step("bm25_upsert_10pct"):
                    repl = mat.where(
                        F.pmod(F.col("doc_id"), F.lit(10)) == 1
                    ).select(
                        "doc_id",
                        F.concat(
                            F.lit("refreshed·crawl "), F.col("text")
                        ).alias("text"),
                    )
                    t0 = time.perf_counter()
                    bm25_index_upsert(repl, idx)
                    dt = time.perf_counter() - t0
                    out = repl.count()
                    rows.setdefault("bm25_upsert_10pct", {})[mult] = (dt, out)
                    print(
                        f"x{mult} ({n} docs) bm25_upsert_10pct: {out} docs"
                        f" in {dt:.1f}s",
                        flush=True,
                    )
                if _want_step("bm25_delete_10pct"):
                    dels = mat.where(
                        F.pmod(F.col("doc_id"), F.lit(10)) == 0
                    ).select("doc_id")
                    t0 = time.perf_counter()
                    bm25_index_delete(spark, idx, dels)
                    dt = time.perf_counter() - t0
                    out = dels.count()
                    rows.setdefault("bm25_delete_10pct", {})[mult] = (dt, out)
                    print(
                        f"x{mult} ({n} docs) bm25_delete_10pct: {out} docs"
                        f" in {dt:.1f}s",
                        flush=True,
                    )
                if _want_step("bm25_serve_tombstoned"):
                    qterms = ("spark·0", "stream·0", "join·0")
                    t0 = time.perf_counter()
                    out = bm25_topk_from_index(spark, idx, qterms, k=10).count()
                    dt = time.perf_counter() - t0
                    rows.setdefault("bm25_serve_tombstoned", {})[mult] = (
                        dt,
                        out,
                    )
                    print(
                        f"x{mult} ({n} docs) bm25_serve_tombstoned: {out} rows"
                        f" in {dt:.1f}s",
                        flush=True,
                    )

        # SemDeDup scales by growing k with n (constant cluster size — the
        # published recipe).  Replicas get a deterministic per-replica ±1
        # sign flip per component: a diagonal orthogonal transform, so
        # within-replica cosines (and near-dup structure) are preserved
        # EXACTLY while cross-replica pairs decorrelate.
        emb_rep = (
            emb_base.crossJoin(reps)
            .select(
                (F.col("vec_id") + F.col("rep") * F.lit(10_000_000)).alias(
                    "vec_id"
                ),
                F.transform(
                    F.col("embedding"),
                    lambda x, i: x
                    * (
                        1
                        - 2
                        * F.pmod(
                            F.xxhash64(F.col("rep"), i), F.lit(2)
                        ).cast("float")
                    ),
                ).alias("embedding"),
            )
        )
        # Edit-distance ER scales over the part-name vocabulary.  Salt:
        # FOUR copies of the replica digit appended to every word, so a
        # cross-replica pair differs in ≥ 4 chars per word (> max_dist=3
        # even for 1-word names) — within-replica pair structure is
        # preserved and the true pair set grows exactly M×.  Base-word
        # grams ARE shared across replicas at identical positions, so
        # this is the hot-gram adversarial case the Ed-Join prefix
        # filter exists for.
        if _want_step("edit_distance_pairs"):
            part_rep = part_base.crossJoin(reps).select(
                F.expr(
                    "regexp_replace(p_name, '(\\\\S+)',"
                    " concat('$1', repeat(cast(rep as string), 4)))"
                ).alias("p_name")
            )
            dp = f"{tmp}_part_x{mult}"
            part_rep.write.mode("overwrite").parquet(f"{dp}/part.parquet")
            pmat = spark.read.parquet(f"{dp}/part.parquet")
            np_ = pmat.count()
            t0 = time.perf_counter()
            out = edit_distance_pairs(pmat, "p_name", 3).count()
            dt = time.perf_counter() - t0
            rows.setdefault("edit_distance_pairs", {})[mult] = (dt, out)
            print(
                f"x{mult} ({np_} part rows) edit_distance_pairs: {out} rows"
                f" in {dt:.1f}s",
                flush=True,
            )

        # r6: WebIntakeScreen.screen_batch — fit happens OUTSIDE the
        # timed window (first mult seen, eagerly checkpointed), so each
        # leg times only the production per-batch cost against the
        # frozen model with a fresh line archive.
        lined = _lined(mat)
        if _want_step("web_intake_screen_batch") and "s" not in _screen_state:
            fitted = WebIntakeScreen.fit(lined, quality_cutoff=0.25)
            fitted.model = fitted.model.localCheckpoint(eager=True)
            fitted.nll_cuts = fitted.nll_cuts.localCheckpoint(eager=True)
            fitted.score_cuts = fitted.score_cuts.localCheckpoint(
                eager=True
            )
            _screen_state["s"] = fitted
        if _want_step("web_intake_screen_batch"):
            frozen = _screen_state["s"]
            ws = WebIntakeScreen(
                frozen.model,
                frozen.nll_cuts,
                frozen.score_cuts,
                frozen.global_score_cut,
            )
            t0 = time.perf_counter()
            out = (
                ws.screen_batch(lined)
                .where(F.length("cleaned_text") >= 0)
                .count()
            )
            dt = time.perf_counter() - t0
            rows.setdefault("web_intake_screen_batch", {})[mult] = (dt, out)
            print(
                f"x{mult} ({n} docs) web_intake_screen_batch: {out} rows"
                f" in {dt:.1f}s",
                flush=True,
            )

        if _want_step("semantic_dedup(k∝n default)"):
            de = f"{tmp}_emb_x{mult}"
            emb_rep.write.mode("overwrite").parquet(f"{de}/embeddings.parquet")
            emat = spark.read.parquet(f"{de}/embeddings.parquet")
            ne = emat.count()
            t0 = time.perf_counter()
            out = semantic_dedup_pairs(
                emat,
                threshold=0.45,
                iterations=2,
                target_cluster_size=tcs,
            ).count()
            dt = time.perf_counter() - t0
            rows.setdefault("semantic_dedup(k∝n default)", {})[mult] = (dt, out)
            print(
                f"x{mult} ({ne} vecs) semantic_dedup(k=auto~{-(-ne // tcs)}): "
                f"{out} rows in {dt:.1f}s",
                flush=True,
            )

    lo, hi = mults[0], mults[-1]
    print("\n| step | " + " | ".join(f"x{m} sec (rows)" for m in mults) + " | exponent |")
    print("|---|" + "---|" * (len(mults) + 1))
    for name in rows:
        t_lo, t_hi = rows[name][lo][0], rows[name][hi][0]
        exp = (
            math.log(t_hi / t_lo) / math.log(hi / lo) if hi > lo else float("nan")
        )
        cells = " | ".join(f"{rows[name][m][0]:.1f} ({rows[name][m][1]})" for m in mults)
        print(f"| {name} | {cells} | **{exp:.2f}** |")
    spark.stop()


if __name__ == "__main__":
    main()
