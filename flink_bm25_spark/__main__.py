"""Command-line entry point — the Spark twin of the reference's jar
invocation (``java -jar my-flink-project-1.0-SNAPSHOT.jar 150``,
``README.md:10``: process the first N documents, write per-doc TF stores
and golden text files).

    python -m flink_bm25_spark precompute --input DIR [--limit N]
        [--output DIR] [--golden-text DIR] [--pos-filter]
    python -m flink_bm25_spark search --stats DIR "spark stream join"
        [-k 10]
    python -m flink_bm25_spark index ACTION --path DIR ...
        (create/add/delete/search/mlt/get/compact/stats — the persisted
        serving index's whole operational loop)
    python -m flink_bm25_spark curate --input DIR --benchmark DIR
        --output DIR [--weights en=0.5,de=2.3]

``precompute`` = the reference's whole batch job (tokenize → predicate →
TF top-30 → DF/IDF store), corpus-at-once instead of 2 jobs/document;
``--golden-text`` additionally emits the ``(word,count)`` per-doc files
of ``backup/BatchBM25PrePrint.java:224-225``.  ``search`` = the BM25
ranking the reference's stored statistics exist to serve.  ``curate`` =
the training-data pipeline extension.
"""

from __future__ import annotations

import argparse
import sys


def _parse_weights(spec: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for part in filter(None, (spec or "").split(",")):
        k, _, v = part.partition("=")
        out[k.strip()] = float(v)
    return out


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="flink_bm25_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    pre = sub.add_parser("precompute", help="build TF/DF/IDF stores")
    pre.add_argument("--input", required=True, help="dir with documents.parquet")
    pre.add_argument("--limit", type=int, default=None,
                     help="first N docs by id (the reference's jar arg)")
    pre.add_argument("--output", default=None, help="stats dir (parquet)")
    pre.add_argument("--golden-text", default=None,
                     help="also write (word,count) per-doc text files here")
    pre.add_argument("--pos-filter", action="store_true",
                     help="apply the reference's noun-family predicate")
    pre.add_argument("--top-k", type=int, default=30)

    srch = sub.add_parser("search", help="BM25 top-k over saved stats")
    srch.add_argument("--stats", required=True)
    srch.add_argument("query", help="space-separated terms")
    srch.add_argument("-k", type=int, default=10)

    hyb = sub.add_parser(
        "hybrid", help="BM25 + dense-cosine search fused by RRF"
    )
    hyb.add_argument("--stats", required=True, help="saved BM25 stats dir")
    hyb.add_argument("--embeddings", required=True,
                     help="dir with embeddings.parquet (vec_id = doc_id)")
    hyb.add_argument("--query-vec-id", type=int, required=True,
                     help="vec_id whose embedding is the dense query")
    hyb.add_argument("query", help="space-separated terms (lexical half)")
    hyb.add_argument("-k", type=int, default=10)
    hyb.add_argument("--pool", type=int, default=20)

    cur = sub.add_parser("curate", help="clean/decontaminate/mix/pack")
    cur.add_argument("--input", required=True)
    cur.add_argument("--benchmark", required=True)
    cur.add_argument("--output", required=True)
    cur.add_argument("--weights", default="")
    cur.add_argument("--budget", type=int, default=512)

    idx = sub.add_parser(
        "index",
        help="persisted BM25 serving index: the operational CRUD loop"
        " (create/add/delete/search/mlt/get/compact/gc/stats/cdc) plus"
        " snapshots (snapshot/versions/pin/unpin; --version reads)",
    )
    idx.add_argument(
        "action",
        choices=(
            "create", "add", "upsert", "delete", "search", "mlt", "get",
            "compact", "gc", "stats", "cdc",
            "snapshot", "versions", "pin", "unpin",
        ),
    )
    idx.add_argument("--path", required=True, help="index root directory")
    idx.add_argument("--input", default=None,
                     help="dir with documents.parquet (create/add), or a"
                     " parquet dir of (op, doc_id, text[, seq]) changes (cdc)")
    idx.add_argument("--query", default=None, help="free text (search)")
    idx.add_argument("--doc-id", type=int, default=None, help="mlt/get")
    idx.add_argument("--doc-ids", default=None,
                     help="comma-separated ids (delete)")
    idx.add_argument("-k", type=int, default=10)
    idx.add_argument("--n-buckets", type=int, default=64)
    idx.add_argument("--hot-df-cap", type=int, default=None,
                     help="salt terms with df above this cap (create/add/compact)")
    idx.add_argument("--forward", action="store_true",
                     help="also build the doc-major forward section (create)")
    idx.add_argument("--checkpoint", default=None,
                     help="streaming checkpoint dir (cdc)")
    idx.add_argument("--compact-every", type=int, default=None,
                     help="fold every N micro-batches (cdc)")
    idx.add_argument("--compact-tombstones", type=int, default=None,
                     help="fold when pending tombstones cross this (cdc)")
    idx.add_argument("--grace", type=float, default=300.0,
                     help="read-grace seconds before superseded version"
                     " trees are reclaimed (gc)")
    idx.add_argument("--version", type=int, default=None,
                     help="read from this pinned snapshot version"
                     " (search/mlt/get/stats), or the version to"
                     " pin/unpin")

    ivf = sub.add_parser(
        "ivf",
        help="persisted IVF (dense ANN) index: the operational CRUD loop"
        " (create/add/upsert/delete/search/compact/gc/stats/retrain/cdc)"
        " plus snapshots (snapshot/versions/pin/unpin; --version reads)",
    )
    ivf.add_argument(
        "action",
        choices=(
            "create", "add", "upsert", "delete", "search", "compact",
            "gc", "stats", "retrain", "cdc",
            "snapshot", "versions", "pin", "unpin",
        ),
    )
    ivf.add_argument("--path", required=True, help="index root directory")
    ivf.add_argument("--input", default=None,
                     help="parquet dir of (vec_id, embedding) — or a dir"
                     " holding embeddings.parquet (create/add/upsert), or"
                     " a parquet dir of (op, vec_id, embedding[, seq])"
                     " changes (cdc)")
    ivf.add_argument("--vec-ids", default=None,
                     help="comma-separated ids (delete)")
    ivf.add_argument("--query-vec", default=None,
                     help="comma-separated floats (search)")
    ivf.add_argument("--query-vec-id", type=int, default=None,
                     help="take the query vector from --input by id (search)")
    ivf.add_argument("-k", type=int, default=10)
    ivf.add_argument("--nprobe", type=int, default=4)
    ivf.add_argument("--n-cells", type=int, default=None,
                     help="coarse-quantizer cells (create defaults to 16;"
                     " retrain keeps the current count unless overridden)")
    ivf.add_argument("--seed", type=int, default=42)
    ivf.add_argument("--checkpoint", default=None,
                     help="streaming checkpoint dir (cdc)")
    ivf.add_argument("--compact-every", type=int, default=None,
                     help="fold every N micro-batches (cdc)")
    ivf.add_argument("--compact-tombstones", type=int, default=None,
                     help="fold when pending tombstones cross this (cdc)")
    ivf.add_argument("--retrain-staleness", type=float, default=None,
                     help="retrain the quantizer when the post-train"
                     " fraction crosses this (cdc)")
    ivf.add_argument("--grace", type=float, default=300.0,
                     help="read-grace seconds before superseded version"
                     " trees are reclaimed (gc)")
    ivf.add_argument("--version", type=int, default=None,
                     help="read from this pinned snapshot version"
                     " (search/stats), or the version to pin/unpin")

    exp = sub.add_parser(
        "explain",
        help="print the physical plan of a gate query (plan-first debugging)",
    )
    exp.add_argument("query_name", help="a queries() entry, e.g. q_bm25_rank")
    exp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    exp.add_argument("--mode", default="formatted",
                     choices=("simple", "extended", "formatted", "cost"))

    args = ap.parse_args(argv)

    from flink_bm25_spark.session import get_spark  # noqa: PLC0415

    spark = get_spark(app_name=f"flink_bm25_spark_{args.cmd}")
    try:
        if args.cmd == "precompute":
            from flink_bm25_spark.api import BM25Engine  # noqa: PLC0415
            from flink_bm25_spark.operators.sinks import (  # noqa: PLC0415
                write_reference_text,
            )
            from flink_bm25_spark.sources.tables import load_documents  # noqa: PLC0415

            docs = load_documents(spark, args.input)
            if args.limit is not None:
                # the jar arg: first N pids (reference getPidList order)
                docs = docs.orderBy("doc_id").limit(args.limit)
            engine = BM25Engine.fit(docs, pos_filter=args.pos_filter)
            n = engine.stats.n_docs
            print(f"precomputed statistics for {n} documents", file=sys.stderr)
            if args.output:
                engine.save(args.output)
                print(f"stats -> {args.output}", file=sys.stderr)
            if args.golden_text:
                write_reference_text(
                    engine.stats.tf, args.golden_text, k=args.top_k
                )
                print(f"golden text -> {args.golden_text}", file=sys.stderr)
        elif args.cmd == "search":
            from flink_bm25_spark.api import BM25Engine  # noqa: PLC0415

            engine = BM25Engine.load(spark, args.stats)
            for r in engine.search(args.query, k=args.k).collect():
                print(f"{r['rk']}\t{r['doc_id']}\t{r['score']}")
        elif args.cmd == "hybrid":
            from pyspark.sql import functions as F  # noqa: PLC0415

            from flink_bm25_spark.api import BM25Engine  # noqa: PLC0415
            from flink_bm25_spark.operators.retrieval import (  # noqa: PLC0415
                hybrid_search,
            )
            from flink_bm25_spark.sources.tables import (  # noqa: PLC0415
                load_embeddings,
            )

            engine = BM25Engine.load(spark, args.stats)
            emb = load_embeddings(spark, args.embeddings)
            row = emb.where(F.col("vec_id") == args.query_vec_id).first()
            if row is None:
                print(f"no embedding with vec_id={args.query_vec_id}",
                      file=sys.stderr)
                return 2
            qvec = [float(x) for x in row["embedding"]]
            from flink_bm25_spark.api import _tokenize_query  # noqa: PLC0415

            fused = hybrid_search(
                engine.stats.tf,
                engine.stats.idf_stats,
                engine.stats.dlen,
                emb,
                _tokenize_query(args.query),
                qvec,
                k=args.k,
                pool=args.pool,
                # the query doc itself would otherwise take rank 1 with
                # cos = 1.0 on the dense side
                exclude_id=args.query_vec_id,
            )
            for r in fused.collect():
                print(
                    f"{r['rk']}\t{r['doc_id']}\t{r['rrf']}\t{r['n_systems']}"
                )
        elif args.cmd == "index":
            from flink_bm25_spark.api import Bm25Index  # noqa: PLC0415
            from flink_bm25_spark.operators import serving  # noqa: PLC0415
            from flink_bm25_spark.sources.tables import (  # noqa: PLC0415
                load_documents,
            )

            if args.action in ("create", "add", "upsert") and not args.input:
                print(
                    "--input is required for create/add/upsert",
                    file=sys.stderr,
                )
                return 2
            if args.action == "create":
                docs = load_documents(spark, args.input)
                serving.bm25_index_save(
                    docs, args.path, n_buckets=args.n_buckets,
                    hot_df_cap=args.hot_df_cap, forward=args.forward,
                )
                print(f"index -> {args.path}", file=sys.stderr)
            elif args.action == "add":
                serving.bm25_index_add(
                    load_documents(spark, args.input), args.path,
                    hot_df_cap=args.hot_df_cap,
                )
                print(f"batch added -> {args.path}", file=sys.stderr)
            elif args.action == "upsert":
                serving.bm25_index_upsert(
                    load_documents(spark, args.input), args.path,
                    hot_df_cap=args.hot_df_cap,
                )
                print(f"batch upserted -> {args.path}", file=sys.stderr)
            elif args.action == "delete":
                if not args.doc_ids:
                    print("--doc-ids is required for delete", file=sys.stderr)
                    return 2
                ids = [int(x) for x in args.doc_ids.split(",") if x.strip()]
                serving.bm25_index_delete(spark, args.path, ids)
                print(f"tombstoned {len(ids)} ids", file=sys.stderr)
            elif args.action == "search":
                if not args.query:
                    print("--query is required for search", file=sys.stderr)
                    return 2
                out = Bm25Index(spark, args.path).search(
                    args.query, k=args.k, version=args.version
                )
                for r in out.collect():
                    print(f"{r['rk']}\t{r['doc_id']}\t{r['score']}")
            elif args.action == "mlt":
                out = serving.more_like_this_from_index(
                    spark, args.path, int(args.doc_id), k=args.k,
                    version=args.version,
                )
                for r in out.collect():
                    print(f"{r['rk']}\t{r['doc_id']}\t{r['sim']}")
            elif args.action == "get":
                rows = serving.doc_vector_from_index(
                    spark, args.path, int(args.doc_id),
                    version=args.version,
                ).collect()
                for r in rows:
                    terms = ",".join(f"{t['word']}:{t['tf']}" for t in r["terms"])
                    print(f"{r['doc_id']}\t{r['dl']}\t{terms}")
                if not rows:
                    return 3
            elif args.action == "compact":
                serving.bm25_index_compact(
                    spark, args.path, hot_df_cap=args.hot_df_cap
                )
                print("compacted", file=sys.stderr)
            elif args.action == "gc":
                n = serving.bm25_index_gc(
                    spark, args.path, grace_seconds=args.grace
                )
                print(f"reclaimed {n} superseded version tree(s)",
                      file=sys.stderr)
            elif args.action == "cdc":
                if not args.input or not args.checkpoint:
                    print(
                        "--input and --checkpoint are required for cdc",
                        file=sys.stderr,
                    )
                    return 2
                from flink_bm25_spark.streaming.index_maintenance import (  # noqa: PLC0415
                    maintain_index_cdc_stream,
                )

                # seq is OPTIONAL (help text contract): hardcoding it
                # into the stream schema over an input without the
                # column would read all-null seq — max_by ignores null
                # ordering keys, the dedupe yields a null struct, and
                # null op matches NEITHER leg: every event silently
                # dropped while the command reports success.  Probe the
                # actual file schema and include seq only when present
                # (absent -> the loop's deterministic struct fallback).
                present = {
                    f.name for f in spark.read.parquet(args.input).schema
                }
                schema = "op string, doc_id long, text string"
                if "seq" in present:
                    schema += ", seq long"
                stream = (
                    spark.readStream.schema(schema)
                    .option("maxFilesPerTrigger", 1)
                    .parquet(args.input)
                )
                maintain_index_cdc_stream(
                    stream,
                    args.path,
                    args.checkpoint,
                    compact_every=args.compact_every,
                    compact_tombstones=args.compact_tombstones,
                    hot_df_cap=args.hot_df_cap,
                )
                print("cdc stream drained", file=sys.stderr)
            elif args.action == "stats":
                rows = serving.bm25_index_stats(
                    spark, args.path, version=args.version
                ).collect()
                for r in rows:
                    print(
                        f"{r['bucket']}\t{r['n_batches']}\t{r['n_files']}\t"
                        f"{r['n_postings']}\t{r['n_terms']}\t"
                        f"{r['n_hot_terms']}\t{r['n_tombstoned']}"
                    )
            elif args.action == "snapshot":
                v = serving.bm25_index_snapshot(
                    spark, args.path, hot_df_cap=args.hot_df_cap
                )
                print(v)
            elif args.action == "versions":
                for r in serving.bm25_index_versions(spark, args.path).collect():
                    print(
                        f"{r['version']}\t{int(r['current'])}\t"
                        f"{int(r['pinned'])}\t{int(r['readable'])}"
                    )
            elif args.action == "pin":
                print(serving.bm25_index_pin(
                    spark, args.path, version=args.version
                ))
            elif args.action == "unpin":
                if args.version is None:
                    print("--version is required for unpin", file=sys.stderr)
                    return 2
                serving.bm25_index_unpin(spark, args.path, args.version)
                print("unpinned", file=sys.stderr)
        elif args.cmd == "ivf":
            import os  # noqa: PLC0415

            from flink_bm25_spark.operators import similarity  # noqa: PLC0415

            def load_vectors(path):
                src_p = os.path.join(path, "embeddings.parquet")
                if not os.path.exists(src_p):
                    src_p = path
                return spark.read.parquet(src_p).select("vec_id", "embedding")

            if args.action in ("create", "add", "upsert", "cdc") and not args.input:
                print("--input is required for create/add/upsert/cdc",
                      file=sys.stderr)
                return 2
            if args.action == "create":
                model, assigned = similarity.ivf_build(
                    load_vectors(args.input), n_cells=args.n_cells or 16,
                    seed=args.seed,
                )
                similarity.ivf_save(model, assigned, args.path)
                print(f"ivf index -> {args.path}", file=sys.stderr)
            elif args.action == "add":
                similarity.ivf_add(spark, args.path, load_vectors(args.input))
                print(f"batch added -> {args.path}", file=sys.stderr)
            elif args.action == "upsert":
                similarity.ivf_upsert(
                    spark, args.path, load_vectors(args.input)
                )
                print(f"batch upserted -> {args.path}", file=sys.stderr)
            elif args.action == "delete":
                if not args.vec_ids:
                    print("--vec-ids is required for delete", file=sys.stderr)
                    return 2
                ids = [int(x) for x in args.vec_ids.split(",") if x.strip()]
                similarity.ivf_delete(spark, args.path, ids)
                print(f"tombstoned {len(ids)} ids", file=sys.stderr)
            elif args.action == "search":
                if args.query_vec:
                    qvec = [float(x) for x in args.query_vec.split(",")]
                elif args.query_vec_id is not None and args.input:
                    from pyspark.sql import functions as F  # noqa: PLC0415

                    row = (
                        load_vectors(args.input)
                        .where(F.col("vec_id") == args.query_vec_id)
                        .first()
                    )
                    if row is None:
                        print("query vec_id not found in --input",
                              file=sys.stderr)
                        return 3
                    qvec = [float(x) for x in row["embedding"]]
                else:
                    print("--query-vec or (--query-vec-id + --input) is"
                          " required for search", file=sys.stderr)
                    return 2
                out = similarity.ivf_topk_from_disk(
                    spark, args.path, qvec, k=args.k, nprobe=args.nprobe,
                    version=args.version,
                )
                for i, r in enumerate(out.collect(), start=1):
                    print(f"{i}	{r['vec_id']}	{r['cos']}")
            elif args.action == "compact":
                similarity.ivf_compact(spark, args.path)
                print("compacted", file=sys.stderr)
            elif args.action == "gc":
                similarity.ivf_gc(spark, args.path, grace_seconds=args.grace)
                print("gc done", file=sys.stderr)
            elif args.action == "stats":
                r = similarity.ivf_stats(
                    spark, args.path, version=args.version
                ).first()
                print(
                    f"{r['n_cells']}	{r['n_vectors']}	{r['n_stale']}	"
                    f"{r['staleness']:.4f}	{r['n_tombstoned']}"
                )
            elif args.action == "snapshot":
                print(similarity.ivf_snapshot(spark, args.path))
            elif args.action == "versions":
                for r in similarity.ivf_versions(spark, args.path).collect():
                    print(
                        f"{r['version']}\t{int(r['current'])}\t"
                        f"{int(r['pinned'])}\t{int(r['readable'])}"
                    )
            elif args.action == "pin":
                print(similarity.ivf_pin(spark, args.path,
                                         version=args.version))
            elif args.action == "unpin":
                if args.version is None:
                    print("--version is required for unpin", file=sys.stderr)
                    return 2
                similarity.ivf_unpin(spark, args.path, args.version)
                print("unpinned", file=sys.stderr)
            elif args.action == "retrain":
                similarity.ivf_retrain(spark, args.path, n_cells=args.n_cells,
                                       seed=args.seed)
                print("retrained", file=sys.stderr)
            elif args.action == "cdc":
                if not args.checkpoint:
                    print("--checkpoint is required for cdc", file=sys.stderr)
                    return 2
                from flink_bm25_spark.streaming.index_maintenance import (  # noqa: PLC0415
                    maintain_ivf_cdc_stream,
                )

                present = {
                    f.name for f in spark.read.parquet(args.input).schema
                }
                schema = "op string, vec_id long, embedding array<float>"
                if "seq" in present:
                    schema += ", seq long"
                stream = (
                    spark.readStream.schema(schema)
                    .option("maxFilesPerTrigger", 1)
                    .parquet(args.input)
                )
                maintain_ivf_cdc_stream(
                    stream,
                    args.path,
                    args.checkpoint,
                    compact_every=args.compact_every,
                    compact_tombstones=args.compact_tombstones,
                    retrain_staleness=args.retrain_staleness,
                )
                print("cdc stream drained", file=sys.stderr)
        elif args.cmd == "explain":
            import importlib.util  # noqa: PLC0415
            import os  # noqa: PLC0415

            entry_path = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "__spark_entry__.py",
            )
            spec = importlib.util.spec_from_file_location(
                "_entry_explain", entry_path
            )
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            qs = mod.queries()
            if args.query_name not in qs:
                print(f"unknown query {args.query_name!r}; pick one of:",
                      file=sys.stderr)
                print(" ".join(sorted(qs)), file=sys.stderr)
                return 2
            df = qs[args.query_name](spark, args.sf_dir)
            print(
                df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), args.mode
                )
            )
        elif args.cmd == "curate":
            from flink_bm25_spark.operators.cleaning import (  # noqa: PLC0415
                curation_pipeline,
            )
            from flink_bm25_spark.sources.tables import load_documents  # noqa: PLC0415

            out = curation_pipeline(
                load_documents(spark, args.input),
                load_documents(spark, args.benchmark),
                weights=_parse_weights(args.weights),
                budget=args.budget,
            )
            out.write.mode("overwrite").parquet(args.output)
            print(f"curated layout -> {args.output}", file=sys.stderr)
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
