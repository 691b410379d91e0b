"""High-level engine facade — the migration surface for a reference user.

The reference's workflow is: run the jar → TF/DF land in Mongo → a
downstream consumer scores BM25 from those collections.  Here the same
lifecycle is three calls:

    engine = BM25Engine.fit(spark, documents)     # corpus statistics
    engine.search("spark streaming join", k=10)   # ranked DataFrame
    engine.save("/path/stats")                    # durable statistics
    engine = BM25Engine.load(spark, "/path/stats")

``fit`` caches the TF relation (it feeds every downstream surface);
``save``/``load`` persist exactly the statistics the reference
materializes (TF, DF, doc lengths + corpus size), so scoring can run
without re-tokenizing — the Mongo-collections role, on parquet.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_bm25_spark.config import BM25_B, BM25_K1, SHINGLE_SIZE, STOPWORDS
from flink_bm25_spark.operators.bm25 import bm25_rank
from flink_bm25_spark.operators.pipeline import CorpusStats, build_corpus_stats
from flink_bm25_spark.operators.sinks import tf_vectors


def _tokenize_query(query: str, stopwords: tuple[str, ...] = STOPWORDS) -> tuple[str, ...]:
    terms = tuple(
        w for w in query.lower().split() if w and w not in stopwords
    )
    if not terms:
        raise ValueError(f"query {query!r} has no searchable terms")
    return terms


def _write_safe(df, path, compact=False):  # noqa: ANN001 — DataFrame, str
    """Overwrite-safe parquet write: eagerly truncate lineage first so a
    plan that still READS ``path`` (state loaded from the same store it
    is being saved back to) cannot race its own overwrite.  Returns the
    checkpointed frame so callers can keep the truncated lineage.

    ``compact=True`` (r5 verdict item 7) bounds small-file growth for
    APPEND-ONLY union-chain stores (LineScreen lines, WinnowScreen fps,
    EmbeddingDeduper keys): each batch appends a delta's partitions, so
    after many batches the store is hundreds of tiny files.  When the
    partition count exceeds 2× the cluster's default parallelism, the
    store is coalesced (narrow, no shuffle) to
    ``max(defaultParallelism, rows / 2M)`` — parallelism-floor for
    small stores, ~2M rows (≈ one comfortable parquet file) per
    partition for large ones, so at 100 TB compaction keeps file sizes
    sane instead of collapsing the store onto a handful of writers."""
    out = df.localCheckpoint(eager=True)
    if compact:
        n_parts = out.rdd.getNumPartitions()
        floor_parts = out.sparkSession.sparkContext.defaultParallelism
        if n_parts > 2 * floor_parts:
            target = max(floor_parts, out.count() // 2_000_000 + 1)
            if target < n_parts:
                out = out.coalesce(int(target))
    out.write.mode("overwrite").parquet(path)
    return out


class BM25Engine:
    """Fitted BM25 statistics + search over them."""

    def __init__(self, stats: CorpusStats, k1: float = BM25_K1, b: float = BM25_B):
        self.stats = stats
        self.k1 = k1
        self.b = b

    # -- lifecycle ---------------------------------------------------------

    @classmethod
    def fit(
        cls,
        documents: DataFrame,
        k1: float = BM25_K1,
        b: float = BM25_B,
        pos_filter: bool = False,
    ) -> "BM25Engine":
        """``pos_filter=True`` restricts every statistic to noun-family
        non-stopword tokens — the reference's full fused predicate
        (``BatchBM25PreMain.java:38-48,191``)."""
        return cls(
            build_corpus_stats(documents, cache_tf=True, pos_filter=pos_filter),
            k1=k1,
            b=b,
        )

    def save(self, path: str) -> None:
        """Persist the sufficient statistics (the reference's tf5/idf4
        collections, as parquet)."""
        self.stats.tf = _write_safe(self.stats.tf, os.path.join(path, "tf"))
        self.stats.df_stats = _write_safe(
            self.stats.df_stats, os.path.join(path, "df")
        )
        self.stats.dlen = _write_safe(
            self.stats.dlen, os.path.join(path, "dlen")
        )
        # idf_stats is a cached_property derived from the PRE-overwrite
        # df_stats plan; drop it so the next access rebuilds over the
        # checkpointed relation instead of the deleted part files
        self.stats.__dict__.pop("idf_stats", None)
        meta = {"n_docs": self.stats.n_docs, "k1": self.k1, "b": self.b}
        spark = self.stats.tf.sparkSession
        spark.createDataFrame([meta]).coalesce(1).write.mode("overwrite").json(
            os.path.join(path, "meta")
        )

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "BM25Engine":
        meta = json.loads(
            spark.read.text(os.path.join(path, "meta")).first()["value"]
        )
        tf = spark.read.parquet(os.path.join(path, "tf"))
        stats = CorpusStats(
            documents=None,
            tokens=None,
            tf=tf,
            dlen=spark.read.parquet(os.path.join(path, "dlen")),
            df_stats=spark.read.parquet(os.path.join(path, "df")),
        )
        stats.n_docs = int(meta["n_docs"])  # pre-seed the cached property
        eng = cls(stats, k1=float(meta["k1"]), b=float(meta["b"]))
        return eng

    def update(self, new_documents: DataFrame) -> "BM25Engine":
        """Fold a batch of NEW documents into the fitted statistics —
        O(batch) work, the old corpus is never re-tokenized (the
        reference's incremental ``$inc`` flow, corpus-at-once).  Returns a
        new engine; the caller's contract is that ``new_documents`` carries
        previously-unseen ``doc_id``\\s."""
        from flink_bm25_spark.operators.pipeline import merge_corpus_stats  # noqa: PLC0415

        return BM25Engine(
            merge_corpus_stats(self.stats, new_documents), k1=self.k1, b=self.b
        )

    # -- query surface -----------------------------------------------------

    def search(self, query: str, k: int = 10) -> DataFrame:
        """``(doc_id, score, rk)`` — BM25 top-k for a free-text query."""
        terms = _tokenize_query(query)
        return bm25_rank(
            self.stats.tf,
            self.stats.idf_stats,
            self.stats.dlen,
            terms,
            k=k,
            k1=self.k1,
            b=self.b,
        )

    def term_stats(self, *words: str) -> DataFrame:
        """``(word, df, idf)`` for given terms (broadcastable dictionary)."""
        out = self.stats.idf_stats
        if words:
            out = out.where(F.col("word").isin(*words))
        return out

    def doc_vectors(self, k: int | None = 30) -> DataFrame:
        """The reference's nested sink shape: ``(doc_id, tf:[{w,c}])``."""
        return tf_vectors(self.stats.tf, k=k)


class CorpusCurator:
    """Incremental corpus curation — the operational loop around the
    curation operators: state is a MinHash signature store plus the
    benchmark gram set (and, with ``line_screen=True``, the archive of
    every content line ever ingested), all plain parquet relations.

        curator = CorpusCurator.fit(benchmark)        # empty store
        good1 = curator.curate_batch(day1_docs)       # survivors, state grows
        good2 = curator.curate_batch(day2_docs)       # dedups vs day1 too
        curator.save("/state"); CorpusCurator.load(spark, "/state")

    Per batch, O(batch + candidates) work (``dedup.py::
    minhash_dedup_pairs_incremental``): the archive is only ever touched
    through its signature store.  Dedup policy is greedy-stream,
    FIRST-ARRIVAL wins: a new document is dropped when it
    near-duplicates ANYTHING already ingested (an emitted survivor can
    never be retracted, so arrival order — not id order — decides);
    within one batch, ties fall to the lower id.  Replaying the same
    batch sequence reproduces the same survivors.
    """

    def __init__(
        self,
        eval_grams: DataFrame,
        sigs_wide: DataFrame | None = None,
        min_keep_score: float = 0.2,
        jaccard_threshold: float = 0.8,
        min_overlap: int = 3,
        decontam_n: int = SHINGLE_SIZE,
        line_screen: bool = False,
    ):
        self.eval_grams = eval_grams
        self.sigs_wide = sigs_wide
        self.min_keep_score = min_keep_score
        self.jaccard_threshold = jaccard_threshold
        self.min_overlap = min_overlap
        # Opt-in CCNet step-1 stage (DEPLOY.md intake order: line dedup
        # runs BEFORE any quality statistic, or boilerplate dominates
        # every ratio).  When enabled, every batch is line-screened
        # against the archive of all lines ever ingested FIRST; quality,
        # decontamination, and the MinHash signatures all see the
        # line-deduped text, and survivors carry the drop-ledger columns
        # ``n_lines``/``n_kept`` (lines removed = n_lines - n_kept).
        self.line_screen: LineScreen | None = (
            LineScreen() if line_screen else None
        )
        # Shingle width shared by BOTH decontamination sides: ``fit``
        # builds eval_grams at this n, ``curate_batch`` probes at the
        # same n — widths must agree or overlap is identically zero.
        self.decontam_n = decontam_n
        # Archive handle for verify-stage re-shingling (candidate docs
        # only — a semi-join prunes it before tokenization; at scale this
        # is the corpus table, scanned selectively, never re-signed).
        self._docs: DataFrame | None = None

    @classmethod
    def fit(
        cls, benchmark: DataFrame, decontam_n: int = SHINGLE_SIZE, **kw
    ) -> "CorpusCurator":
        from flink_bm25_spark.operators.dedup import shingles  # noqa: PLC0415

        return cls(
            shingles(benchmark, n=decontam_n).select("gram").distinct(),
            decontam_n=decontam_n,
            **kw,
        )

    def curate_batch(self, new_documents: DataFrame) -> DataFrame:
        """Quality + decontamination + near-dup screening of one batch
        against everything already ingested; returns the surviving rows
        of ``new_documents`` and extends the signature store (with ALL
        batch signatures — a dropped document's future duplicates must
        still match it).

        With ``line_screen=True``, the batch's text is first line-deduped
        against the archive of every line ever ingested (first-arrival
        wins, across batches); every downstream statistic — quality,
        decontamination overlap, MinHash signatures — then sees the
        line-deduped text, and the surviving rows carry
        ``n_lines``/``n_kept`` so the drop ledger can account for
        removed lines per document."""
        from flink_bm25_spark.operators.decontam import overlap_counts  # noqa: PLC0415
        from flink_bm25_spark.operators.dedup import (  # noqa: PLC0415
            minhash_dedup_pairs_incremental,
            minhash_signatures_wide,
            shingles,
        )
        from flink_bm25_spark.operators.text_analysis import quality_scores  # noqa: PLC0415

        if self.line_screen is not None:
            # every non-text column rides the line screen's n_lines
            # spine (carry) — no doc-keyed rejoin of the batch (r6)
            others = tuple(
                c for c in new_documents.columns if c not in ("doc_id", "text")
            )
            new_documents = self.line_screen.screen_batch(
                new_documents, carry=others
            ).withColumnRenamed("cleaned_text", "text")
        if self.sigs_wide is None:
            empty = new_documents.where(F.lit(False))
            pairs = minhash_dedup_pairs_incremental(
                empty, new_documents, threshold=self.jaccard_threshold
            )
        else:
            # Candidate generation probes the signature store (archive
            # never re-signed); exact-Jaccard verify re-shingles only the
            # archive docs that land in a candidate pair.  A curator can
            # legitimately hold signatures without the archive text (e.g.
            # constructed from a bare signature store): verify then runs
            # against an empty archive rather than dereferencing None.
            archive = (
                self._docs
                if self._docs is not None
                else new_documents.where(F.lit(False))
            )
            pairs = minhash_dedup_pairs_incremental(
                archive,
                new_documents,
                old_sigs_wide=self.sigs_wide,
                threshold=self.jaccard_threshold,
            )
        from flink_bm25_spark.operators.dedup import first_arrival_losers  # noqa: PLC0415

        losers = first_arrival_losers(pairs, new_documents.select("doc_id"))
        qual = quality_scores(new_documents).select("doc_id", "keep_score")
        contaminated = (
            overlap_counts(new_documents, self.eval_grams, n=self.decontam_n)
            .where(F.col("n_overlap") >= self.min_overlap)
            .select("doc_id")
        )
        survivors = (
            new_documents.join(
                qual.where(F.col("keep_score") >= self.min_keep_score).select(
                    "doc_id"
                ),
                "doc_id",
            )
            .join(contaminated, "doc_id", "left_anti")
            .join(losers, "doc_id", "left_anti")
        )
        new_sigs = minhash_signatures_wide(shingles(new_documents))
        self.sigs_wide = (
            new_sigs
            if self.sigs_wide is None
            else self.sigs_wide.unionByName(new_sigs)
        )
        self._docs = (
            new_documents
            if self._docs is None
            else self._docs.unionByName(new_documents)
        )
        return survivors

    def save(self, path: str) -> None:
        import shutil  # noqa: PLC0415

        self.eval_grams = _write_safe(
            self.eval_grams, os.path.join(path, "eval_grams")
        )
        # Stale subdirs from an earlier save are removed when the matching
        # in-memory state is None — otherwise a later ``load`` would
        # reconstruct an inconsistent curator (e.g. signatures without the
        # archive they were built from).
        for name, attr in (("sigs", "sigs_wide"), ("docs", "_docs")):
            sub = os.path.join(path, name)
            state = getattr(self, attr)
            if state is not None:
                setattr(self, attr, _write_safe(state, sub))
            elif os.path.exists(sub):
                shutil.rmtree(sub)
        lines_sub = os.path.join(path, "lines")
        if self.line_screen is not None and self.line_screen.lines is not None:
            self.line_screen.save(path)  # writes ``path/lines``
        elif os.path.exists(lines_sub):
            shutil.rmtree(lines_sub)

    def checkpoint_state(self, path: str) -> None:
        """Truncate state lineage, then persist: after many batches the
        in-memory signature store / archive handle are union-chains whose
        plan depth grows with batch count.  An EAGER ``localCheckpoint``
        materializes them and cuts the lineage to a flat block scan (the
        same stage-checkpoint pattern as the connected-components loop),
        so a long-running ingest stays O(1) in plan size per batch — and
        because the data is materialized BEFORE the write, ``save`` can
        safely overwrite the very parquet a previous ``load`` read from
        (an overwrite of a path still feeding the plan would lose data).
        """
        # eval_grams included: a curator loaded FROM ``path`` still reads
        # these parquet files lazily — overwriting them mid-plan loses data
        self.eval_grams = self.eval_grams.localCheckpoint(eager=True)
        if self.sigs_wide is not None:
            self.sigs_wide = self.sigs_wide.localCheckpoint(eager=True)
        if self._docs is not None:
            self._docs = self._docs.localCheckpoint(eager=True)
        if self.line_screen is not None and self.line_screen.lines is not None:
            self.line_screen.lines = self.line_screen.lines.localCheckpoint(
                eager=True
            )
        self.save(path)

    @classmethod
    def load(cls, spark: SparkSession, path: str, **kw) -> "CorpusCurator":
        cur = cls(spark.read.parquet(os.path.join(path, "eval_grams")), **kw)
        sig_path = os.path.join(path, "sigs")
        if os.path.exists(sig_path):
            cur.sigs_wide = spark.read.parquet(sig_path)
        docs_path = os.path.join(path, "docs")
        if os.path.exists(docs_path):
            cur._docs = spark.read.parquet(docs_path)
        lines_path = os.path.join(path, "lines")
        if os.path.exists(lines_path):
            # a persisted line store implies the stage was enabled —
            # reconstruct it regardless of the ``line_screen`` kwarg
            cur.line_screen = LineScreen(spark.read.parquet(lines_path))
        return cur


class EmbeddingDeduper:
    """Incremental SemDeDup-style screening — the embedding analog of
    :class:`CorpusCurator`: state is a persisted sign-LSH band-key store
    (vector + norm + band keys, ``similarity.embedding_band_store``), so
    each batch is screened against EVERYTHING already ingested in
    O(batch + candidates), the archive never re-keyed.

        dd = EmbeddingDeduper(threshold=0.95)
        keep1 = dd.screen_batch(day1_vectors)     # survivors, store grows
        keep2 = dd.screen_batch(day2_vectors)     # dedups vs day1 too
        dd.save("/state"); EmbeddingDeduper.load(spark, "/state")

    Dedup policy is greedy-stream FIRST-ARRIVAL wins (same contract as
    the curator): a new vector is dropped when its cosine to ANYTHING
    already ingested reaches the threshold; within one batch, ties fall
    to the lower vec_id.  Replaying the same batch sequence reproduces
    the same survivors.
    """

    def __init__(
        self,
        keys_wide: DataFrame | None = None,
        threshold: float = 0.9,
        bands: int = 12,
        bits_per_band: int = 6,
        dim: int = 64,
        nnz: int = 8,
    ):
        self.keys_wide = keys_wide
        self.threshold = threshold
        self.bands = bands
        self.bits_per_band = bits_per_band
        self.dim = dim
        self.nnz = nnz

    def screen_batch(self, new_vectors: DataFrame) -> DataFrame:
        """Survivors of ``new_vectors`` vs the archive + each other; the
        key store grows by ALL batch keys (a dropped vector's future
        duplicates must still match it)."""
        from flink_bm25_spark.operators.dedup import first_arrival_losers  # noqa: PLC0415
        from flink_bm25_spark.operators.similarity import (  # noqa: PLC0415
            embedding_near_dup_pairs_incremental,
        )

        pairs, new_keys = embedding_near_dup_pairs_incremental(
            self.keys_wide,
            new_vectors,
            threshold=self.threshold,
            bands=self.bands,
            bits_per_band=self.bits_per_band,
            dim=self.dim,
            nnz=self.nnz,
        )
        losers = first_arrival_losers(
            pairs.select("d1", "d2"), new_vectors.select("vec_id")
        )
        survivors = new_vectors.join(losers, "vec_id", "left_anti")
        self.keys_wide = (
            new_keys
            if self.keys_wide is None
            else self.keys_wide.unionByName(new_keys)
        )
        return survivors

    def save(self, path: str) -> None:
        import shutil  # noqa: PLC0415

        sub = os.path.join(path, "keys")
        if self.keys_wide is not None:
            self.keys_wide = _write_safe(self.keys_wide, sub, compact=True)
        elif os.path.exists(sub):
            shutil.rmtree(sub)

    def checkpoint_state(self, path: str) -> None:
        """Eager lineage truncation + persist (same stage-checkpoint
        rationale as ``CorpusCurator.checkpoint_state``: the store is a
        union-chain whose plan depth grows per batch, and the overwrite
        must not race the plan still reading the old files)."""
        if self.keys_wide is not None:
            self.keys_wide = self.keys_wide.localCheckpoint(eager=True)
        self.save(path)

    @classmethod
    def load(cls, spark: SparkSession, path: str, **kw) -> "EmbeddingDeduper":
        dd = cls(**kw)
        keys_path = os.path.join(path, "keys")
        if os.path.exists(keys_path):
            dd.keys_wide = spark.read.parquet(keys_path)
        return dd


class WinnowScreen:
    """Incremental copy-detection screening — the WINNOWING analog of
    :class:`EmbeddingDeduper`: state is the persisted ``(doc_id, fp)``
    fingerprint relation, so each batch is screened against everything
    already ingested in O(batch + candidates) and the archive text is
    never re-read (``dedup.winnowing_pairs_incremental``).

        ws = WinnowScreen(min_shared=2)
        keep1 = ws.screen_batch(day1_docs)      # survivors, store grows
        keep2 = ws.screen_batch(day2_docs)      # screens vs day1 too
        ws.save("/state"); WinnowScreen.load(spark, "/state")

    Dedup policy is greedy-stream FIRST-ARRIVAL wins (same contract as
    the curator and the embedding deduper); the store keeps ALL batch
    fingerprints — a dropped document's future copies must still match
    it.  Boilerplate fingerprints are re-capped against the whole store
    each batch, so a fingerprint that becomes ubiquitous stops pairing
    exactly as in a full rebuild.
    """

    def __init__(
        self,
        fps: DataFrame | None = None,
        min_shared: int = 2,
        k: int = 3,
        w: int = 4,
        max_fp_doc_freq: int = 50,
    ):
        self.fps = fps
        self.min_shared = min_shared
        self.k = k
        self.w = w
        self.max_fp_doc_freq = max_fp_doc_freq

    def screen_batch(self, new_documents: DataFrame) -> DataFrame:
        from flink_bm25_spark.operators.dedup import (  # noqa: PLC0415
            first_arrival_losers,
            winnowing_pairs_incremental,
        )

        store = self.fps
        if store is None:
            store = new_documents.sparkSession.createDataFrame(
                [], "doc_id long, fp long"
            )
        pairs, new_fps = winnowing_pairs_incremental(
            store,
            new_documents,
            min_shared=self.min_shared,
            k=self.k,
            w=self.w,
            max_fp_doc_freq=self.max_fp_doc_freq,
        )
        losers = first_arrival_losers(
            pairs.select("d1", "d2"), new_documents.select("doc_id")
        )
        survivors = new_documents.join(losers, "doc_id", "left_anti")
        self.fps = (
            new_fps if self.fps is None else self.fps.unionByName(new_fps)
        )
        return survivors

    def save(self, path: str) -> None:
        import shutil  # noqa: PLC0415

        sub = os.path.join(path, "fps")
        if self.fps is not None:
            self.fps = _write_safe(self.fps, sub, compact=True)
        elif os.path.exists(sub):
            shutil.rmtree(sub)

    def checkpoint_state(self, path: str) -> None:
        """Eager lineage truncation + persist (union-chain plan depth
        grows per batch; the overwrite must not race readers)."""
        if self.fps is not None:
            self.fps = self.fps.localCheckpoint(eager=True)
        self.save(path)

    @classmethod
    def load(cls, spark: SparkSession, path: str, **kw) -> "WinnowScreen":
        ws = cls(**kw)
        fps_path = os.path.join(path, "fps")
        if os.path.exists(fps_path):
            ws.fps = spark.read.parquet(fps_path)
        return ws


class QuantileTracker:
    """Incremental distribution monitor — the streaming/batch-loop twin of
    the KMV quantile sketch (:mod:`flink_bm25_spark.operators.sketches`):
    state is one bottom-k row sample per group, merged batch-by-batch
    under the sketch's exact merge law, so after ANY batch sequence the
    store equals a full rebuild over everything ingested (pinned by
    test).  The per-source quality-drift monitor a continuous curation
    loop watches.

        qt = QuantileTracker(k=256)
        qt.update_batch(day1, "lang", "keep_score", "doc_id")
        qt.update_batch(day2, "lang", "keep_score", "doc_id")
        qt.quantiles([0.5, 0.9]).show()          # (lang, q, est)
        qt.save("/state"); QuantileTracker.load(spark, "/state", k=256)

    State is O(groups × k) rows forever — merging never grows it — and
    ``orderBy + limit`` (illegal on a streaming DataFrame) only ever
    runs on bounded relations, which is what makes this loop the
    correct Structured-Streaming form (drive it from ``foreachBatch``,
    same as :class:`CorpusCurator`).
    """

    def __init__(self, sketch: DataFrame | None = None, k: int = 256):
        self.sketch = sketch
        self.k = k
        self._cfg: tuple | None = None

    def update_batch(
        self,
        batch: DataFrame,
        group_col: str,
        value_col: str,
        key_col: str,
        seed: str = "kmv:0",
    ) -> None:
        from pyspark.sql import Window  # noqa: PLC0415

        from flink_bm25_spark.operators.sketches import kmv_sketch_by  # noqa: PLC0415

        cfg = (group_col, value_col, key_col, seed)
        if self._cfg is None:
            self._cfg = cfg
        elif self._cfg != cfg:
            raise ValueError(
                f"QuantileTracker was built with {self._cfg}; mixing in "
                f"batches keyed {cfg} would merge incomparable samples"
            )
        new = kmv_sketch_by(
            batch, group_col, value_col, key_col, k=self.k, seed=seed
        ).withColumnRenamed(group_col, "grp")
        merged = new if self.sketch is None else self.sketch.unionByName(new)
        # dropDuplicates BEFORE the k-cut: an at-least-once redelivery
        # re-unions rows already in the store, and a duplicated (key)
        # would displace a legitimate sample row — dedup makes re-ingest
        # a no-op (redelivery-safe, same contract as the curator).
        w = Window.partitionBy("grp").orderBy(F.asc("hk"), F.asc("key"))
        self.sketch = (
            merged.dropDuplicates(["grp", "key"])
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= self.k)
            .drop("_rn")
        )

    def quantiles(self, qs: list[float]) -> DataFrame:
        from flink_bm25_spark.operators.sketches import kmv_quantiles_by  # noqa: PLC0415

        if self.sketch is None:
            raise ValueError("no batches ingested yet")
        return kmv_quantiles_by(self.sketch, "grp", qs)

    def checkpoint_state(self, path: str) -> None:
        """Eager lineage truncation + persist — the union-chain plan
        depth grows per batch (same rationale as the other trackers)."""
        if self.sketch is not None:
            self.sketch = self.sketch.localCheckpoint(eager=True)
        self.save(path)

    def save(self, path: str) -> None:
        if self.sketch is not None:
            self.sketch = _write_safe(self.sketch, os.path.join(path, "kmv"))
        # The (group, value, key, seed) tuple AND k are part of the
        # state: without them, a restarted process could merge a batch
        # sketched under a different configuration — or re-cut the
        # restored sample at a different k, which is no longer the
        # bottom-k of everything ingested — with no error.
        import json  # noqa: PLC0415

        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "cfg.json"), "w") as f:
            json.dump(
                {
                    "cfg": list(self._cfg) if self._cfg is not None else None,
                    "k": self.k,
                },
                f,
            )

    @classmethod
    def load(
        cls, spark: SparkSession, path: str, k: int | None = None
    ) -> "QuantileTracker":
        """Restore a saved tracker.  ``k`` is taken from the saved state;
        passing a conflicting explicit ``k`` raises (a restored bottom-k
        sample is only the bottom-k of history at ITS OWN k — re-cutting
        at a larger k would silently bias every later quantile)."""
        import json  # noqa: PLC0415

        saved_k = None
        saved_cfg = None
        cfg_path = os.path.join(path, "cfg.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                state = json.load(f)
            if isinstance(state, dict):
                saved_k = state.get("k")
                saved_cfg = state.get("cfg")
            else:  # pre-k state file: a bare [group, value, key, seed] list
                saved_cfg = state
        if k is not None and saved_k is not None and k != saved_k:
            raise ValueError(
                f"QuantileTracker state at {path} was built with k={saved_k}; "
                f"loading it at k={k} would re-cut an incomparable sample"
            )
        qt = cls(k=k if k is not None else (saved_k or 256))
        sub = os.path.join(path, "kmv")
        if os.path.exists(sub):
            qt.sketch = spark.read.parquet(sub)
        if saved_cfg is not None:
            qt._cfg = tuple(saved_cfg)
        return qt


class LineScreen:
    """Incremental CCNet step-1 line dedup — the line-level analog of
    :class:`WinnowScreen`: state is the persisted relation of every
    content line ever ingested, so each batch is cleaned against the
    whole archive in O(batch + one anti-join) and archived text is
    never re-read (``dedup.line_dedup_incremental``).

        ls = LineScreen()
        clean1 = ls.screen_batch(day1_docs)   # within-batch + archive dedup
        clean2 = ls.screen_batch(day2_docs)   # day1's lines now boilerplate
        ls.save("/state"); LineScreen.load(spark, "/state")

    First-arrival wins (the curator contract): a redelivered batch
    comes back with ``n_kept = 0`` everywhere — its lines are already
    archived.  Equals a full :func:`~flink_bm25_spark.operators.dedup.
    line_dedup` rebuild whenever batch order agrees with doc_id order.
    """

    def __init__(
        self,
        lines: DataFrame | None = None,
        text_col: str = "text",
        sep: str = "\n",
    ):
        self.lines = lines
        self.text_col = text_col
        self.sep = sep

    def screen_batch(
        self, new_documents: DataFrame, carry: tuple[str, ...] = ()
    ) -> DataFrame:
        from flink_bm25_spark.operators.dedup import (  # noqa: PLC0415
            line_dedup_incremental,
        )

        store = self.lines
        if store is None:
            store = new_documents.sparkSession.createDataFrame(
                [], "line string"
            )
        cleaned, new_store = line_dedup_incremental(
            store, new_documents, self.text_col, self.sep, carry
        )
        # new_store is the UNSEEN delta — dupe-free against the archive
        # by construction — so store maintenance is a true append: the
        # archive is never re-keyed or re-distinct'd.
        self.lines = (
            new_store
            if self.lines is None
            else self.lines.unionByName(new_store)
        )
        return cleaned

    def save(self, path: str) -> None:
        if self.lines is not None:
            self.lines = _write_safe(
                self.lines, os.path.join(path, "lines"), compact=True
            )

    def checkpoint_state(self, path: str) -> None:
        """Eager lineage truncation + persist (union-chain depth grows
        per batch; the overwrite must not race the old plan)."""
        if self.lines is not None:
            self.lines = self.lines.localCheckpoint(eager=True)
        self.save(path)

    @classmethod
    def load(cls, spark: SparkSession, path: str, **kw) -> "LineScreen":
        ls = cls(**kw)
        sub = os.path.join(path, "lines")
        if os.path.exists(sub):
            ls.lines = spark.read.parquet(sub)
        return ls


class WebIntakeScreen:
    """CCNet's PRODUCTION shape of the web-intake chain (Wenzek et al.
    2020 run it this way over every CommonCrawl snapshot): the per-group
    LM and the bucket/gate operating points are fitted ONCE on a
    reference corpus and then FROZEN — every ingest batch is scored
    against the same static model, so results are reproducible across
    batches and the thresholds never drift with the feed.  Contrast
    :func:`~flink_bm25_spark.operators.cleaning.web_intake_pipeline`,
    which is the corpus-relative batch form (train and cut on the corpus
    being cleaned).

        screen = WebIntakeScreen.fit(reference_docs)     # train + cuts
        good1 = screen.screen_batch(day1_docs)           # fixed model
        good2 = screen.screen_batch(day2_docs)           # day1 lines now boilerplate
        screen.save("/state"); WebIntakeScreen.load(spark, "/state")

    Per batch: strip_markup (map-side) → incremental line dedup against
    the cross-batch archive (the ONLY mutable state) → lm_score against
    the frozen model (co-keyed (group, w1, w2) join, streaming-legal) →
    head/middle/tail by the frozen per-group nll terciles → quality gate
    at the frozen per-group keep_score cut.  Output, one row per
    SURVIVOR: ``(doc_id, by_col, cleaned_text, n_lines, n_kept, nll,
    bucket, keep_score)``.

    Degradation contract: a document with NO bigram known to the model
    (out-of-domain text) has ``nll`` null and lands in ``tail`` — high
    perplexity is the correct reading of "the reference LM has never
    seen this".  A GROUP absent from the reference has no operating
    points; its docs bucket ``tail`` and gate against the global
    fallback cut.  ``fit(backoff=True)`` refines the partial case:
    unseen bigrams score CCNet's own add-α smoothing
    (``lm_score_backoff``) instead of being skipped, so a half-OOD doc
    ranks between in-domain and fully-OOD rather than on its known
    subset only; only the no-group case still yields null ``nll``.
    """

    def __init__(
        self,
        model: DataFrame,
        nll_cuts: DataFrame,
        score_cuts: DataFrame,
        global_score_cut: float,
        by_col: str = "lang",
        text_col: str = "text",
        sep: str = "\n",
        contexts: DataFrame | None = None,
        defaults: DataFrame | None = None,
    ):
        self.model = model              # (by, w1, w2, nl) — frozen
        self.nll_cuts = nll_cuts        # (by, nll_c1, nll_c2) — frozen
        self.score_cuts = score_cuts    # (by, score_cut) — frozen
        # backoff relations (both or neither; see fit(backoff=True)):
        self.contexts = contexts        # (by, w1, nl0) — frozen
        self.defaults = defaults        # (by, nl_oov) — frozen
        self.global_score_cut = global_score_cut
        self.by_col = by_col
        self.text_col = text_col
        self.sep = sep
        self._lines = LineScreen(text_col=text_col, sep=sep)

    @classmethod
    def fit(
        cls,
        reference: DataFrame,
        by_col: str = "lang",
        alpha: float = 0.1,
        cuts: tuple[float, float] = (1.0 / 3, 2.0 / 3),
        quality_cutoff: float = 0.75,
        text_col: str = "text",
        sep: str = "\n",
        backoff: bool = False,
    ) -> "WebIntakeScreen":
        """Train the per-group LM on ``reference`` and freeze the
        operating points: per-group nll tercile boundaries (exact
        interpolated percentiles — these are thresholds, not ranks) and
        the per-group quality cut at ``quality_cutoff``, plus a global
        fallback cut for groups the reference has never seen.

        ``backoff=True`` (r5 verdict item 4) additionally freezes the
        add-α backoff relations (``lm_fit_backoff_by``), so
        ``screen_batch`` scores EVERY bigram of every future doc — a
        partially out-of-domain page pays ``-ln(α/(c1+αV))`` /
        ``ln(V)`` for its unknown half instead of scoring on its known
        subset only.  The operating points are unchanged: on the
        reference corpus itself every bigram is model-known, so the
        two scorers agree exactly there."""
        from flink_bm25_spark.operators.text_analysis import (  # noqa: PLC0415
            lm_fit_backoff_by,
            lm_fit_by,
            lm_score,
            quality_scores,
        )

        contexts = defaults = None
        if backoff:
            model, contexts, defaults = lm_fit_backoff_by(
                reference, by_col, alpha
            )
        else:
            model = lm_fit_by(reference, by_col, alpha)
        scored = lm_score(reference, model, group_cols=[by_col])
        nll_cuts = scored.groupBy(by_col).agg(
            F.round(F.percentile("nll", F.lit(cuts[0])), 6).alias("nll_c1"),
            F.round(F.percentile("nll", F.lit(cuts[1])), 6).alias("nll_c2"),
        )
        qual = quality_scores(reference).select("doc_id", "keep_score").join(
            reference.select("doc_id", by_col), "doc_id"
        )
        score_cuts = qual.groupBy(by_col).agg(
            F.round(
                F.percentile("keep_score", F.lit(quality_cutoff)), 6
            ).alias("score_cut")
        )
        row = qual.agg(
            F.round(
                F.percentile("keep_score", F.lit(quality_cutoff)), 6
            ).alias("g")
        ).first()
        return cls(
            model,
            nll_cuts,
            score_cuts,
            float(row["g"]) if row["g"] is not None else 0.0,
            by_col=by_col,
            text_col=text_col,
            sep=sep,
            contexts=contexts,
            defaults=defaults,
        )

    def screen_batch(self, new_documents: DataFrame) -> DataFrame:
        from flink_bm25_spark.functions.text import strip_markup  # noqa: PLC0415
        from flink_bm25_spark.operators.text_analysis import (  # noqa: PLC0415
            lm_score,
            lm_score_backoff,
            quality_scores,
        )

        by, tc = self.by_col, self.text_col
        stripped = new_documents.select(
            "doc_id",
            by,
            strip_markup(F.col(tc), keep_line_breaks=True).alias(tc),
        )
        # the group key rides the line screen's n_lines spine (carry) —
        # no doc-keyed join to re-attach it (r6)
        docs = self._lines.screen_batch(
            stripped, carry=(by,)
        ).withColumnRenamed("cleaned_text", tc)
        # left joins everywhere below: a doc with no model-known bigram
        # (nll null) or an unseen group (cut nulls) must surface, not
        # silently vanish — the degradation contract routes it to 'tail'
        # and the global fallback cut.
        if self.contexts is not None:
            scored = lm_score_backoff(
                docs,
                self.model,
                self.contexts,
                self.defaults,
                group_cols=[by],
            ).select("doc_id", "nll")
        else:
            scored = lm_score(docs, self.model, group_cols=[by]).select(
                "doc_id", "nll"
            )
        qual = quality_scores(docs).select("doc_id", "keep_score")
        base = (
            docs.join(scored, "doc_id", "left")
            .join(qual, "doc_id")
            # cuts relations are groups-sized (languages) but DATA-
            # dependent in principle (a caller may group by a high-
            # cardinality column) — no forced broadcast; AQE picks
            # broadcast whenever the runtime size allows (the sub_offs
            # lesson, operators/rank.py:300)
            .join(
                self.nll_cuts.withColumnRenamed(by, "_b1"),
                F.col(by).eqNullSafe(F.col("_b1")),
                "left",
            )
            .join(
                self.score_cuts.withColumnRenamed(by, "_b2"),
                F.col(by).eqNullSafe(F.col("_b2")),
                "left",
            )
        )
        bucket = (
            F.when(F.col("nll") <= F.col("nll_c1"), "head")
            .when(F.col("nll") <= F.col("nll_c2"), "middle")
            .otherwise("tail")
        )
        cut = F.coalesce(F.col("score_cut"), F.lit(self.global_score_cut))
        return (
            base.where(F.col("keep_score") >= cut)
            .select(
                "doc_id",
                by,
                F.col(tc).alias("cleaned_text"),
                "n_lines",
                "n_kept",
                "nll",
                bucket.alias("bucket"),
                "keep_score",
            )
        )

    def save(self, path: str) -> None:
        self.model = _write_safe(self.model, os.path.join(path, "model"))
        self.nll_cuts = _write_safe(
            self.nll_cuts, os.path.join(path, "nll_cuts")
        )
        self.score_cuts = _write_safe(
            self.score_cuts, os.path.join(path, "score_cuts")
        )
        if self.contexts is not None:
            self.contexts = _write_safe(
                self.contexts, os.path.join(path, "contexts")
            )
            self.defaults = _write_safe(
                self.defaults, os.path.join(path, "defaults")
            )
        self._lines.save(path)
        with open(os.path.join(path, "config.json"), "w") as fh:
            json.dump(
                {
                    "by_col": self.by_col,
                    "text_col": self.text_col,
                    "sep": self.sep,
                    "global_score_cut": self.global_score_cut,
                },
                fh,
            )

    def checkpoint_state(self, path: str) -> None:
        """Truncate the line archive's union-chain lineage, then persist
        (model and cuts are frozen — their lineage never grows)."""
        if self._lines.lines is not None:
            self._lines.lines = self._lines.lines.localCheckpoint(eager=True)
        self.save(path)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "WebIntakeScreen":
        with open(os.path.join(path, "config.json")) as fh:
            cfg = json.load(fh)
        ctx_path = os.path.join(path, "contexts")
        screen = cls(
            spark.read.parquet(os.path.join(path, "model")),
            spark.read.parquet(os.path.join(path, "nll_cuts")),
            spark.read.parquet(os.path.join(path, "score_cuts")),
            cfg["global_score_cut"],
            by_col=cfg["by_col"],
            text_col=cfg["text_col"],
            sep=cfg["sep"],
            contexts=(
                spark.read.parquet(ctx_path)
                if os.path.exists(ctx_path)
                else None
            ),
            defaults=(
                spark.read.parquet(os.path.join(path, "defaults"))
                if os.path.exists(os.path.join(path, "defaults"))
                else None
            ),
        )
        screen._lines = LineScreen.load(
            spark, path, text_col=cfg["text_col"], sep=cfg["sep"]
        )
        return screen


class Bm25Index:
    """Operational facade over the persisted BM25 serving index
    (:mod:`flink_bm25_spark.operators.serving`) — the query-side
    counterpart of :class:`BM25Engine`: where the engine re-derives
    statistics from raw text per session, the index answers from its
    term-bucket-partitioned parquet layout, so ``search`` opens only the
    query terms' buckets (partition pruning) and never re-tokenizes.

    Loop: ``Bm25Index.create(docs, path)`` → ``idx.add(batch)`` per
    arriving batch (idempotent per batch id; streaming twin
    ``streaming/index_maintenance.py``) → ``idx.search("free text")``
    any time → ``idx.compact()`` in maintenance windows.
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._warm: dict | None = None

    @classmethod
    def create(
        cls, documents: DataFrame, path: str, n_buckets: int = 64
    ) -> "Bm25Index":
        from flink_bm25_spark.operators.serving import bm25_index_save

        bm25_index_save(documents, path, n_buckets=n_buckets)
        return cls(documents.sparkSession, path)

    def add(self, documents: DataFrame, batch_id: int | None = None) -> None:
        from flink_bm25_spark.operators.serving import bm25_index_add

        self.cool()  # cached statistics would go stale
        bm25_index_add(documents, self.path, batch_id=batch_id)

    def upsert(self, documents: DataFrame, batch_id: int | None = None) -> None:
        """REPLACE documents (insert if absent) — the reference sink's
        actual per-doc semantics (`MongoTFSink.java:43-58`), as one
        fused delete-old + add-new batch."""
        from flink_bm25_spark.operators.serving import bm25_index_upsert

        self.cool()
        bm25_index_upsert(documents, self.path, batch_id=batch_id)

    def delete(self, doc_ids, batch_id: int | None = None) -> None:
        """Remove documents from the served index — O(|ids|) point reads
        against the forward section + one negative-partial batch; the
        physical postings go at the next full :meth:`compact` (the
        reference's Mongo ``remove`` leg, on the same partial algebra
        as adds)."""
        from flink_bm25_spark.operators.serving import bm25_index_delete

        self.cool()
        bm25_index_delete(self.spark, self.path, doc_ids, batch_id=batch_id)

    def warm(self, version: int | None = None) -> "Bm25Index":
        """Pin the index's SMALL relations for a repeated-query workload:
        the df partials and stats rows go to executor memory
        (``persist``), ``n_buckets`` and the hot-term salt map to the
        driver — so each subsequent :meth:`search` runs exactly ONE
        Spark job (the partition-pruned postings read + fold) instead of
        paying a stats-read job and cold df/stats scans per query.

        The postings themselves deliberately stay ON DISK: partition
        pruning per query is the scale contract (caching the big
        relation would trade it for a full in-memory scan).  Adds and
        compaction invalidate the warm state (:meth:`cool` runs
        automatically).  Honest framing, measured in
        ``scripts/serve_compare.py``: this trims the per-query floor,
        but Spark remains a batch engine — sub-100ms serving latency
        needs a dedicated server in front; the index's job is
        throughput per corpus version (DEPLOY.md).

        STALENESS GUARD: the facade's own mutators :meth:`cool`
        automatically, but a SECOND session (or the CLI) writing the
        same path would leave this session's pinned df/stats silently
        stale — so ``warm()`` records the index's write stamp (a
        root-level counter every mutating op bumps) and each
        :meth:`search` re-checks it with ONE tiny filesystem read (no
        Spark job); on mismatch the warm state self-cools and the
        query falls back to the cold path.

        VERSION-PINNED WARM: ``warm(version=N)`` pins a SNAPSHOT tree
        instead of the current one — the reproducible-eval throughput
        mode (thousands of queries against one frozen corpus state,
        one Spark job each).  A superseded pinned tree is immutable,
        so the per-query staleness re-check is skipped entirely; keep
        the version pinned (`bm25_index_pin`) for the lifetime of the
        warm state — a GC reclaiming it mid-eval fails loudly
        (file-not-found), never silently wrong.  Warming the CURRENT
        version by number keeps the stamp guard (mutations still land
        in that tree until the next fold)."""
        from flink_bm25_spark.operators.serving import read_write_stamp

        if version is not None:
            self._warm_once(version=version)
            return self
        for _ in range(3):
            self._warm_once()
            # re-verify: a writer that committed DURING the pin bumped
            # the stamp past our recorded value — the pinned tree may be
            # the superseded one, so retry against the now-current tree;
            # still moving after 3 attempts means a live writer: stay
            # cold (searches take the always-correct cold path)
            if (
                self._warm is not None
                and read_write_stamp(self.spark, self.path)
                == self._warm["stamp"]
            ):
                break
            self.cool()
        return self

    def _warm_once(self, version: int | None = None) -> None:
        from flink_bm25_spark.operators.serving import (
            _fs_exists,
            _h_driver,
            _Layout,
            read_write_stamp,
        )

        self.cool()
        # stamp BEFORE layout: a compaction committing between the two
        # reads must produce a mismatch at the first search (self-cool),
        # never the reverse (post-flip stamp recorded against a pinned
        # pre-flip tree — the guard would never trip while gc_grace runs
        # out under the pinned paths).  Reading the stamp first makes
        # any concurrent writer's bump land AFTER our recorded value, so
        # the worst case is one wasted warm, not a stale serve.
        stamp = read_write_stamp(self.spark, self.path)
        current = _Layout(self.spark, self.path).version
        lay = _Layout(self.spark, self.path, version=version)
        # a SUPERSEDED pinned tree is immutable — searches skip the
        # per-query stamp re-check (the whole point of snapshot warm)
        immutable = version is not None and lay.version != current
        df_rel = self.spark.read.parquet(lay.sec("df")).persist()
        stats_rel = self.spark.read.parquet(lay.sec("stats")).persist()
        stats_rel.count()
        df_rel.count()
        n_buckets = int(stats_rel.select("n_buckets").first()["n_buckets"])
        # hot-salt map: driver-cached ONLY while it is genuinely small
        # (bounded collect — at most HOT_CACHE_CAP+1 rows); a
        # pathologically low df cap falls back to the per-query bounded
        # hot probe instead of materializing an unbounded map
        HOT_CACHE_CAP = 10_000
        hot: dict[str, int] | None = {}
        hot_path = lay.sec("hot")
        if _fs_exists(self.spark, hot_path):
            rows = (
                self.spark.read.parquet(hot_path)
                .groupBy("word")
                .agg(F.max("n_salts").alias("n_salts"))
                .limit(HOT_CACHE_CAP + 1)
                .collect()
            )
            if len(rows) > HOT_CACHE_CAP:
                hot = None  # too many hot words to pin driver-side
            else:
                hot = {r["word"]: int(r["n_salts"]) for r in rows}
        from flink_bm25_spark.operators.serving import _read_deleted

        deleted = _read_deleted(self.spark, self.path, lay=lay)
        if deleted is not None:
            deleted = deleted.persist()
            deleted.count()
        self._warm = {
            "df": df_rel,
            "stats": stats_rel,
            "n_buckets": n_buckets,
            "hot": hot,
            "h": _h_driver,
            "deleted": deleted,
            "postings_path": lay.sec("postings"),
            "stamp": stamp,
            "version": lay.version if version is not None else None,
            "immutable": immutable,
        }

    def cool(self) -> None:
        """Drop any warm state (unpersist the cached relations)."""
        if self._warm is not None:
            self._warm["df"].unpersist()
            self._warm["stats"].unpersist()
            if self._warm.get("deleted") is not None:
                self._warm["deleted"].unpersist()
            self._warm = None

    def search(
        self, query: str, k: int = 10, version: int | None = None
    ) -> DataFrame:
        """``(doc_id, score, rk)`` — served BM25 top-k for free text.
        ``version=`` serves from a pinned snapshot tree instead of the
        current one (:meth:`snapshot` / `bm25_index_pin`); it rides the
        warm cache only when the cache was warmed at that SAME version
        (``warm(version=N)``), else takes the cold pinned read."""
        from flink_bm25_spark.operators.serving import bm25_topk_from_index

        terms = _tokenize_query(query)
        if version is not None:
            if (
                self._warm is not None
                and self._warm.get("version") == int(version)
            ):
                return self._search_warm(terms, k)
            return bm25_topk_from_index(
                self.spark, self.path, terms, k=k, version=version
            )
        if self._warm is not None and self._warm.get("version") is None:
            return self._search_warm(terms, k)
        return bm25_topk_from_index(self.spark, self.path, terms, k=k)

    def snapshot(self, **compact_kwargs) -> int:
        """Freeze the current state as a pinned immutable version and
        return its number — query it with ``search(..., version=N)``;
        release with :meth:`unpin`.  See `bm25_index_snapshot`."""
        from flink_bm25_spark.operators.serving import bm25_index_snapshot

        self.cool()  # the fold supersedes the tree the cache pinned
        return bm25_index_snapshot(self.spark, self.path, **compact_kwargs)

    def unpin(self, version: int) -> None:
        from flink_bm25_spark.operators.serving import bm25_index_unpin

        bm25_index_unpin(self.spark, self.path, version)

    def versions(self) -> DataFrame:
        from flink_bm25_spark.operators.serving import bm25_index_versions

        return bm25_index_versions(self.spark, self.path)

    def _search_warm(self, terms: tuple[str, ...], k: int) -> DataFrame:
        from flink_bm25_spark.operators.serving import (  # noqa: PLC0415
            Bm25IndexBatch,
            _empty_topk,
            bm25_topk_from_index,
            bm25_topk_from_partials,
            read_write_stamp,
        )

        if not terms:
            # mirror the cold paths' guard: a zero-arg isin is an opaque
            # Spark analysis error (unreachable today — _tokenize_query
            # raises on stopword-only input — but the warm path must not
            # be fragile against future pre-tokenized callers)
            return _empty_topk(self.spark)
        # staleness guard: one tiny FS read per query — an external
        # writer (second session, CLI) bumped the stamp since warm().
        # A version-warmed SUPERSEDED tree is immutable: skip the check
        # (snapshot-warm serves survive concurrent maintenance by
        # construction — that is the reproducible-eval contract).
        if not self._warm.get("immutable") and (
            read_write_stamp(self.spark, self.path) != self._warm["stamp"]
        ):
            # fall back at the version the caller warmed (a version-
            # warmed CURRENT tree that moved must not silently serve
            # the new head under the old version number)
            warmed_v = self._warm.get("version")
            self.cool()
            return bm25_topk_from_index(
                self.spark, self.path, terms, k=k, version=warmed_v
            )
        w = self._warm
        if w["hot"] is None:
            # hot map too large to pin: per-query bounded hot probe
            from flink_bm25_spark.operators.serving import (  # noqa: PLC0415
                _expanded_query_buckets,
            )

            buckets = set(
                _expanded_query_buckets(
                    self.spark, self.path, terms, w["n_buckets"]
                )
            )
        else:
            buckets = set()
            for t in terms:
                h = w["h"](t)
                buckets.add(h % w["n_buckets"])
                for s in range(w["hot"].get(t, 0)):
                    buckets.add((h + s) % w["n_buckets"])
        from flink_bm25_spark.operators.serving import (  # noqa: PLC0415
            _drop_deleted,
        )

        # the postings path was LAYOUT-RESOLVED at warm() time — reading
        # the bare path here would silently serve a superseded tree on a
        # compacted (manifest-versioned) index
        postings = _drop_deleted(
            self.spark.read.parquet(w["postings_path"]).where(
                F.col("bucket").isin(sorted(buckets))
                & F.col("word").isin(*terms)
            ),
            w["deleted"],
        )
        return bm25_topk_from_partials(
            Bm25IndexBatch(postings, w["df"], w["stats"]), terms, k=k
        )

    def search_batch(
        self, queries, k: int = 10, version: int | None = None
    ) -> DataFrame:
        """``(query_id, doc_id, score, rk)`` for a relation/list of
        ``(query_id, terms)`` — one partition-pruned pass for all.
        ``version=`` runs the whole eval set against a pinned snapshot
        (the reproducible-evals workflow: freeze once, score every
        candidate eval batch against the same corpus state)."""
        from flink_bm25_spark.operators.serving import (
            bm25_batch_topk_from_index,
        )

        return bm25_batch_topk_from_index(
            self.spark, self.path, queries, k=k, version=version
        )

    def compact(
        self,
        hot_df_cap: int | None = None,
        gc_grace_seconds: float = 300.0,
    ) -> None:
        from flink_bm25_spark.operators.serving import bm25_index_compact

        self.cool()  # the fold replaces the relations the warm state pinned
        bm25_index_compact(
            self.spark,
            self.path,
            hot_df_cap=hot_df_cap,
            gc_grace_seconds=gc_grace_seconds,
        )

    def gc(self, grace_seconds: float = 300.0) -> int:
        """Reclaim superseded version trees without folding (the
        fold-once-serve-forever case); returns trees reclaimed.  Warm
        state stays valid — GC never touches the current tree."""
        from flink_bm25_spark.operators.serving import bm25_index_gc

        return bm25_index_gc(self.spark, self.path, grace_seconds=grace_seconds)

    def stats(self) -> DataFrame:
        from flink_bm25_spark.operators.serving import bm25_index_stats

        return bm25_index_stats(self.spark, self.path)

    # -- forward (doc-major) section ----------------------------------------

    def save_forward(self, documents: DataFrame) -> None:
        """Persist the doc-major section (the reference's tf5 store
        shape) enabling point lookups and served more-like-this."""
        from flink_bm25_spark.operators.serving import (
            bm25_index_save_forward,
        )

        bm25_index_save_forward(documents, self.path)

    def doc_vector(self, doc_id: int) -> DataFrame:
        """``(doc_id, dl, terms)`` point lookup — getByPid parity."""
        from flink_bm25_spark.operators.serving import doc_vector_from_index

        return doc_vector_from_index(self.spark, self.path, doc_id)

    def more_like_this(self, doc_id: int, k: int = 10) -> DataFrame:
        """``(doc_id, sim, rk)`` — related docs by weighted BM25 over
        the source doc's vector; reads bounded by its vocabulary."""
        from flink_bm25_spark.operators.serving import (
            more_like_this_from_index,
        )

        return more_like_this_from_index(self.spark, self.path, doc_id, k=k)
