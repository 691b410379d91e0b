"""Replicates the driver's t2 gate locally: every queries() entry must be
value-identical to its oracle_sql() twin on the sf0.001 fixtures."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR, compare_spark_duck

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_every_query_has_callable():
    assert QUERIES, "queries() is empty"
    for name, fn in QUERIES.items():
        assert callable(fn), name


def test_oracle_keys_subset_of_queries():
    extra = set(ORACLES) - set(QUERIES)
    assert not extra, f"oracle_sql keys without queries(): {extra}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, duck):
    df = QUERIES[name](spark, SF_DIR)
    compare_spark_duck(df, duck, ORACLES[name])


def test_entry_smoke(spark):
    out = entrymod.entry(spark)
    rows = out.collect()
    assert len(rows) >= 0
    assert out.columns == ["doc_id", "score", "rk"]


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_emits_no_widened_types(name, duck):
    """The external gate hashes oracle output with dtype fidelity: DuckDB
    widens integer window/aggregate sums to HUGEINT (int128), which can
    never equal a Spark BIGINT column byte-for-byte even when every value
    matches (root cause of the r02 q_pack_sequences / q_curation_pipeline
    hash mismatches).  Pin: every emitted oracle column must be a plain
    SQL type — no HUGEINT/INT128/DECIMAL leaks."""
    rows = duck.execute(f"DESCRIBE {ORACLES[name]}").fetchall()
    sus = [
        (c, t)
        for c, t, *_ in rows
        if any(k in str(t).upper() for k in ("HUGEINT", "INT128", "DECIMAL"))
    ]
    assert not sus, f"{name} emits widened types: {sus}"


def test_gate_window_holds_flagships():
    """The external gate value-checks only the FIRST 50 queries() entries;
    the flagship pipeline queries (and the two whose r02 hash mismatch
    was fixed by the tok_offset rename) must stay inside that window."""
    import importlib.util
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "__spark_entry__.py",
    )
    spec = importlib.util.spec_from_file_location("_entry_win", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    names = list(mod.queries().keys())
    window = set(names[:50])
    # r5 rotation (r4 verdict item 3): q_idf left the window — its math is
    # value-checked through the in-window q_tfidf/q_bm25_rank composites.
    # r6 rotation (r5 verdict item 2): the published-filter flagships
    # (q_gopher_filter, q_c4_line_filter, q_lm_score_frozen) entered;
    # q_tfidf (covered by q_bm25_rank), q_topk_per_doc (covered by
    # q_top30_lines) and q_quality_gate (covered by
    # q_quality_gate_by_lang) moved to the oracle-swept overflow.
    # r7 rotation (r6 verdict item 3): the sweep-only r6 flagships
    # (q_gopher_ngram_fracs, q_lm_score_backoff, q_bm25_facets,
    # q_bm25_snippets) plus the new served-surface oracles
    # (q_doc_vector, q_bm25_mlt_served) entered; out went composites'
    # micro-queries (q_embed_near_dup, q_winnow_fps, q_edit_distance,
    # q_ann_filtered, q_bpe_encode, q_curation_report), all still
    # oracle-swept in the overflow.
    # r8 rotation (r7 verdict item 5): the four serving-CRUD oracles
    # (q_bm25_serve_deleted/upserted/salted, q_bm25_batch_served)
    # entered; out went q_tokenize_explode + q_stopword_filter (the
    # tokenize→filter chain is in-window via q_tf / q_pos_filter /
    # q_cjk_fmm), q_dedup_ngram_jaccard (hashed-gram machinery in-window
    # via q_remove_dup_spans + q_dedup_minhash) and q_doc_vector
    # (q_bm25_mlt_served point-reads the same forward section first).
    for must in (
        "q_tf", "q_df", "q_bm25_rank", "q_dedup_minhash",
        "q_dedup_simhash", "q_semantic_dedup", "q_kmeans",
        "q_curation_pipeline", "q_pack_sequences", "q_decontaminate",
        "q_pos_filter", "q_tpch_q1",
        "q_line_dedup", "q_web_intake", "q_ccnet_by_lang",
        "q_quality_gate_by_lang",
        "q_gopher_filter", "q_c4_line_filter", "q_lm_score_frozen",
        "q_bm25_serve", "q_bm25_prf",
        "q_gopher_ngram_fracs", "q_lm_score_backoff",
        "q_bm25_mlt_served",
        "q_bm25_serve_deleted", "q_bm25_serve_upserted",
        "q_bm25_serve_salted", "q_bm25_batch_served",
        # r9 rotation: the snapshot (time-travel) oracles entered; out
        # went q_bm25_facets/q_bm25_snippets.  r10 counter-rotation
        # (r9 verdict item 1, sanctioned): facets/snippets return after
        # the snapshot oracles banked a fully green external check —
        # the snapshots move to the oracle-swept overflow (51-52).
        "q_bm25_facets", "q_bm25_snippets",
    ):
        assert must in window, f"{must} fell out of the 50-query gate window"


def test_no_reserved_word_output_columns(duck, spark):
    """The r2 lesson, institutionalized (r5 verdict item 8): the
    external gate's hash compare broke on an output column literally
    named ``offset`` (a SQL clause keyword) while every local replay
    matched.  Pin: no queries() output column may be a DuckDB RESERVED
    keyword, so window rotation can never reintroduce that failure
    class.  Oracle-backed queries are checked via DESCRIBE (cheap, and
    the gate's schema_match forces Spark columns to agree); the
    rows-only queries are checked through their Spark schema."""
    reserved = {
        r[0]
        for r in duck.execute(
            "SELECT keyword_name FROM duckdb_keywords()"
            " WHERE keyword_category = 'reserved'"
        ).fetchall()
    }
    bad = {}
    for name, sql in ORACLES.items():
        cols = [r[0] for r in duck.execute(f"DESCRIBE {sql}").fetchall()]
        hits = [c for c in cols if c.lower() in reserved]
        if hits:
            bad[name] = hits
    for name in set(QUERIES) - set(ORACLES):
        cols = QUERIES[name](spark, SF_DIR).columns
        hits = [c for c in cols if c.lower() in reserved]
        if hits:
            bad[name] = hits
    assert not bad, f"reserved-word output columns: {bad}"
