"""Benchmark harness — runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Each query is forced with a ``noop``-format write so every expression in
the final plan is actually evaluated — ``count()`` would let Catalyst
prune expensive projections (e.g. ``collect_list`` vectors) that a count
does not need, under-measuring those queries.  Timings include Catalyst
planning but exclude session startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the flagship BM25 pipeline plus one representative of each
# operator family (agg, window/top-k, join, sort, event windows, dedup, ANN).
#
# FROZEN at the round-3 set (31 queries): round-over-round headline totals
# are only comparable at the identical set (r3 verdict item 4 / the r1->r3
# lesson), so this list must NOT grow.  New queries worth benching go in
# ADDITIONS below — they are timed and reported under "queries_extra" but
# never enter the headline "value".
HEADLINE = [
    "q_tf",
    "q_pos_filter",
    "q_cjk_fmm",
    "q_topk_per_doc",
    "q_df",
    "q_tfidf",
    "q_bm25_rank",
    "q_hybrid_rrf",
    "q_tf_vector_sink",
    "q_sort_desc",
    "q_window_tumbling",
    "q_running_total",
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_semantic_dedup",
    "q_remove_dup_spans",
    "q_ann_cosine_topk",
    "q_tpch_q1",
    "q_mktsegment_revenue",
    "q_decontaminate",
    "q_bpe_pair_counts",
    "q_kmeans",
    "q_curation_pipeline",
    "q_lm_perplexity",
    "q_winnow_fps",
    "q_textrank",
    "q_dq_summary",
    "q_token_budget_sample",
    "q_quality_classifier",
    "q_curation_report",
    "q_pca_top_component",
]

# Non-frozen additions (reported separately as "queries_extra"): queries
# whose plans changed this round or newly promoted flagships.
ADDITIONS = [
    "q_quality_gate",
    "q_ccnet_buckets",
    "q_edit_distance",
    "q_asof_join",
    "q_quality_gate_by_lang",
    "q_ccnet_by_lang",
    "q_strip_markup",
    "q_line_dedup",
    "q_web_intake",
    "q_gopher_filter",
    "q_c4_line_filter",
    # r6: the single-scan ngram rewrite + the new backoff scorer
    "q_gopher_ngram_fracs",
    "q_lm_score_frozen",
    "q_lm_score_backoff",
    # r6: serving-index fold math + pseudo-relevance feedback
    "q_bm25_serve",
    "q_bm25_prf",
]


def _cpu_times() -> tuple[int, int]:
    """(steal, total) jiffies from /proc/stat — loadavg cannot see a
    noisy neighbor on a shared host, steal time can (observed 37s vs
    46s headline totals at identical ~0 loadavg starts)."""
    try:
        with open("/proc/stat") as fh:
            vals = [int(x) for x in fh.readline().split()[1:]]
        return (vals[7] if len(vals) > 7 else 0), sum(vals)
    except Exception:  # noqa: BLE001 — sentinel is best-effort
        return 0, 0


def _wait_for_quiet_window(budget: float) -> float:
    """Block until 1-min loadavg drops below 2 (or ``budget`` seconds
    elapse) so the OFFICIAL artifact is recorded from an uncontended
    window — r5/r6 verdicts both had to re-run contended artifacts by
    hand, and r8's OFFICIAL artifact was a noise sample because the old
    8-min budget ran out mid-load (r8 verdict item 1).  The budget is
    GLOBAL across retry attempts (``SPARK_GRAFT_BENCH_WAIT_S``, default
    30 min total — loadavg is a ~1-min EMA and a co-tenant test suite
    can take 20+ min to wind down; per-attempt budgets could stack past
    any sane driver timeout and a killed bench emits NO artifact, which
    is strictly worse than a contended one); 0 disables the gate.
    Returns seconds waited."""
    waited = 0.0
    while waited < budget and os.getloadavg()[0] >= 2.0:
        time.sleep(15)
        waited += 15
    return waited


def main() -> None:
    """Capture up to SPARK_GRAFT_BENCH_ATTEMPTS (default 3) windows and
    emit ONE JSON line: the first `contended: false` capture wins; if
    every window was loaded, the lowest calib-normalized attempt is
    emitted (still flagged contended — self-identifying noise)."""
    import __spark_entry__ as entrymod
    from flink_bm25_spark.session import get_spark

    spark = get_spark(app_name="flink_bm25_spark_bench")
    attempts = int(os.environ.get("SPARK_GRAFT_BENCH_ATTEMPTS", "3"))
    wait_budget = float(os.environ.get("SPARK_GRAFT_BENCH_WAIT_S", "1800"))
    deadline = time.monotonic() + wait_budget
    best = None
    for _ in range(max(attempts, 1)):
        art = _measure(
            spark, entrymod, max(0.0, deadline - time.monotonic())
        )
        if not art["contended"]:
            best = art
            break
        if best is None or (art["value_per_calib"] or 1e9) < (
            best["value_per_calib"] or 1e9
        ):
            best = art
    print(json.dumps(best))
    spark.stop()


def _measure(spark, entrymod, wait_budget: float = 0.0) -> dict:
    waited_s = _wait_for_quiet_window(wait_budget)
    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs]
    # Warm the JVM + parquet footers with one cheap action.
    spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).count()

    # Two timed iterations, report the min: the first run pays JVM JIT +
    # whole-stage-codegen compilation, which would otherwise be billed to
    # whichever query happens to run first.
    extra_names = [n for n in ADDITIONS if n in qs]
    loadavg_start = os.getloadavg()
    steal0, total0 = _cpu_times()
    # Fixed single-thread CPU probe: same-code headline totals varied
    # 37-46s on this host at ~0 loadavg AND ~1% steal, i.e. effective
    # core speed itself fluctuates.  calib_sec measures it directly;
    # compare totals ACROSS artifacts via total/calib_sec.
    t0 = time.perf_counter()
    acc = 0
    for i in range(10_000_000):
        acc += i * i
    calib_sec = round(time.perf_counter() - t0, 3)
    runs: dict[str, list[float]] = {}
    # BOTH headline iterations run before any ADDITIONS query: the frozen
    # headline total must stay comparable round-over-round even as the
    # extras list grows (a heavy extra at the end of iteration 1 leaves
    # GC/codegen pressure that would otherwise inflate iteration 2's
    # headline numbers — observed +11% with the r5 extras interleaved).
    for group in (names, extra_names):
        for _ in range(2):
            for name in group:
                t0 = time.perf_counter()
                qs[name](spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.setdefault(name, []).append(
                    round(time.perf_counter() - t0, 3)
                )
    timings = {n: min(v) for n, v in runs.items() if n in HEADLINE}
    extra = {n: min(v) for n, v in runs.items() if n not in HEADLINE}
    # Contention sentinel (r4 verdict item 3): a contended artifact is
    # self-identifying — loadavg far above SPARK_GRAFT_CPUS, or large
    # per-query iteration spread (max-min across the two runs), means
    # the recorded numbers reflect the machine, not the plans.
    spread = {n: round(max(v) - min(v), 3) for n, v in runs.items()}
    steal1, total1 = _cpu_times()
    steal_pct = round(100.0 * (steal1 - steal0) / max(total1 - total0, 1), 2)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    total = round(sum(timings.values()), 3)
    per_calib = round(total / calib_sec, 2) if calib_sec > 0 else None
    contended = loadavg_start[0] > 2.0
    # Key ORDER is part of the artifact contract (r7 verdict item 7):
    # the driver may persist only a truncated head OR tail of this line,
    # so the headline scalars come FIRST, the big per-query dicts sit in
    # the middle, and the headline repeats at the END under *_tail
    # names — either truncation keeps metric/value/calib/contended.
    return {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        # r5 verdict item 6: effective core speed swings ~2× on
        # this shared host — totals are only comparable ACROSS
        # artifacts as total/calib_sec.  `contended` tags an
        # artifact recorded under load (loadavg_start above 2):
        # its raw numbers reflect the machine, not the plans.
        "value_per_calib": per_calib,
        "calib_sec": calib_sec,
        "contended": contended,
        "extra_total": round(sum(extra.values()), 3),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "loadavg_start": [round(x, 2) for x in loadavg_start],
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
        "cpu_steal_pct": steal_pct,
        "quiet_wait_s": waited_s,
        "iter_spread_max": max(spread.values()) if spread else 0.0,
        "queries": timings,
        "queries_extra": extra,
        "iter_spread": spread,
        "value_tail": total,
        "value_per_calib_tail": per_calib,
        "calib_sec_tail": calib_sec,
        "contended_tail": contended,
    }


if __name__ == "__main__":
    main()
