"""End-to-end CLI test — the reference's jar usage, Spark-side:
precompute the first N docs, emit golden text, search the saved stats."""

from __future__ import annotations

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_cli_precompute_then_search(tmp_path):
    stats = str(tmp_path / "stats")
    golden = str(tmp_path / "golden")
    env = {**os.environ, "PYTHONPATH": REPO}
    r = subprocess.run(
        [sys.executable, "-m", "flink_bm25_spark", "precompute",
         "--input", SF_DIR, "--limit", "50", "--output", stats,
         "--golden-text", golden],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "precomputed statistics for 50 documents" in r.stderr

    # golden dir: one partition dir per doc, lines in the reference format
    doc_dirs = [d for d in os.listdir(golden) if d.startswith("doc_id=")]
    assert len(doc_dirs) == 50
    part = os.path.join(golden, doc_dirs[0])
    lines = []
    for f in os.listdir(part):
        if f.startswith("part-"):
            lines += open(os.path.join(part, f)).read().splitlines()
    assert lines and all(re.match(r"^\(.+,\d+\)$", ln) for ln in lines)

    r2 = subprocess.run(
        [sys.executable, "-m", "flink_bm25_spark", "search",
         "--stats", stats, "spark stream join", "-k", "5"],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=300,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    rows = [ln.split("\t") for ln in r2.stdout.strip().splitlines()]
    assert 0 < len(rows) <= 5
    assert [int(x[0]) for x in rows] == list(range(1, len(rows) + 1))
    scores = [float(x[2]) for x in rows]
    assert scores == sorted(scores, reverse=True)


def test_cli_hybrid_search(tmp_path):
    stats = str(tmp_path / "stats")
    env = {**os.environ, "PYTHONPATH": REPO}
    r = subprocess.run(
        [sys.executable, "-m", "flink_bm25_spark", "precompute",
         "--input", SF_DIR, "--output", stats],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    r2 = subprocess.run(
        [sys.executable, "-m", "flink_bm25_spark", "hybrid",
         "--stats", stats, "--embeddings", SF_DIR,
         "--query-vec-id", "0", "spark stream join", "-k", "5"],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=300,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    rows = [ln.split("\t") for ln in r2.stdout.strip().splitlines()]
    assert 0 < len(rows) <= 5
    assert [int(x[0]) for x in rows] == list(range(1, len(rows) + 1))
    # fused scores descend; n_systems is 1 or 2
    rrf = [float(x[2]) for x in rows]
    assert rrf == sorted(rrf, reverse=True)
    assert all(x[3] in ("1", "2") for x in rows)


def test_cli_index_lifecycle(tmp_path):
    env = {**os.environ, "PYTHONPATH": REPO}
    idx = str(tmp_path / "idx")

    def run(*args, ok=True):
        r = subprocess.run(
            [sys.executable, "-m", "flink_bm25_spark", "index", *args,
             "--path", idx],
            capture_output=True, text=True, cwd=REPO, env=env, timeout=300,
        )
        if ok:
            assert r.returncode == 0, r.stderr[-2000:]
        return r

    run("create", "--input", SF_DIR, "--n-buckets", "16", "--forward")
    r = run("search", "--query", "spark stream join", "-k", "5")
    rows = [ln.split("\t") for ln in r.stdout.strip().splitlines()]
    assert rows and [int(x[0]) for x in rows] == list(range(1, len(rows) + 1))
    top_doc = rows[0][1]

    g = run("get", "--doc-id", top_doc)
    assert g.stdout.startswith(f"{top_doc}\t")

    run("delete", "--doc-ids", top_doc)
    r2 = run("search", "--query", "spark stream join", "-k", "5")
    assert all(ln.split("\t")[1] != top_doc for ln in r2.stdout.strip().splitlines())
    miss = run("get", "--doc-id", top_doc, ok=False)
    assert miss.returncode == 3  # tombstoned: point lookup finds nothing

    run("compact")
    s = run("stats")
    cols = s.stdout.strip().splitlines()[0].split("\t")
    assert len(cols) == 7 and cols[6] == "0"  # tombstones applied


def test_cli_index_cdc(tmp_path):
    env = {**os.environ, "PYTHONPATH": REPO}
    idx = str(tmp_path / "idx")
    changes = str(tmp_path / "changes")
    ckpt = str(tmp_path / "ckpt")

    def run(*args, ok=True):
        r = subprocess.run(
            [sys.executable, "-m", "flink_bm25_spark", "index", *args,
             "--path", idx],
            capture_output=True, text=True, cwd=REPO, env=env, timeout=300,
        )
        if ok:
            assert r.returncode == 0, r.stderr[-2000:]
        return r

    run("create", "--input", SF_DIR, "--n-buckets", "16", "--forward")
    r = run("search", "--query", "spark stream join", "-k", "3")
    top_doc = r.stdout.strip().splitlines()[0].split("\t")[1]

    # one change file = one micro-batch: drop the top doc, refresh another
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE TABLE ch (op VARCHAR, doc_id BIGINT, text VARCHAR, seq BIGINT)")
    con.execute(f"INSERT INTO ch VALUES ('delete', {top_doc}, NULL, 1),"
                f" ('upsert', 1, 'refreshed text about spark stream join', 2)")
    os.makedirs(changes, exist_ok=True)
    con.execute(f"COPY ch TO '{changes}/b0.parquet' (FORMAT PARQUET)")
    con.close()

    r = run("cdc", "--input", changes, "--checkpoint", ckpt)
    assert "cdc stream drained" in r.stderr
    r2 = run("search", "--query", "spark stream join", "-k", "5")
    lines = r2.stdout.strip().splitlines()
    assert all(ln.split("\t")[1] != top_doc for ln in lines)
    # draining again on the same checkpoint is a no-op
    r3 = run("cdc", "--input", changes, "--checkpoint", ckpt)
    assert run("search", "--query", "spark stream join", "-k", "5").stdout == r2.stdout

    # seq is OPTIONAL: an input WITHOUT the column must still apply its
    # events (the r8 advice bug: a hardcoded 'seq long' schema read
    # all-null seq and silently dropped every event while reporting
    # success) — delete the current top doc and verify it is gone
    top2 = lines[0].split("\t")[1]
    changes2 = str(tmp_path / "changes_noseq")
    con = duckdb.connect()
    con.execute("CREATE TABLE ch2 (op VARCHAR, doc_id BIGINT, text VARCHAR)")
    con.execute(f"INSERT INTO ch2 VALUES ('delete', {top2}, NULL)")
    os.makedirs(changes2, exist_ok=True)
    con.execute(f"COPY ch2 TO '{changes2}/b0.parquet' (FORMAT PARQUET)")
    con.close()
    run("compact")  # full fold releases the first stream's ownership
    run("cdc", "--input", changes2, "--checkpoint", str(tmp_path / "ckpt2"))
    r4 = run("search", "--query", "spark stream join", "-k", "5")
    assert all(ln.split("\t")[1] != top2 for ln in r4.stdout.strip().splitlines())


def test_cli_ivf_crud(tmp_path):
    """The dense tier's operational loop end-to-end through the CLI —
    create/stats/upsert/search/retrain/delete/compact/gc (r9)."""
    env = {**os.environ, "PYTHONPATH": REPO}
    idx = str(tmp_path / "ivf")

    def run(*args, ok=True):
        r = subprocess.run(
            [sys.executable, "-m", "flink_bm25_spark", "ivf", *args,
             "--path", idx],
            capture_output=True, text=True, cwd=REPO, env=env, timeout=300,
        )
        if ok:
            assert r.returncode == 0, r.stderr[-2000:]
        return r

    run("create", "--input", SF_DIR, "--n-cells", "4")
    s0 = run("stats").stdout.strip().split("\t")
    assert int(s0[1]) > 0 and s0[2] == "0" and s0[3] == "0.0000"

    # churn a slice via upsert from a derived parquet dir
    import duckdb

    churn = str(tmp_path / "churn")
    os.makedirs(churn)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE c AS SELECT vec_id,"
        " list_transform(embedding, x -> -x) AS embedding"
        f" FROM '{SF_DIR}/embeddings.parquet' WHERE vec_id < 20"
    )
    con.execute(f"COPY c TO '{churn}/embeddings.parquet' (FORMAT PARQUET)")
    con.close()
    run("upsert", "--input", churn)
    s1 = run("stats").stdout.strip().split("\t")
    assert int(s1[2]) == 20 and float(s1[3]) > 0

    r = run("search", "--query-vec-id", "0", "--input", churn, "--nprobe", "4")
    rows = [ln.split("\t") for ln in r.stdout.strip().splitlines()]
    assert rows and rows[0][1] == "0"  # the churned vector finds itself

    run("retrain")
    s2 = run("stats").stdout.strip().split("\t")
    assert s2[2] == "0" and s2[3] == "0.0000"

    run("delete", "--vec-ids", "0,1,2")
    r2 = run("search", "--query-vec-id", "0", "--input", churn, "--nprobe", "4")
    assert all(ln.split("\t")[1] not in ("0", "1", "2")
               for ln in r2.stdout.strip().splitlines())
    run("compact")
    run("gc", "--grace", "0")
    s3 = run("stats").stdout.strip().split("\t")
    assert int(s3[1]) == int(s0[1]) - 3 and s3[4] == "0"


def test_cli_index_snapshot_time_travel(tmp_path):
    """Snapshot flow through the CLI (r9): freeze, mutate, read both
    worlds — `--version` serves the frozen tree while the current one
    moves on; unpin + gc reclaims it."""
    env = {**os.environ, "PYTHONPATH": REPO}
    idx = str(tmp_path / "idx")

    def run(*args, ok=True):
        r = subprocess.run(
            [sys.executable, "-m", "flink_bm25_spark", "index", *args,
             "--path", idx],
            capture_output=True, text=True, cwd=REPO, env=env, timeout=300,
        )
        if ok:
            assert r.returncode == 0, r.stderr[-2000:]
        return r

    run("create", "--input", SF_DIR, "--n-buckets", "8", "--forward")
    q = ("search", "--query", "spark stream join", "-k", "5")
    before = run(*q).stdout
    top = before.strip().splitlines()[0].split("\t")[1]

    v = run("snapshot").stdout.strip()
    run("delete", "--doc-ids", top)

    now = run(*q).stdout
    assert all(ln.split("\t")[1] != top for ln in now.strip().splitlines())
    frozen = run(*q, "--version", v).stdout
    assert frozen == before

    vers = {
        ln.split("\t")[0]: ln.split("\t")
        for ln in run("versions").stdout.strip().splitlines()
    }
    assert vers[v][2] == "1" and vers[v][3] == "1"  # pinned, readable

    run("unpin", "--version", v)
    run("gc", "--grace", "0")
    r = run(*q, "--version", v, ok=False)
    assert r.returncode != 0
