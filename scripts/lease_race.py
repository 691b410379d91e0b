"""Cross-PROCESS writer-lease race: a second-session CLI mutation vs an
in-process zero-grace compaction loop — the exact scenario the r8
verdict's top finding described (a mutation landing in a tree the fold
supersedes, then vanishing at GC).  The in-process race test
(`test_writer_lease_serializes_mutations_with_folds`) exercises the
same lease across threads; this script exercises it across real
processes/JVMs, which is what "second session / CLI" means
operationally.  Run from the repo root:

    python scripts/lease_race.py

PASS = every doc the CLI upserted is visible after the folds; the CLI
exits 0 (or surfaced a retryable IndexWriteConflict, which the lease
makes impossible for lease-taking writers); the lease file is released.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import duckdb

    from flink_bm25_spark.operators.serving import (
        WRITER_LOCK_FILE,
        bm25_index_compact,
        bm25_index_save,
        bm25_index_save_forward,
        doc_vector_from_index,
    )
    from flink_bm25_spark.session import get_spark
    from flink_bm25_spark.sources.tables import load_documents

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark(app_name="lease_race", shuffle_partitions=8)
    tmp = tempfile.mkdtemp(prefix="lease_race_")
    idx = os.path.join(tmp, "idx")
    docs = load_documents(spark, sf_dir)
    bm25_index_save(docs, idx, n_buckets=16)
    bm25_index_save_forward(docs, idx)

    # the second session's batch: 8 fresh docs as a parquet dir
    batch_dir = os.path.join(tmp, "batch")
    os.makedirs(batch_dir)
    ids = list(range(9000, 9008))
    con = duckdb.connect()
    con.execute("CREATE TABLE b (doc_id BIGINT, text VARCHAR)")
    for i in ids:
        con.execute(
            f"INSERT INTO b VALUES ({i}, 'second session racer {i} text')"
        )
    con.execute(
        f"COPY b TO '{batch_dir}/documents.parquet' (FORMAT PARQUET)"
    )
    con.close()

    env = {**os.environ, "PYTHONPATH": REPO}
    proc = subprocess.Popen(
        [sys.executable, "-m", "flink_bm25_spark", "index", "upsert",
         "--path", idx, "--input", batch_dir],
        cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    folds = 0
    t0 = time.time()
    while proc.poll() is None and time.time() - t0 < 600:
        bm25_index_compact(spark, idx, gc_grace_seconds=0)
        folds += 1
        time.sleep(0.1)
    out, err = proc.communicate(timeout=600)
    assert proc.returncode == 0, f"CLI writer failed:\n{err[-3000:]}"

    # one more aggressive fold AFTER the mutation committed, then verify
    # nothing vanished
    bm25_index_compact(spark, idx, gc_grace_seconds=0)
    folds += 1
    missing = [
        i for i in ids
        if not doc_vector_from_index(spark, idx, i).collect()
    ]
    assert not missing, f"docs vanished under the race: {missing}"
    assert not os.path.exists(os.path.join(idx, WRITER_LOCK_FILE)), (
        "lease not released"
    )
    print(
        f"PASS: CLI upsert of {len(ids)} docs survived {folds} concurrent"
        f" zero-grace folds from another process; lease released"
    )
    spark.stop()


if __name__ == "__main__":
    main()
