"""Driver-style correctness sweep — reproduces the external gate locally:
load `__spark_entry__.py` by file path (foreign-cwd safe), build a VANILLA
SparkSession (not the engine's `get_spark`, because the driver builds its
own), run every `queries()` entry at sf0.01 and value-compare against its
`oracle_sql()` twin in DuckDB.

    python scripts/driver_sweep.py [sf_dir] [master] [shuffle_partitions]

Exit code 1 on any mismatch.  Run it with an odd parallelism too
(`local[5]` / 7 partitions) to catch order-dependent results.

Set SWEEP_ONLY=q_a,q_b to restrict to a comma-separated subset.
Set SWEEP_ANSI=1 to run the whole sweep under spark.sql.ansi.enabled=true
(r5 verdict item 3: Spark 4 defaults ANSI on; the engine must hold green
under it).
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    master = sys.argv[2] if len(sys.argv) > 2 else "local[16]"
    parts = sys.argv[3] if len(sys.argv) > 3 else "16"

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master(master)
        .config("spark.sql.shuffle.partitions", parts)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("driver_sweep")
    )
    if os.environ.get("SWEEP_ANSI"):
        builder = builder.config("spark.sql.ansi.enabled", "true")
    spark = builder.getOrCreate()

    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from '{sf_dir}/{t}.parquet'"
        )

    def norm(rows, cols):
        idx = sorted(range(len(cols)), key=lambda i: cols[i])
        out = []
        for r in rows:
            vals = []
            for i in idx:
                v = r[i]
                if isinstance(v, bool):
                    v = int(v)
                elif isinstance(v, float):
                    v = round(v, 6)
                vals.append(v)
            out.append(tuple(vals))
        return sorted(out, key=repr)

    qs, osql = mod.queries(), mod.oracle_sql()
    only = os.environ.get("SWEEP_ONLY")
    if only:
        keep = {n.strip() for n in only.split(",") if n.strip()}
        qs = {n: f for n, f in qs.items() if n in keep}
    fails, t0 = [], time.time()
    for name in sorted(qs):
        if name not in osql:
            print(f"{name}: NO ORACLE (rows-only)")
            continue
        try:
            df = qs[name](spark, sf_dir)
            s_cols = df.columns
            s_rows = [tuple(r) for r in df.collect()]
            rel = con.execute(osql[name])
            d_cols = [d[0] for d in rel.description]
            d_rows = rel.fetchall()
            ok = sorted(s_cols) == sorted(d_cols) and norm(
                s_rows, s_cols
            ) == norm(d_rows, d_cols)
            if not ok:
                fails.append(name)
                print(
                    f"{name}: MISMATCH cols_ok="
                    f"{sorted(s_cols) == sorted(d_cols)} "
                    f"rows {len(s_rows)}/{len(d_rows)}"
                )
        except Exception as e:  # noqa: BLE001 — report and continue
            fails.append(name)
            print(f"{name}: ERROR {type(e).__name__}: {str(e)[:150]}")
    print(
        f"DONE in {time.time() - t0:.0f}s; FAILS={fails if fails else 'NONE'}"
    )
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
