"""Optimization-round profiler: time individual queries with the noop sink
and capture their ``explain('formatted')`` plans.

    python scripts/opt_profile.py [--plans-dir plans/r09] [--tag before] \
        [--iters 3] [--sf-dir /root/testdata/sf0.1] q_a q_b ...

With no query names, profiles the full bench HEADLINE + ADDITIONS sets.
Prints one JSON line {query: best_sec} at the end; writes
``<plans-dir>/<query>_<tag>.txt`` per query when --plans-dir is given.
Same session/master contract as bench.py ($SPARK_GRAFT_CPUS).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    import bench
    from flink_bm25_spark.session import get_spark

    spark = get_spark(app_name="opt_profile")
    qs = entrymod.queries()
    names = args.names or [
        n for n in (*bench.HEADLINE, *bench.ADDITIONS) if n in qs
    ]
    # Warm JVM + parquet footers once, off the clock.
    spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet")).count()

    if args.plans_dir:
        os.makedirs(args.plans_dir, exist_ok=True)

    out: dict[str, float] = {}
    for name in names:
        df = qs[name](spark, args.sf_dir)
        if args.plans_dir:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.plans_dir, f"{name}_{args.tag}.txt"), "w"
            ) as fh:
                fh.write(plan)
        runs = []
        for _ in range(args.iters):
            spark.sparkContext.setJobDescription(f"opt:{name}")
            t0 = time.perf_counter()
            qs[name](spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = min(runs)
        print(f"{name}: best={min(runs)} runs={runs}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
