"""Per-query profiler for optimization work: times plan construction,
analysis, and two noop-sink executions separately, and writes
explain("formatted") to a file.

Usage: python scripts/profile_query.py <query> [query ...] [--sf SFDIR]
       [--plans-dir plans/r10] [--suffix before]

Prints one line per query:
  <name> build=<s> first=<s> second=<s> (plan -> <file>)
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_etl_consumer_spark.plans import QUERIES  # noqa: E402
from kafka_etl_consumer_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark(app_name="profile")
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as bench.py so first-run numbers are comparable
    QUERIES["flagship_event_rollup"](spark, args.sf).write.format("noop").mode("overwrite").save()
    QUERIES["multimodal_meta"](spark, args.sf).write.format("noop").mode("overwrite").save()

    for name in args.queries:
        spark.catalog.clearCache()
        try:
            for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
                jrdd.unpersist(False)
        except Exception:
            pass
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.time()
        df = QUERIES[name](spark, args.sf)
        t_build = time.time() - t0
        runs = []
        for _ in range(args.runs):
            t1 = time.time()
            df2 = QUERIES[name](spark, args.sf) if runs else df
            df2.write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t1)
        plan_note = ""
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            plan_note = f" (plan -> {path})"
        rs = " ".join(f"run{i}={r:.3f}" for i, r in enumerate(runs))
        print(f"{name} build={t_build:.3f} {rs}{plan_note}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
