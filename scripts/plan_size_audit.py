"""Audit: Python build time + optimized-plan string size for every
registered query. Big plans mean serial driver time (optimize + codegen)
regardless of data volume — the guide §7.3 failure mode. Load-insensitive
(no jobs run except what query builders trigger eagerly).

Usage: python scripts/plan_size_audit.py [out.tsv]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_etl_consumer_spark.plans import QUERIES  # noqa: E402
from kafka_etl_consumer_spark.session import get_spark  # noqa: E402


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/plan_sizes.tsv"
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="plan-audit", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name in sorted(QUERIES):
        t0 = time.time()
        try:
            df = QUERIES[name](spark, sf)
            t_build = time.time() - t0
            t0 = time.time()
            plan = df._jdf.queryExecution().optimizedPlan().toString()
            t_opt = time.time() - t0
            rows.append((name, round(t_build, 3), round(t_opt, 3), len(plan)))
        except Exception as ex:  # noqa: BLE001
            rows.append((name, round(time.time() - t0, 3), -1.0, -1))
            print(f"{name}: ERROR {str(ex)[:120]}", file=sys.stderr)
        spark.catalog.clearCache()
        try:
            for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
                jrdd.unpersist(False)
        except Exception:
            pass
    with open(out, "w") as f:
        f.write("query\tbuild_s\topt_s\tplan_chars\n")
        for r in rows:
            f.write("\t".join(map(str, r)) + "\n")
    rows.sort(key=lambda r: -r[3])
    for r in rows[:40]:
        print(*r, sep="\t")
    spark.stop()


if __name__ == "__main__":
    main()
