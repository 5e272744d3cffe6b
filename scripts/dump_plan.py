"""Dump explain("formatted") for queries WITHOUT executing them — the
plan-evidence capture for optimization rounds (plans/rNN/<q>_<suffix>.txt).

Usage: python scripts/dump_plan.py --plans-dir plans/r11 --suffix before q1 q2 ...
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_etl_consumer_spark.plans import QUERIES  # noqa: E402
from kafka_etl_consumer_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--plans-dir", required=True)
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    os.makedirs(args.plans_dir, exist_ok=True)
    spark = get_spark(app_name="dump_plan")
    spark.sparkContext.setLogLevel("ERROR")
    for name in args.queries:
        df = QUERIES[name](spark, args.sf)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"{name} -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
