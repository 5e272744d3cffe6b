"""Static plan audit: build every registered query's DataFrame against a
scale-factor directory and summarize the PHYSICAL plan without executing
any job — the per-query shuffle/join/codegen/pushdown inventory behind
SCALE.md's claims.

Per query it reports:

- exchanges      — shuffle boundaries planned (ReusedExchange excluded:
                   a reused exchange is a read, not a new shuffle)
- reused         — ReusedExchange nodes ALREADY VISIBLE statically.
                   Under AQE most exchange reuse materializes at
                   RUNTIME (identical subplans collapse when stages
                   execute), so this column UNDERCOUNTS sharing — the
                   substrate's ReusedExchange assertions in
                   test_shard.py check the executed plan instead.
- bhj / smj / bnl — broadcast-hash vs sort-merge vs broadcast-nested-loop
                   join counts (bnl is fine on bounded grids only)
- codegen        — WholeStageCodegen span count
- pushed         — whether any scan carries a non-empty PushedFilters

(Single-partition windows are NOT re-derived here — the window guard
test tests/test_plans_window_guard.py already classifies every plan's
windows against the data-derived row-grain set; this audit covers the
shuffle/join/codegen axes the guard does not.)

Usage: python scripts/plan_audit.py [sf_dir] [query ...] [--markdown out]

Plan building is driver-side only for declarative queries (Catalyst + a
broadcast-threshold estimate). Two caveats for the iterative family:
queries whose builder runs an EAGER convergence loop (graph_components'
stop-when-no-change rounds) execute real jobs while their DataFrame is
constructed, and lineage-truncated loops (localCheckpoint) report only
the FINAL round's plan — their per-round shuffles are inventoried in
SCALE.md's iterative-algorithms section, not here.
"""

from __future__ import annotations

import os
import re
import sys

from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_etl_consumer_spark.plans import QUERIES  # noqa: E402


def audit_one(df) -> dict[str, object]:
    qe = df._jdf.queryExecution()
    plan = qe.explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "extended"
        )
    )
    # the physical plan is the last section of extended mode
    phys = plan.split("== Physical Plan ==")[-1]
    n_reused = len(re.findall(r"ReusedExchange", phys))
    n_exch = len(re.findall(r"\bExchange\b", phys))
    return {
        "exchanges": n_exch,
        "reused": n_reused,
        "bhj": len(re.findall(r"BroadcastHashJoin", phys)),
        "smj": len(re.findall(r"SortMergeJoin", phys)),
        "bnl": len(re.findall(r"BroadcastNestedLoopJoin", phys)),
        # extended mode marks whole-stage-codegen membership with "*(n)"
        # node prefixes; distinct ids = codegen span count
        "codegen": len(set(re.findall(r"\*\((\d+)\)", phys))),
        "pushed": bool(re.search(r"PushedFilters: \[[^\]]", phys)),
    }


def main() -> None:
    args = [a for a in sys.argv[1:]]
    md_out = None
    if "--markdown" in args:
        i = args.index("--markdown")
        md_out = args[i + 1]
        del args[i : i + 2]
    # Positional contract: first arg IS the sf_dir (error if it isn't a
    # directory — a typo must not be silently reinterpreted as a query
    # name), the rest are query names validated against the registry (a
    # query name that happens to match a local directory must not be
    # silently swallowed as a second sf_dir).
    sf_dir = "/root/testdata/sf0.01"
    names = sorted(QUERIES)
    if args:
        if not os.path.isdir(args[0]):
            sys.exit(f"plan_audit: sf_dir {args[0]!r} is not a directory")
        sf_dir = args[0]
        if args[1:]:
            unknown = [a for a in args[1:] if a not in QUERIES]
            if unknown:
                sys.exit(f"plan_audit: unknown queries: {', '.join(unknown)}")
            names = args[1:]

    # AQE off ON PURPOSE: with AQE the pre-execution plan is an
    # AdaptiveSparkPlan placeholder — no codegen "*(n)" markers, and
    # runtime-only decisions (exchange reuse, skew splits) are invisible
    # anyway. The static non-adaptive plan is the comparable inventory;
    # production sessions keep AQE on (session.py).
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("plan-audit")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            row = audit_one(df)
        except Exception as exc:  # noqa: BLE001 — audit must not abort on one query
            row = {"error": f"{type(exc).__name__}: {exc}"[:120]}
        row["query"] = name
        rows.append(row)
        if "error" in row:
            print(f"{name}: ERROR {row['error']}")
        else:
            print(
                f"{name}: exch={row['exchanges']} reused={row['reused']} "
                f"bhj={row['bhj']} smj={row['smj']} bnl={row['bnl']} "
                f"codegen={row['codegen']} pushed={int(row['pushed'])}"
            )

    ok = [r for r in rows if "error" not in r]
    print(
        f"\n{len(ok)}/{len(rows)} plans built; total exchanges "
        f"{sum(r['exchanges'] for r in ok)}, reused {sum(r['reused'] for r in ok)}, "
        f"bhj {sum(r['bhj'] for r in ok)}, smj {sum(r['smj'] for r in ok)}, "
        f"bnl {sum(r['bnl'] for r in ok)}"
    )
    top = sorted(ok, key=lambda r: -r["exchanges"])[:15]
    print("\nmost shuffle-heavy plans:")
    for r in top:
        print(f"  {r['query']}: {r['exchanges']} exchanges ({r['reused']} reused)")

    if md_out:
        with open(md_out, "w") as f:
            f.write(
                "# PLAN_AUDIT — static physical-plan inventory\n\n"
                "Generated by `python scripts/plan_audit.py <sf_dir> "
                "--markdown PLAN_AUDIT.md` (AQE off; see the script "
                "docstring for column semantics and the iterative-query "
                "caveats). Shuffle-boundary counts are the static plan; "
                "runtime exchange reuse under AQE only lowers them.\n\n"
                "| query | exchanges | reused | bhj | smj | bnl | codegen | pushed |\n"
                "|---|---|---|---|---|---|---|---|\n"
            )
            for r in sorted(rows, key=lambda r: r["query"]):
                if "error" in r:
                    f.write(f"| {r['query']} | ERROR: {r['error']} |\n")
                else:
                    f.write(
                        f"| {r['query']} | {r['exchanges']} | {r['reused']} | "
                        f"{r['bhj']} | {r['smj']} | {r['bnl']} | {r['codegen']} | "
                        f"{'y' if r['pushed'] else ''} |\n"
                    )
        print(f"\nwrote {md_out}")

    spark.stop()


if __name__ == "__main__":
    main()
