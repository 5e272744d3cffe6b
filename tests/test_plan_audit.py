"""Keep scripts/plan_audit.py honest: the audit must build a plan and
extract sane metrics for a representative declarative query and a
substrate query, and its regexes must keep matching the plan text the
current Spark version emits (the cheap guard against silent rot when
Spark's explain format changes)."""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def audit_mod():
    path = os.path.join(REPO, "scripts", "plan_audit.py")
    spec = importlib.util.spec_from_file_location("plan_audit", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["plan_audit"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_audit_metrics_on_known_plans(audit_mod, spark, sf_dir):
    from kafka_etl_consumer_spark.plans import QUERIES

    # q1: one scan -> partial/final agg = exactly one exchange, a pushed
    # filter, no joins
    row = audit_mod.audit_one(QUERIES["q1_pricing_summary"](spark, sf_dir))
    assert row["exchanges"] >= 1
    assert row["pushed"] is True
    assert row["bhj"] == row["smj"] == row["bnl"] == 0

    # a join query must show at least one join strategy
    row = audit_mod.audit_one(QUERIES["q3_shipping_priority"](spark, sf_dir))
    assert row["bhj"] + row["smj"] + row["bnl"] >= 1

    # the audit session in main() disables AQE for codegen markers; under
    # the test session (AQE on) codegen may be 0 — only assert type sanity
    assert isinstance(row["codegen"], int)


def test_plan_audit_md_covers_registry():
    """Staleness guard (VERDICT r7 item 8): a new query batch cannot land
    without regenerating PLAN_AUDIT.md — every registered query must have
    a row in the committed inventory."""
    from kafka_etl_consumer_spark.plans import QUERIES

    with open(os.path.join(REPO, "PLAN_AUDIT.md")) as f:
        rows = {
            line.split("|")[1].strip()
            for line in f
            if line.startswith("| ")
        }
    missing = sorted(set(QUERIES) - rows)
    assert not missing, (
        f"PLAN_AUDIT.md lacks rows for {missing} — regenerate with "
        "python scripts/plan_audit.py <sf_dir> --markdown PLAN_AUDIT.md"
    )
