"""Driver contract for the spark-graft builder (PySpark target).

``entry``      — flagship query on /root/testdata/sf0.001 (smoke check).
``queries``    — every implemented operator from SURVEY.md §2 as
                 (spark, sf_dir) -> DataFrame callables.
``oracle_sql`` — the DuckDB-equivalent SQL for each query (hash-compared
                 by the driver at sf0.01).

Implementation lives in ``kafka_etl_consumer_spark.plans.queries``; this
module only adapts it to the driver's interface.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)

from kafka_etl_consumer_spark.plans import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["flagship_event_rollup"](spark, "/root/testdata/sf0.001")


def _check_counts() -> dict[str, float]:
    """Priority weight per query from prior-round CORRECTNESS files (round 1
    checked only the first 50 registry entries, so ordering matters).
    A query whose LATEST check was red scores -1 — ahead of never-checked
    (0): a red row means the driver's contract row is wrong TODAY (even if
    the fix is already in-source), which is higher-signal to re-verify than
    a query with no row at all.  Green checks add 1 per round, so fully
    verified queries rotate to the back."""
    counts: dict[str, float] = {}
    latest_red: dict[str, bool] = {}
    # numeric round order: lexicographic sort would mis-order r100 or an
    # unpadded r7 after r10 and mark the wrong round "latest" (ADVICE r5)
    paths = sorted(
        glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    )
    for path in paths:
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            green = isinstance(row, dict) and (
                row.get("hash_match") is True or row.get("err") == "no_oracle"
            )
            counts[name] = counts.get(name, 0) + (1.0 if green else 0.5)
            latest_red[name] = not green
    for name, red in latest_red.items():
        if red:
            counts[name] = -1.0
    return counts


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry queries, least-recently-verified first: queries with the
    fewest prior CORRECTNESS rows lead, so a prefix-capped or time-budgeted
    driver always checks the least-covered entries first and coverage
    rotates to 100% across rounds."""
    counts = _check_counts()
    names = sorted(QUERIES, key=lambda n: counts.get(n, 0))  # stable sort
    return {n: QUERIES[n] for n in names}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
