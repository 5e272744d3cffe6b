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

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_etl_consumer_spark.plans import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["flagship_event_rollup"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
